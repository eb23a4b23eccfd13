package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string's code points:
  * `h_0 = 0; h_i = (h_{i-1} * 31 + codepoint_i) mod 1e9+7`.
  *
  * This is the engine's cross-engine-reproducible document/shingle
  * fingerprint (SURVEY north-star: fingerprinting, MinHash, SimHash): unlike
  * murmur/xxhash it is expressible in plain SQL on any engine (the DuckDB
  * oracles rebuild it with list_reduce over ascii codes), so dedup results
  * are verifiable outside Spark.
  *
  * Implemented as a native Catalyst Expression with `doGenCode` — the
  * generated code is a static call inside whole-stage codegen, so scans
  * stay in one fused loop (no UDF serialization, no codegen barrier).
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"poly_hash needs a string child, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    PolyHash.hashUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hashUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
  override def prettyName: String = "poly_hash"
}

object PolyHash {
  /** 1e9+7: keeps every intermediate (`h*31 + cp`, and seeded `a*h + b`
    * MinHash permutations with a,b < 1e9) inside signed 64-bit range. */
  val Mod: Long = 1000000007L

  def hashString(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Entry point referenced by generated code. */
  def hashUtf8(u: UTF8String): Long = hashString(u.toString)

  /** Column wrapper. */
  def hash(c: Column): Column =
    columnOf(PolyHash(expressionOf(c)))
}
