package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** All overlapping w-word window fold-hashes of a token array
  * (`array<string>` → `array<long>`, in window order): each word is
  * poly-hashed once, then every window folds its w word-hashes as
  * `h = (h·31 + wh) mod M` — the exact arithmetic the shingle
  * (`w=3`) and span/decontamination (`w=8`, `w=13`) fingerprints use,
  * so the DuckDB oracles are unchanged.
  *
  * Native codegen Expression because the HOF formulation
  * (transform + sequence + slice + aggregate) allocates a slice and
  * interprets w lambda calls PER WINDOW — here it is one static-call
  * double loop with two flat arrays, fused into whole-stage codegen
  * (PolyHash / Simhash32 are the template). Docs shorter than w yield
  * an empty array.
  */
case class WindowFoldHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window width must be >= 1, got $w")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"window_fold_hashes needs array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WindowFoldHashes.fold(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowFoldHashes.fold($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): WindowFoldHashes =
    copy(child = newChild)
  override def prettyName: String = "window_fold_hashes"
}

object WindowFoldHashes {
  /** Entry point referenced by generated code. A null token hashes as 0
    * (the token arrays the engine feeds — `TextOps.words` output — never
    * contain nulls). */
  def fold(a: ArrayData, w: Int): ArrayData = {
    val n = a.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val whs = new Array[Long](n)
    var i = 0
    while (i < n) {
      whs(i) = if (a.isNullAt(i)) 0L else PolyHash.hashUtf8(a.getUTF8String(i))
      i += 1
    }
    val out = new Array[Long](n - w + 1)
    i = 0
    while (i <= n - w) {
      var h = 0L
      var j = 0
      while (j < w) { h = (h * 31 + whs(i + j)) % PolyHash.Mod; j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def of(ws: Column, w: Int): Column = columnOf(WindowFoldHashes(expressionOf(ws), w))
}
