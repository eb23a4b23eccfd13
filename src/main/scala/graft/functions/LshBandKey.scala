package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH band key of an `array<double>` vector: bit jj of
  * the key is the sign of the dot product with fixed ±1 hyperplane
  * j = band*bits + jj, whose component i (1-based) is
  * +1 iff ((i*31 + j*37) % 97) % 2 == 0 (97 prime → all planes distinct).
  *
  * Bit-identical to the higher-order-function formulation (a strict
  * left-fold `s += v(i) * sign` per plane, `2^jj` per positive sign), so
  * the DuckDB oracles — which rebuild the same fold in SQL — keep
  * hash-matching. Implemented as a native Catalyst Expression with
  * `doGenCode` because the HOF version interprets bits×dim lambda calls
  * per vector: here the whole key is one static-call loop inside
  * whole-stage codegen, the hot-path cost of the ANN index build
  * (SURVEY north-star; PolyHash is the template).
  */
case class LshBandKey(child: Expression, band: Int, bits: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_key needs array<double>, got $t")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    LshBandKey.keyOf(input.asInstanceOf[ArrayData], band, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LshBandKey.keyOf($c, $band, $bits)")
  override protected def withNewChildInternal(newChild: Expression): LshBandKey =
    copy(child = newChild)
  override def prettyName: String = "lsh_band_key"
}

object LshBandKey {
  /** Entry point referenced by generated code. A null element poisons
    * every plane dot (null semantics of the HOF fold), so all bits read 0. */
  def keyOf(a: ArrayData, band: Int, bits: Int): Long = {
    val n = a.numElements()
    var p = 0
    while (p < n) {
      if (a.isNullAt(p)) return 0L
      p += 1
    }
    var key = 0L
    var jj = 0
    while (jj < bits) {
      val j = band * bits + jj
      var s = 0.0
      var i = 1
      while (i <= n) {
        val sign = if (((i * 31 + j * 37) % 97) % 2 == 0) 1.0 else -1.0
        s += a.getDouble(i - 1) * sign
        i += 1
      }
      if (s > 0) key += (1L << jj)
      jj += 1
    }
    key
  }

  /** Column wrapper. */
  def key(v: Column, band: Int, bits: Int): Column =
    columnOf(LshBandKey(expressionOf(v), band, bits))
}
