package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Strict left-fold dot product of two `array<double>` columns:
  * `s_0 = 0.0; s_i = s_{i-1} + a(i)*b(i)` — the exact accumulation order
  * the DuckDB oracles rebuild with `list_reduce`, so similarities stay
  * bit-equal across engines. Null semantics mirror the
  * `aggregate(zip_with(...))` HOF formulation it replaces: a length
  * mismatch (zip_with pads with null) or any null element poisons the
  * fold → result null.
  *
  * Native codegen Expression because the HOF version interprets one
  * lambda call per element per pair — the scoring hot loop of every
  * similarity query (PolyHash / LshBandKey / Simhash32 are the template).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs two array<double> children, got $l, $r")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if (graft.functions.VecDot.poisoned($a, $b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VecDot.dot($a, $b);
         |}
       """.stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

object VecDot {
  /** True iff the HOF fold would yield null: length mismatch or any null
    * element. Entry point referenced by generated code. */
  def poisoned(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (n != b.numElements()) return true
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Entry point referenced by generated code; callers check poisoned(). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  def dotOrNull(a: ArrayData, b: ArrayData): Any =
    if (poisoned(a, b)) null else java.lang.Double.valueOf(dot(a, b))

  /** Column wrapper. */
  def apply(a: Column, b: Column): Column =
    columnOf(VecDot(expressionOf(a), expressionOf(b)))
}
