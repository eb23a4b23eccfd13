package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) code of two dimension keys: the low 16 bits of each
  * input interleaved into one 32-bit value (x in even bit positions, y in
  * odd).
  *
  * Why this exists at 100 TB: sorting/range-partitioning a table by a
  * SINGLE column gives min/max file statistics that prune scans on that
  * column only — a filter on the second dimension reads every file.
  * Sorting by the Morton code clusters BOTH dimensions at once (each
  * contiguous z-range is a small rectangle-ish region of the key space),
  * so per-file min/max ranges stay narrow on both columns and either
  * filter skips most files. This is the layout trick behind Delta/Iceberg
  * Z-ORDER clustering, rebuilt as a native codegen Expression — the
  * interleave is a static call inside whole-stage codegen, and the bit
  * math is plain SQL, so the layout keys are DuckDB-checkable.
  *
  * Callers should RANGE-NORMALIZE dimensions of unequal magnitude to a
  * common bit width first (e.g. `floor(x * 256 / (max_x + 1))`), exactly
  * as production Z-ORDER implementations do — otherwise the interleave's
  * split prefix is dominated by the wider key's high bits and the narrow
  * key never clusters (ZOrderLayoutSpec demonstrates both regimes).
  */
case class ZOrderCode(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_code needs two long children, got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrderCode.interleave16(l.asInstanceOf[Long], r.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderCode.interleave16($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderCode =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "zorder_code"
}

object ZOrderCode {
  /** Interleave the low 16 bits: bit j of x → bit 2j, bit j of y → bit
    * 2j+1. Entry point referenced by generated code. */
  def interleave16(x: Long, y: Long): Long = {
    var v = 0L
    var j = 0
    while (j < 16) {
      v |= ((x >> j) & 1L) << (2 * j)
      v |= ((y >> j) & 1L) << (2 * j + 1)
      j += 1
    }
    v
  }

  /** Inverse (test aid): recover (x & 0xFFFF, y & 0xFFFF). */
  def deinterleave16(z: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var j = 0
    while (j < 16) {
      x |= ((z >> (2 * j)) & 1L) << j
      y |= ((z >> (2 * j + 1)) & 1L) << j
      j += 1
    }
    (x, y)
  }

  /** Column wrapper; children are cast to long. */
  def z(a: Column, b: Column): Column =
    columnOf(ZOrderCode(expressionOf(a.cast("long")), expressionOf(b.cast("long"))))
}
