package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 56-bit perceptual difference-hash (dHash) of an opaque binary payload
  * (`binary` → `bigint`) — the pixel-level fingerprint that survives
  * re-encoding and resizing, which the content checksum (`media_dedup`)
  * by construction cannot: any byte-level change flips the checksum,
  * while the dHash only moves by a few bits when the underlying signal
  * barely moves.
  *
  * The payload is average-pooled into an 8×8 grid of integer cell
  * means over equal byte segments (a real image decoder would pool
  * luma pixels; the pooling, thresholding, banding and Hamming algebra
  * downstream are identical either way — swapping in a decoder changes
  * only the byte source, the [[graft.operators.Multimodal.decodeStub]]
  * contract). Bit r·7+c of the fingerprint is `cell(r,c) > cell(r,c+1)`
  * — 8 rows × 7 adjacent-column comparisons = 56 bits, deliberately
  * UNDER 63 so the value is a non-negative BIGINT in both engines (a
  * 64-bit pack would need the sign bit: Long-wrap here, overflow raise
  * in DuckDB). All arithmetic is integer (sum DIV count, compare,
  * shift), so the DuckDB oracle reproduces the fingerprint bit-for-bit.
  *
  * Native codegen Expression (PolyHash/WindowFoldHashes template): one
  * static call over the raw byte array, fused into whole-stage codegen —
  * no per-row array-of-chars materialization as a HOF formulation would
  * allocate. Empty/short payloads degrade gracefully: empty segments
  * pool to 0, an empty payload fingerprints as 0.
  */
case class PerceptualHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"perceptual_hash needs binary, got $t")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    PerceptualHash.dhash(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PerceptualHash.dhash($c)")
  override protected def withNewChildInternal(newChild: Expression): PerceptualHash =
    copy(child = newChild)
  override def prettyName: String = "perceptual_hash"
}

object PerceptualHash {
  val Rows = 8
  val Cols = 8
  val Bits: Int = Rows * (Cols - 1) // 56

  /** Entry point referenced by generated code. Cell k of 64 covers byte
    * segment [k·n DIV 64, (k+1)·n DIV 64); its value is the segment's
    * unsigned-byte mean (integer DIV), 0 when the segment is empty. */
  def dhash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val cells = new Array[Long](Rows * Cols)
    var k = 0
    while (k < Rows * Cols) {
      val start = k * n / (Rows * Cols)
      val end = (k + 1) * n / (Rows * Cols)
      if (end > start) {
        var s = 0L
        var i = start
        while (i < end) { s += (bytes(i) & 0xff); i += 1 }
        cells(k) = s / (end - start)
      }
      k += 1
    }
    var fp = 0L
    var r = 0
    while (r < Rows) {
      var c = 0
      while (c < Cols - 1) {
        if (cells(r * Cols + c) > cells(r * Cols + c + 1))
          fp |= 1L << (r * (Cols - 1) + c)
        c += 1
      }
      r += 1
    }
    fp
  }

  /** Column wrapper. */
  def of(payload: Column): Column = columnOf(PerceptualHash(expressionOf(payload)))
}
