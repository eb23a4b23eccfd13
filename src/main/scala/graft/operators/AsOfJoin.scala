package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the payload of the LATEST right
  * row with the same key and right-time <= left-time (left outer: no
  * prior right row → null payload). Spark has no native ASOF JOIN; the
  * naive formulations are a per-row range subquery or a key-equality join
  * + windowed filter, both of which materialize |L|×|R-per-key| rows.
  *
  * This implementation is the scale shape: UNION the two relations with a
  * side marker, sort each key's rows by (time, side, right-tiebreak) —
  * right rows first at equal times, so "<=" holds — and propagate the
  * right payload with a running last-non-null window. One hash exchange
  * on the key, one sort, zero row blow-up; ties among right rows resolve
  * by the tiebreak column (latest wins), so results are deterministic and
  * SQL-reproducible (the oracle rebuilds the identical window).
  */
object AsOfJoin {

  /** @param left       left relation (all its columns are kept)
    * @param right      right relation
    * @param leftKey    join key column in `left`
    * @param rightKey   join key column in `right`
    * @param leftTime   event-time column in `left`
    * @param rightTime  event-time column in `right`
    * @param rightTie   unique orderable column in `right` breaking
    *                   equal-time ties (latest wins)
    * @param rightPayload right columns to attach, emitted as `asof_<name>`
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, leftTime: Column, rightTime: Column,
      rightTie: String, rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val tieType = right.schema(rightTie).dataType
    val lNorm = left.select(
      (Seq(leftKey.as("_k"), leftTime.as("_t"), lit(1).as("_side"),
        lit(null).cast(tieType).as("_tie")) ++
        rightPayload.map(p => lit(null).cast(right.schema(p).dataType).as(s"_p_$p")) ++
        leftCols.map(col)): _*)
    val rNorm = right.select(
      (Seq(rightKey.as("_k"), rightTime.as("_t"), lit(0).as("_side"),
        col(rightTie).as("_tie")) ++
        rightPayload.map(p => col(p).as(s"_p_$p")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // Separate last() calls per payload column stay mutually consistent
    // because the sort is total over right rows ((_t, _side=0, _tie)
    // unique), so every window picks the same "latest" right row.
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .select((Seq(col("_side")) ++ leftCols.map(col) ++
        rightPayload.map(p => last(col(s"_p_$p"), ignoreNulls = true).over(w).as(s"asof_$p"))): _*)
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ rightPayload.map(p => col(s"asof_$p")): _*)
  }

  /** Forward as-of join: for each left row, attach the payload of the
    * EARLIEST right row with the same key and right-time >= left-time —
    * the "next scheduled event" direction (pandas merge_asof
    * direction='forward'). Exact mirror of [[asOf]]: same union + one
    * key exchange + one sort, with the window flipped to
    * a running frame over the REVERSED sort (t desc, right rows first at
    * equal times so ">=" holds) with a running last-non-null; equal-time
    * right ties resolve to the MIN tiebreak (earliest wins — the mirror
    * of backward's latest-wins). The reversal matters for performance,
    * not just symmetry: a [current row, unbounded following] frame is a
    * shrinking frame that Spark's WindowExec re-aggregates per row —
    * O(rows²) per partition (measured 32 s vs 0.7 s at sf0.1) — while
    * the reversed [unbounded preceding, current row] frame is a linear
    * running scan like the backward join's. */
  def asOfForward(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, leftTime: Column, rightTime: Column,
      rightTie: String, rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val tieType = right.schema(rightTie).dataType
    val lNorm = left.select(
      (Seq(leftKey.as("_k"), leftTime.as("_t"), lit(0).as("_side"),
        lit(null).cast(tieType).as("_tie")) ++
        rightPayload.map(p => lit(null).cast(right.schema(p).dataType).as(s"_p_$p")) ++
        leftCols.map(col)): _*)
    val rNorm = right.select(
      (Seq(rightKey.as("_k"), rightTime.as("_t"), lit(1).as("_side"),
        col(rightTie).as("_tie")) ++
        rightPayload.map(p => col(p).as(s"_p_$p")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // Reversed running frame: in (t desc, side desc, tie desc) order the
    // right rows at-or-after a left row's time are exactly the preceding
    // rows, and the LAST non-null payload among them is the earliest
    // right row >= t (min tie at equal times). Linear, like [[asOf]].
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").desc, col("_side").desc, col("_tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .select((Seq(col("_side")) ++ leftCols.map(col) ++
        rightPayload.map(p => last(col(s"_p_$p"), ignoreNulls = true).over(w).as(s"asof_$p"))): _*)
      .filter(col("_side") === 0)
      .select(leftCols.map(col) ++ rightPayload.map(p => col(s"asof_$p")): _*)
  }

  /** Tolerance-bounded as-of join — the feature-store freshness rule
    * ("attach the latest feature value, but only if it is at most N
    * seconds stale"). Same single-exchange union+window plan as [[asOf]]
    * with the matched right row's event time carried alongside the
    * payload; rows whose match is older than `toleranceSec` get NULL
    * payloads (they matched, but stale), plus an `asof_age_us` column
    * (microseconds; null when no fresh match). `leftTimeCol` /
    * `rightTimeCol` are column NAMES (the left one must survive into the
    * output to evaluate freshness). */
  def asOfWithin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, leftTimeCol: String, rightTimeCol: String,
      rightTie: String, rightPayload: Seq[String], toleranceSec: Long): DataFrame = {
    val joined = asOf(left, right, leftKey, rightKey,
      col(leftTimeCol), col(rightTimeCol), rightTie, rightPayload :+ rightTimeCol)
    val age = unix_micros(col(leftTimeCol)) - unix_micros(col(s"asof_$rightTimeCol"))
    val fresh = age <= toleranceSec * 1000000L
    rightPayload.foldLeft(joined) { (df, p) =>
      df.withColumn(s"asof_$p", when(fresh, col(s"asof_$p")))
    }
      .withColumn("asof_age_us", when(fresh, age))
      .drop(s"asof_$rightTimeCol")
  }
}
