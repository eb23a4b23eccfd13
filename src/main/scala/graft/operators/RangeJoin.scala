package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-range join: pair every left row with the right rows of the same
  * key whose event time lies within ±`radiusMicros`. Spark plans a raw
  * `|Δt| <= r` predicate as a nested-loop join — quadratic per key. This
  * is the scale shape instead: time is bucketed at the radius width, the
  * RIGHT side expands to its bucket and both neighbors (3 rows), and the
  * join becomes a plain equi-join on (key, bucket) followed by the exact
  * predicate. Every true pair meets exactly once (the left row sits in
  * one bucket; the right expansion covers it once), so no dedup pass is
  * needed, and the candidate set per task is bounded by bucket occupancy
  * rather than key cardinality.
  */
object RangeJoin {

  /** Both inputs must already carry distinct column names; `leftTime` /
    * `rightTime` are timestamp columns, keys any equi-joinable type.
    * The bucket column uses [[graft.plans.RangeJoinRewrite]]'s marker
    * name, so in a session with GraftExtensions active the rule
    * recognizes this join as already bucketed and leaves it alone. */
  def timeRangeJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      radiusMicros: Long): DataFrame = {
    val l = left
      .withColumn("_k", leftKey)
      .withColumn("_lt", unix_micros(leftTime))
      .withColumn("_graft_bucket", expr(s"_lt div ${radiusMicros}L"))
    val r = right
      .withColumn("_k", rightKey)
      .withColumn("_rt", unix_micros(rightTime))
      .withColumn("_rb", expr(s"_rt div ${radiusMicros}L"))
      .withColumn("_graft_bucket",
        explode(array(col("_rb") - 1, col("_rb"), col("_rb") + 1)))
      .drop("_rb")
    l.join(r, Seq("_k", "_graft_bucket"))
      .filter(abs(col("_lt") - col("_rt")) <= radiusMicros)
      .withColumn("delta_us", col("_lt") - col("_rt"))
      .drop("_k", "_graft_bucket", "_lt", "_rt")
  }
}
