package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface (SURVEY §7.4 extension — the reference is
  * purely batch, rerun-to-refresh; this is the streaming restatement of its
  * calendar aggregation).
  *
  * The transformations are plan-identical for batch and streaming inputs:
  * pass a `readStream` DataFrame and write with `writeStream` (the
  * watermark bounds state for late events); pass a batch DataFrame and the
  * same code runs as a one-shot query — which is how the tests pin
  * streaming results to the batch oracle.
  */
object StreamingCalendar {

  /** Watermarked tumbling 7-day rollup per event type — the calendar
    * aggregation (A2) with event-time windows. State per (window, type)
    * only; the watermark lets Spark drop windows older than 1 day past
    * the max seen event time, so state is bounded at any corpus size. */
  def weeklyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "7 days").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  final case class UserRunning(user_id: Long, n_events: Long, last_value: Double)

  /** State carries the max event id seen so "last" is defined by the data
    * (arg_max by event_id), not by iterator arrival order. */
  final case class UserState(n_events: Long, max_event_id: Long, last_value: Double)

  /** Stateful per-user running aggregate via mapGroupsWithState — the
    * KeyValueGroupedDataset custom-state surface. "Last" means the value at
    * the greatest `event_id` (deterministic in batch AND streaming: batch
    * `groupByKey` yields rows in partition order, so a positional "last
    * row wins" would be nondeterministic run to run; the arg_max fold is
    * order-insensitive and lets the batch run be oracle-checked with
    * DuckDB `arg_max`). */
  def userRunningCounts(events: DataFrame): Dataset[UserRunning] = {
    val byUser = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("value").cast("double"))
      .as(Encoders.product[(Long, Long, Double)])
      .groupByKey(_._1)(Encoders.scalaLong)
    byUser.mapGroupsWithState[UserState, UserRunning](GroupStateTimeout.NoTimeout)(
      (user: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[UserState]) => {
        val prev = state.getOption.getOrElse(UserState(0L, Long.MinValue, 0.0))
        var n = prev.n_events
        var maxId = prev.max_event_id
        var last = prev.last_value
        rows.foreach { case (_, eid, v) =>
          n += 1
          if (eid > maxId) { maxId = eid; last = v }
        }
        val next = UserState(n, maxId, last)
        state.update(next)
        UserRunning(user, n, last)
      })(Encoders.product[UserState], Encoders.product[UserRunning])
  }
}
