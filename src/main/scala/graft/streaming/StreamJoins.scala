package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins: both sides unbounded, state bounded by
  * watermark + time-interval join condition.
  */
object StreamJoins {

  /** Per-user follow-events join: pairs (a, b) of the same user where b
    * lands within `followSeconds` AFTER a (exclusive of the same event).
    * In streaming, both sides carry a 1 hour watermark and the interval
    * condition on the two event-time columns lets Spark expire buffered
    * rows once the watermark passes `ts + followSeconds` — state is
    * bounded by the interval width × arrival rate, not by history. The
    * identical plan runs on batch inputs (watermark is a no-op), which
    * is how the `stream_interval_join` oracle hash-checks it. */
  def followWithin(left: DataFrame, right: DataFrame,
      followSeconds: Long): DataFrame = {
    val l = left.withWatermark("ts", "1 hour").alias("l")
    val r = right.withWatermark("ts", "1 hour").alias("r")
    l.join(r,
        col("l.user_id") === col("r.user_id") &&
          col("r.ts") >= col("l.ts") &&
          col("r.ts") <= col("l.ts") + expr(s"INTERVAL $followSeconds SECONDS") &&
          col("l.event_id") =!= col("r.event_id"))
      .select(col("l.user_id").as("user_id"),
        col("l.event_id").as("event_a"), col("r.event_id").as("event_b"),
        (unix_micros(col("r.ts")) - unix_micros(col("l.ts"))).as("delta_us"))
  }

  /** LEFT OUTER variant of [[followWithin]]: every `a` event emits — with
    * its follower when one lands inside the window, with NULLs when none
    * does. The subtle streaming semantics this exercises: an unmatched
    * left row CANNOT emit when it arrives (a matching right row may still
    * come); it emits with NULLs only once the watermark passes
    * `a.ts + followSeconds`, i.e. outer results are LATE by construction.
    * State stays bounded exactly as in the inner join. The funnel
    * "did-not-convert within the window" query is this join — an inner
    * join plus an anti-join re-scan would read the stream twice. */
  def followWithinOuter(left: DataFrame, right: DataFrame,
      followSeconds: Long): DataFrame = {
    val l = left.withWatermark("ts", "1 hour").alias("l")
    val r = right.withWatermark("ts", "1 hour").alias("r")
    l.join(r,
        col("l.user_id") === col("r.user_id") &&
          col("r.ts") >= col("l.ts") &&
          col("r.ts") <= col("l.ts") + expr(s"INTERVAL $followSeconds SECONDS") &&
          col("l.event_id") =!= col("r.event_id"),
        "left_outer")
      .select(col("l.user_id").as("user_id"),
        col("l.event_id").as("event_a"), col("r.event_id").as("event_b"),
        (unix_micros(col("r.ts")) - unix_micros(col("l.ts"))).as("delta_us"))
  }

  /** Exactly-once ingestion dedup: drop re-deliveries of the same
    * event_id across micro-batches. State holds one entry per event_id
    * seen within the watermark horizon — `dropDuplicatesWithinWatermark`
    * expires entries once the watermark passes their event time, so
    * at-least-once sources (Kafka replays, retried writes) collapse to
    * exactly-once without unbounded key state. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
}
