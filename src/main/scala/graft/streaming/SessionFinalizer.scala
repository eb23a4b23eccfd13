package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Inactivity-closed sessions via `transformWithState` EVENT-TIME TIMERS —
  * the remaining piece of the named-state API after ValueState/MapState
  * (TypeStats) and ListState (RecentEvents): `registerTimer` +
  * `handleExpiredTimer` under `TimeMode.EventTime`.
  *
  * Semantics: per user one open session (min/max event time + count) in a
  * ValueState; every batch re-arms ONE inactivity timer at
  * `last event + gap` (old timers deleted — exactly one pending deadline
  * per key); when the WATERMARK passes the deadline the timer fires,
  * `handleExpiredTimer` emits the closed session and clears the state.
  * Nothing is emitted from `handleInputRows` — output is append-only
  * finalized sessions, the shape downstream jobs can consume exactly once.
  *
  * This is what `flatMapGroupsWithState` + GroupStateTimeout expresses
  * with an opaque state blob; here the deadline is an explicit timer and
  * the state a named variable. Streaming-only by nature (a one-shot batch
  * has no advancing watermark), so it is pinned by SessionFinalizerSpec
  * rather than a DuckDB oracle — the same treatment as StateTtlSpec.
  */
object SessionFinalizer {

  final case class ClosedSession(user_id: Long, session_start_ms: Long,
      session_end_ms: Long, n_events: Long)

  /** K = user_id, I = (user_id, event_millis). */
  final class FinalizeProcessor(gapMs: Long)
      extends StatefulProcessor[Long, (Long, Long), ClosedSession] {
    @transient private var sess: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[(Long, Long, Long)]("sess",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
        timers: TimerValues): Iterator[ClosedSession] = {
      var (s, e, n) = if (sess.exists()) sess.get() else (Long.MaxValue, Long.MinValue, 0L)
      rows.foreach { case (_, t) =>
        s = math.min(s, t); e = math.max(e, t); n += 1
      }
      sess.update((s, e, n))
      // Exactly one pending deadline per key: the inactivity timer moves
      // forward with the newest event.
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(e + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[ClosedSession] = {
      val out =
        if (sess.exists()) {
          val (s, e, n) = sess.get()
          Iterator.single(ClosedSession(user, s, e, n))
        } else Iterator.empty
      sess.clear()
      out
    }
  }

  /** Streaming: watermark + event-time timers; emits only closed sessions. */
  def finalizedSessions(events: DataFrame, gapSeconds: Long = 30,
      watermark: String = "10 seconds"): Dataset[ClosedSession] = {
    implicit val outEnc: org.apache.spark.sql.Encoder[ClosedSession] =
      Encoders.product[ClosedSession]
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), unix_millis(col("ts")))
      .as(Encoders.product[(Long, Long)])
      .groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new FinalizeProcessor(gapSeconds * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
