package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming time-weighted average value (TWAP) per user — the online
  * twin of the batch `twap_by_user` query: each reading holds until the
  * next one arrives, and the running average weights it by the seconds
  * it was in force.
  *
  * State per user is four longs: last reading's (ts micros, value
  * CENTS) plus the running (Σ cents·seconds, Σ seconds). Values carry
  * two decimals, so cents are EXACT longs and the whole accumulation is
  * integer arithmetic — the emitted TWAP is one IEEE division, making
  * the one-shot batch run hash-equal to the same relational oracle as
  * the batch query (the still-open last reading has no duration and is
  * excluded in both). Within a batch the processor sorts its buffer by
  * (ts, event_id); across micro-batches the carried last reading closes
  * the interval that straddles the boundary. */
object TwapStream {

  final case class Twap(user_id: Long, n_intervals: Long, twap: Double)

  final case class TwapState(lastTs: Long, lastEid: Long, lastCents: Long,
    svd: Long, sd: Long, n: Long)

  /** K = user_id, I = (user_id, ts_us, event_id, cents). */
  final class TwapProcessor extends StatefulProcessor[Long, (Long, Long, Long, Long), Twap] {
    @transient private var st: ValueState[TwapState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[TwapState]("twap",
        Encoders.product[TwapState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long, Long)],
        timers: TimerValues): Iterator[Twap] = {
      val sorted = rows.toArray.sortBy(r => (r._2, r._3))
      var state = if (st.exists()) st.get() else null
      sorted.foreach { case (_, ts, eid, cents) =>
        if (state == null) state = TwapState(ts, eid, cents, 0L, 0L, 0L)
        // Strict (ts, event_id) frontier — the in-batch sort key — so an
        // at-least-once REPLAY of the frontier row is a no-op and a
        // cross-batch regression (which would close a NEGATIVE interval
        // and corrupt the exact accumulators) is dropped: the streaming
        // analogue of a watermark discard (Scd2Stream/FifoStream twin).
        else if (ts > state.lastTs || (ts == state.lastTs && eid > state.lastEid)) {
          val d = java.lang.Math.floorDiv(ts - state.lastTs, 1000000L)
          state = TwapState(ts, eid, cents,
            state.svd + state.lastCents * d, state.sd + d, state.n + 1)
        }
      }
      if (state != null) st.update(state)
      if (state != null && state.sd > 0)
        Iterator.single(Twap(key, state.n,
          state.svd.toDouble / (100.0 * state.sd.toDouble)))
      else Iterator.empty
    }
  }

  /** Batch or streaming: per-user running TWAP over closed intervals. */
  def twap(events: DataFrame): Dataset[Twap] = {
    // Same batch-mode StateStoreCoordinator pre-registration as TypeStats.
    try {
      val mgr = events.sparkSession.streams
      mgr.getClass.getMethod("stateStoreCoordinator").invoke(mgr)
    } catch { case _: ReflectiveOperationException => () }
    implicit val outEnc: org.apache.spark.sql.Encoder[Twap] = Encoders.product[Twap]
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"),
        round(col("value") * 100).cast("long"))
      .as(Encoders.product[(Long, Long, Long, Long)])
      .groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new TwapProcessor, TimeMode.None(), OutputMode.Update())
  }
}
