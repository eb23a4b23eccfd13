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

  /** Sliding 14-day windows every 7 days: each event lands in exactly 2
    * overlapping windows (ceil(duration/slide)). Same watermark + partial
    * aggregation shape as the tumbling variant — the state grows by the
    * overlap factor, not the history; batch mode is hash-checked against
    * a DuckDB oracle that explodes each event to its 2 window starts. */
  def slidingTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "14 days", "7 days").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  final case class SessionRow(
      user_id: Long, session_no: Long, n_events: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      first_event: Long)

  /** Open-session state: number of sessions already closed plus the
    * running tail session (open_n == 0 → no open session yet). */
  final case class SessState(
      closed: Long, open_start: Long, open_last: Long, open_n: Long,
      open_first: Long)

  private def microsToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Gap-based sessionization via flatMapGroupsWithState — the
    * KeyValueGroupedDataset multi-row-output custom-state surface. Each
    * invocation sorts its batch's rows by (event time, event id), splits
    * on gaps > `gapMicros`, and emits every session touched this batch —
    * including the still-open tail, whose row is re-emitted (same
    * (user_id, session_no), grown n_events) if a later batch extends it:
    * Update-style semantics, downstream keeps the latest row per key.
    * In one-shot batch mode that makes the output exactly the gap
    * sessionization of the whole input, which is how the query
    * `sessionize_stateful` is hash-checked against the SAME DuckDB oracle
    * as the window-based `sessionize` — a typed-stateful vs relational
    * differential test of one semantics. */
  def sessionizeStateful(events: DataFrame, gapMicros: Long): Dataset[SessionRow] = {
    val byUser = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")).as("t"))
      .as(Encoders.product[(Long, Long, Long)])
      .groupByKey(_._1)(Encoders.scalaLong)
    byUser.flatMapGroupsWithState[SessState, SessionRow](
      OutputMode.Append(), GroupStateTimeout.NoTimeout)(
      (user: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[SessState]) => {
        val sorted = rows.toSeq.map { case (_, eid, t) => (t, eid) }.sorted
        var s = state.getOption.getOrElse(SessState(0L, 0L, 0L, 0L, 0L))
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
        sorted.foreach { case (t, eid) =>
          if (s.open_n == 0L)
            s = SessState(s.closed, t, t, 1L, eid)
          else if (t - s.open_last > gapMicros) {
            out += SessionRow(user, s.closed + 1, s.open_n,
              microsToTs(s.open_start), microsToTs(s.open_last), s.open_first)
            s = SessState(s.closed + 1, t, t, 1L, eid)
          } else
            s = s.copy(open_last = t, open_n = s.open_n + 1,
              open_first = math.min(s.open_first, eid))
        }
        if (s.open_n > 0L)
          out += SessionRow(user, s.closed + 1, s.open_n,
            microsToTs(s.open_start), microsToTs(s.open_last), s.open_first)
        state.update(s)
        out.iterator
      })(Encoders.product[SessState], Encoders.product[SessionRow])
  }

  /** Closed-sessions-only sessionization with an event-time timeout —
    * the production streaming shape: downstream sees each session exactly
    * once, final, in Append mode. A session row is emitted either when a
    * later event of the same user closes it (gap > `gapMicros`) or when
    * the watermark passes the open session's end + gap
    * (GroupStateTimeout.EventTimeTimeout fires, the tail is flushed and
    * its state removed — state stays bounded by the number of users with
    * a live session, not by history).
    *
    * In one-shot batch mode timeouts never fire, so the result is exactly
    * the gap sessionization minus each user's (still open) last session —
    * SQL-expressible, which is how `sessionize_closed` is hash-checked
    * against DuckDB.
    */
  def sessionizeClosed(events: DataFrame, gapMicros: Long): Dataset[SessionRow] = {
    // The watermarked column must survive projection up to the stateful
    // operator, or the analyzer rejects EventTimeTimeout — hence ts rides
    // along as _4 even though the fold only uses the micros in _3.
    val byUser = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")).as("t"), col("ts"))
      .withWatermark("ts", "0 seconds")
      .as(Encoders.product[(Long, Long, Long, java.sql.Timestamp)])
      .groupByKey(_._1)(Encoders.scalaLong)
    byUser.flatMapGroupsWithState[SessState, SessionRow](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
      (user: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
          state: GroupState[SessState]) => {
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          if (s.open_n > 0L)
            Iterator.single(SessionRow(user, s.closed + 1, s.open_n,
              microsToTs(s.open_start), microsToTs(s.open_last), s.open_first))
          else Iterator.empty
        } else {
          val sorted = rows.toSeq.map { case (_, eid, t, _) => (t, eid) }.sorted
          var s = state.getOption.getOrElse(SessState(0L, 0L, 0L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
          sorted.foreach { case (t, eid) =>
            if (s.open_n == 0L)
              s = SessState(s.closed, t, t, 1L, eid)
            else if (t - s.open_last > gapMicros) {
              out += SessionRow(user, s.closed + 1, s.open_n,
                microsToTs(s.open_start), microsToTs(s.open_last), s.open_first)
              s = SessState(s.closed + 1, t, t, 1L, eid)
            } else
              s = s.copy(open_last = t, open_n = s.open_n + 1,
                open_first = math.min(s.open_first, eid))
          }
          state.update(s)
          if (s.open_n > 0L) {
            // Batch mode has no watermark (the getter throws) and ignores
            // the timeout anyway; streaming requires the timestamp to sit
            // strictly past the current watermark.
            val wm =
              try state.getCurrentWatermarkMs()
              catch { case _: UnsupportedOperationException => Long.MinValue }
            val target =
              Math.floorDiv(s.open_last, 1000L) + Math.floorDiv(gapMicros, 1000L)
            state.setTimeoutTimestamp(math.max(target, wm + 1L))
          }
          out.iterator
        }
      })(Encoders.product[SessState], Encoders.product[SessionRow])
  }

  final case class TopKEntry(value: Double, event_id: Long)
  final case class TopKState(entries: Seq[TopKEntry])
  final case class UserTopK(user_id: Long, rank: Long, event_id: Long, value: Double)

  /** Stateful bounded top-k per user: state holds at most k
    * (value desc, event_id asc) entries per key — O(k) state per user
    * regardless of history, the streaming leaderboard shape. Each
    * micro-batch emits the key's refreshed top-k (Update-mode sink
    * semantics); ranks at a given position only ever improve. In one-shot
    * batch mode this reproduces the relational `row_number() <= k` window
    * exactly, which is how the query is hash-checked against DuckDB
    * (typed-stateful vs relational differential, like sessionize). */
  def topKPerUser(events: DataFrame, k: Int): Dataset[UserTopK] = {
    val byUser = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("value").cast("double"))
      .as(Encoders.product[(Long, Long, Double)])
      .groupByKey(_._1)(Encoders.scalaLong)
    byUser.flatMapGroupsWithState[TopKState, UserTopK](
      OutputMode.Update(), GroupStateTimeout.NoTimeout)(
      (user: Long, rows: Iterator[(Long, Long, Double)],
          state: GroupState[TopKState]) => {
        // Bounded insert-fold: the buffer never holds more than k
        // entries, so per-key memory stays O(k) even when one batch (or
        // the one-shot batch mode) carries a user's full history. Each
        // row either binary-inserts into the ≤k buffer or is discarded
        // on comparison with the current worst entry.
        val ord = Ordering.by[TopKEntry, (Double, Long)](e => (-e.value, e.event_id))
        val buf = scala.collection.mutable.ArrayBuffer.empty[TopKEntry]
        buf ++= state.getOption.map(_.entries).getOrElse(Seq.empty)
        rows.foreach { case (_, eid, v) =>
          val e = TopKEntry(v, eid)
          if (buf.length < k || ord.lt(e, buf.last)) {
            var lo = 0; var hi = buf.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (ord.lt(buf(mid), e)) lo = mid + 1 else hi = mid
            }
            buf.insert(lo, e)
            if (buf.length > k) buf.remove(k)
          }
        }
        val merged = buf.toSeq
        state.update(TopKState(merged))
        merged.iterator.zipWithIndex.map { case (e, i) =>
          UserTopK(user, i + 1L, e.event_id, e.value)
        }
      })(Encoders.product[TopKState], Encoders.product[UserTopK])
  }

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
