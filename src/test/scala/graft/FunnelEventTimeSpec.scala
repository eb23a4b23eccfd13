package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FunnelStream

/** Event-time funnel (round-8 VERDICT 5): the ordered-arrival contract is
  * replaced by watermark buffering + event-time timers, so the SAME events
  * shuffled across micro-batches must reproduce the ordered run's counts
  * bit-for-bit — the ordered run itself being pinned against the
  * relational window_funnel oracle by FunnelStreamSpec. */
class FunnelEventTimeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Tol = 86400000000L // 24 h in micros
  private val H = 3600000000L // 1 h in micros

  private def ev(id: Long, tsUs: Long, uid: Long, tpe: String): Ev =
    Ev(id, new Timestamp(tsUs / 1000L), uid, tpe, 1.0)

  /** Ordered one-shot through the arrival-order processor — the pinned
    * reference result. */
  private def orderedCounts(events: Seq[Ev]): Map[Long, (Long, Long, Long)] =
    FunnelStream.funnel(
        spark.createDataset(events)(Encoders.product[Ev]).toDF(), Tol)
      .toDF().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  /** Runs the event-time funnel over the given micro-batches and returns
    * the finalized per-user counts (counters only grow under Update
    * mode, so max per user is the final state). */
  private def streamCounts(batches: Seq[Seq[Ev]], delay: String,
      name: String): Map[Long, (Long, Long, Long)] = {
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory(s"graft-funnel-et-$name").toString
    val q = FunnelStream.funnelEventTime(stream.toDF(), Tol, delay)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name)
      .groupBy("user_id")
      .agg(max("n_views").as("v"), max("n_s1").as("c"), max("n_s2").as("p"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
      .filter(_._1 >= 0L) // drop the watermark-carrier user
  }

  /** Watermark carriers must be REAL funnel events (type `view`, the
    * dedicated user -1): Catalyst pushes the event-type filter BELOW the
    * EventTimeWatermark node (the predicate doesn't touch `ts`), so a
    * made-up event type would be dropped before the watermark collector
    * ever saw its timestamp and the watermark would never advance. */
  private def tick(id: Long, tsUs: Long): Ev = ev(id, tsUs, -1L, "view")

  test("fully shuffled arrival across micro-batches equals the ordered run") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .limit(900).collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
    val reference = orderedCounts(events)

    // Shuffle the ENTIRE event sequence (seeded, reproducible) and split
    // into 3 arbitrary micro-batches: a view can arrive batches after the
    // click that closes it. A watermark delay spanning the whole fixture
    // keeps every row inside the disorder bound; the sentinel tick —
    // filtered out before the processor but visible to the watermark —
    // then pushes the watermark past every real event, firing each user's
    // timer and flushing the buffers in true event-time order.
    val shuffled = new scala.util.Random(42L).shuffle(events)
    val maxUs = events.map(e => e.ts.getTime * 1000L).max
    val delayUs = 3650L * 24 * H // 3650 days in micros
    // Two ticks: the first advances the watermark past every real event;
    // the second's (real-data) batch deterministically fires the timers
    // that first watermark armed — no reliance on a no-data micro-batch
    // racing processAllAvailable.
    val batches = shuffled.grouped(300).toSeq :+
      Seq(tick(-1L, maxUs + delayUs + 24 * H)) :+
      Seq(tick(-2L, maxUs + delayUs + 48 * H))
    val got = streamCounts(batches, "3650 days", "funnel_et_full")

    assert(got === reference)
    assert(reference.nonEmpty)
  }

  test("bounded disorder with incremental watermark flushes equals the ordered run") {
    // 10 events over 9 hours for one user, locally shuffled inside each
    // micro-batch, delay 2 h: the watermark advances batch by batch and
    // the timer fires repeatedly, each flush folding only the rows the
    // watermark has passed — multiple partial flushes, not one final one.
    val events = Seq(
      ev(1, 0 * H, 21, "view"),
      ev(2, 1 * H, 21, "click"),
      ev(3, 2 * H, 21, "view"),
      ev(4, 3 * H, 21, "click"),
      ev(5, 4 * H, 21, "purchase"),
      ev(6, 5 * H, 21, "view"),
      ev(7, 6 * H, 21, "click"),
      ev(8, 7 * H, 21, "purchase"),
      ev(9, 8 * H, 21, "view"),
      ev(10, 9 * H, 21, "click"))
    val reference = orderedCounts(events)
    val batches = Seq(
      Seq(events(2), events(0), events(1)), // h2, h0, h1
      Seq(events(4), events(3), events(5)), // h4, h3, h5
      Seq(events(7), events(6)), //           h7, h6
      Seq(events(8), events(9)), //           h8, h9
      Seq(tick(-1L, 20 * H)),
      Seq(tick(-2L, 21 * H)))
    val got = streamCounts(batches, "2 hours", "funnel_et_incr")
    assert(got(21L) === reference(21L))
    // v: h0 h2 h5 h8; s1: every view's first click converts (tol 24 h);
    // s2: purchase h4 closes pending clicks h1+h3, purchase h7 closes h6.
    assert(reference(21L) === ((4L, 4L, 3L)))
  }

  test("a key receiving input in EVERY micro-batch still flushes (timer never moved forward)") {
    // Regression for the armTimer starvation bug: input rows are
    // processed before expired timers, so re-registering a live timer
    // past the batch's watermark on every handleInputRows call means a
    // key with input in every micro-batch NEVER fires — emissions stall
    // and the buffer grows unboundedly. Here user 51 appears in all 7
    // batches (no input-free batch, no separate tick user); the two huge
    // trailing events double as the watermark carriers. With the fix the
    // timer armed early stays put and fires as the watermark passes it.
    val funnel = Seq(
      ev(1, 1 * H, 51, "view"), ev(2, 2 * H, 51, "click"),
      ev(3, 3 * H, 51, "view"), ev(4, 4 * H, 51, "click"),
      ev(5, 5 * H, 51, "purchase"))
    val reference = orderedCounts(funnel)
    // Carriers are PURCHASES with no pending clicks: whether or not a
    // trailing no-data batch flushes them, they change no count, so the
    // expectation is race-free.
    val carriers = Seq(ev(6, 100 * H, 51, "purchase"), ev(7, 200 * H, 51, "purchase"))
    // delay 0 s: each batch's max ts becomes the next batch's watermark,
    // so every batch both delivers user-51 input AND advances the
    // watermark past the previous event. The 100 h carrier's watermark
    // (raised while batch 7 is processed) flushes all five funnel events,
    // so the counts equal the ordered 5-event run.
    val batches = (funnel ++ carriers).map(Seq(_))
    val got = streamCounts(batches, "0 seconds", "funnel_et_everybatch")
    assert(got.get(51L) === Some(reference(51L)))
    // v: h1 h3; s1: each view's next click converts (h2, h4); s2: the
    // h5 purchase closes BOTH pending clicks.
    assert(reference(51L) === ((2L, 2L, 2L)))
  }

  test("a row staler than the flushed frontier is discarded, not mis-folded") {
    // u31's view+click fold once the watermark passes them; a click then
    // arrives 13 h stale — BELOW the flushed frontier — and the fold's
    // strict frontier must treat it as the watermark discard it is: the
    // final counts equal the ordered run over the event set WITHOUT it.
    val inOrder = Seq(
      ev(1, 0 * H, 31, "view"), ev(2, 1 * H, 31, "click"),
      ev(3, 12 * H, 31, "view"), ev(4, 13 * H, 31, "click"),
      ev(5, 14 * H, 31, "purchase"))
    val reference = orderedCounts(inOrder)
    val batches = Seq(
      Seq(inOrder(0), inOrder(1), inOrder(2)),
      Seq(inOrder(3), inOrder(4)),
      Seq(ev(6, 1 * H + 1000L, 31, "click")), // 13 h stale vs max seen
      Seq(tick(-1L, 40 * H)),
      Seq(tick(-2L, 41 * H)))
    val got = streamCounts(batches, "2 hours", "funnel_et_late")
    assert(got(31L) === reference(31L))
    // both views convert; purchase h14 is first-after for BOTH pending
    // clicks (h1 at 13 h, h13 at 1 h — both inside the 24 h tolerance)
    assert(reference(31L) === ((2L, 2L, 2L)))
  }
}
