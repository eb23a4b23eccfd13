package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FifoStream

/** Event-time FIFO matcher (round-9 VERDICT 7): the ordered-arrival
  * contract is replaced by watermark buffering + event-time timers, so
  * the SAME events shuffled across micro-batches must reproduce the
  * ordered run's match set bit-for-bit — the ordered run itself being
  * pinned against the relational fifo_match oracle by FifoStreamSpec. */
class FifoEventTimeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val H = 3600000000L // 1 h in micros

  private def ev(id: Long, tsUs: Long, uid: Long, tpe: String, v: Double): Ev =
    Ev(id, new Timestamp(tsUs / 1000L), uid, tpe, v)

  /** Ordered one-shot through the arrival-order processor — the pinned
    * reference result (itself oracle-pinned by FifoStreamSpec). */
  private def orderedMatches(events: Seq[Ev]): Set[(Long, Long, Long, Long, Long)] =
    FifoStream.matches(spark.createDataset(events)(Encoders.product[Ev]).toDF())
      .collect().map(m => (m.user_id, m.in_event, m.out_event, m.qty_cents, m.wait_us)).toSet

  /** Runs the event-time matcher over the given micro-batches and
    * returns the union of emitted match rows (each emitted exactly once
    * under Update mode — duplicates are asserted away). */
  private def streamMatches(batches: Seq[Seq[Ev]], delay: String,
      name: String): Set[(Long, Long, Long, Long, Long)] = {
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory(s"graft-fifo-et-$name").toString
    val q = FifoStream.matchesEventTime(stream.toDF(), delay)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    finally q.stop()
    val rows = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .filter(_._1 >= 0L) // drop watermark-carrier matches (user -1)
    assert(rows.length === rows.distinct.length, "a match row was emitted twice")
    rows.toSet
  }

  /** Watermark carriers must be REAL matcher events (type `view`, the
    * dedicated user -1): Catalyst pushes the event-type filter BELOW the
    * EventTimeWatermark node, so a made-up type would be dropped before
    * the watermark collector saw its timestamp. */
  private def tick(id: Long, tsUs: Long): Ev = ev(id, tsUs, -1L, "view", 0.0)

  test("fully shuffled arrival across micro-batches equals the ordered run") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("view", "purchase"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .limit(900).collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
    val reference = orderedMatches(events)

    val shuffled = new scala.util.Random(43L).shuffle(events)
    val maxUs = events.map(e => e.ts.getTime * 1000L).max
    val delayUs = 3650L * 24 * H
    // Two ticks: the first advances the watermark past every real event;
    // the second's batch deterministically fires the armed timers.
    val batches = shuffled.grouped(300).toSeq :+
      Seq(tick(-1L, maxUs + delayUs + 24 * H)) :+
      Seq(tick(-2L, maxUs + delayUs + 48 * H))
    val got = streamMatches(batches, "3650 days", "fifo_et_full")

    assert(got === reference)
    assert(reference.nonEmpty)
  }

  test("bounded disorder with incremental flushes: backlog carries across firings") {
    // One user, lots split across several watermark firings: the open
    // backlog (a partially-filled supply lot) must carry from flush to
    // flush with its original identity and wait times.
    val events = Seq(
      ev(1, 1 * H, 7, "view", 3.00), //     supply 300
      ev(2, 2 * H, 7, "purchase", 1.00), // takes 100 of lot 1
      ev(3, 4 * H, 7, "purchase", 2.50), // takes 200 of lot 1 + queues 50
      ev(4, 6 * H, 7, "view", 0.60), //     fills the queued 50, keeps 10
      ev(5, 8 * H, 7, "purchase", 0.10)) // drains the kept 10
    val reference = orderedMatches(events)
    val batches = Seq(
      Seq(events(1), events(0)), //   h2, h1 (locally shuffled)
      Seq(events(3), events(2)), //   h6, h4
      Seq(events(4)), //              h8
      Seq(tick(-1L, 30 * H)),
      Seq(tick(-2L, 31 * H)))
    val got = streamMatches(batches, "2 hours", "fifo_et_incr")
    assert(got === reference)
    assert(reference === Set(
      (7L, 1L, 2L, 100L, 1 * H),
      (7L, 1L, 3L, 200L, 3 * H),
      (7L, 4L, 3L, 50L, -2 * H),
      (7L, 4L, 5L, 10L, 2 * H)))
  }

  test("a row staler than the flushed frontier is discarded, not mis-matched") {
    // The first flush folds lots up to h4; a purchase then arrives 3 h
    // stale — below the flushed frontier — and must be the watermark
    // discard it is: final matches equal the ordered run WITHOUT it.
    val inOrder = Seq(
      ev(1, 1 * H, 9, "view", 2.00),
      ev(2, 2 * H, 9, "purchase", 1.00),
      ev(3, 6 * H, 9, "purchase", 1.00))
    val reference = orderedMatches(inOrder)
    val batches = Seq(
      Seq(inOrder(0), inOrder(1)),
      Seq(inOrder(2)),
      Seq(ev(4, 3 * H, 9, "purchase", 5.00)), // stale vs flushed frontier
      Seq(tick(-1L, 30 * H)),
      Seq(tick(-2L, 31 * H)))
    val got = streamMatches(batches, "1 hours", "fifo_et_late")
    assert(got === reference)
    assert(reference === Set(
      (9L, 1L, 2L, 100L, 1 * H),
      (9L, 1L, 3L, 100L, 5 * H)))
  }
}
