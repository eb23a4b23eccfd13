package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FunnelStream

/** Streaming strict funnel: the pending-frontier state must carry open
  * views/stage-1s across micro-batch boundaries so the final per-user
  * counts equal the batch one-shot AND the relational window_funnel
  * operator; strictness (a late FIRST click kills the view) and the
  * at-or-after tie semantics are pinned on hand-built streams. */
class FunnelStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Tol = 86400000000L // 24 h in micros

  private def ev(id: Long, tsUs: Long, uid: Long, tpe: String): Ev =
    Ev(id, new Timestamp(tsUs / 1000L), uid, tpe, 1.0)

  private def batchCounts(events: Seq[Ev]): Map[Long, (Long, Long, Long)] =
    FunnelStream.funnel(
        spark.createDataset(events)(Encoders.product[Ev]).toDF(), Tol)
      .toDF().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("cross-batch frontier carry equals the batch one-shot") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id") // per-user ordered arrival, the stream contract
      .limit(900).collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-funnel-ckpt").toString
    val q = FunnelStream.funnel(stream.toDF(), Tol)
      .writeStream.format("memory").queryName("funnel_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      events.grouped(300).foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // counters only grow; the per-user max row is the final state
    val streamedFinal = spark.table("funnel_out")
      .groupBy("user_id")
      .agg(max("n_views").as("n_views"), max("n_s1").as("n_s1"), max("n_s2").as("n_s2"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val batch = batchCounts(events)
    assert(streamedFinal === batch)
    assert(batch.nonEmpty)
  }

  test("batch one-shot equals the relational window_funnel stage table") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val relational = graft.queries.Relational.windowFunnelStages(ev, Tol)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val streamed = graft.queries.MediaStreamQueries
      .queries("stream_funnel")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed === relational)
    assert(relational("1_view")._1 > 0)
  }

  test("strictness: a late first click kills the view for good") {
    val h = 3600000000L // 1 h
    // u1: view at t0, first click 30 h later (outside tol), another click
    // 31 h (inside tol of NOTHING — the view is dead), purchase after.
    val events = Seq(
      ev(1, 0L, 1, "view"),
      ev(2, 30 * h, 1, "click"),
      ev(3, 31 * h, 1, "click"),
      ev(4, 32 * h, 1, "purchase"),
      // u2: the same cadence but the first click in-window converts, and
      // the purchase 2 h after the click completes stage 2.
      ev(5, 0L, 2, "view"),
      ev(6, 20 * h, 2, "click"),
      ev(7, 22 * h, 2, "purchase"))
    val got = batchCounts(events)
    assert(got(1L) === ((1L, 0L, 0L)))
    assert(got(2L) === ((1L, 1L, 1L)))
  }

  test("at-or-after: equal-timestamp view->click->purchase chain counts") {
    val events = Seq(
      ev(1, 1000L, 7, "view"),
      ev(2, 1000L, 7, "click"),
      ev(3, 1000L, 7, "purchase"))
    assert(batchCounts(events)(7L) === ((1L, 1L, 1L)))
    // ...and one click serves as first-click-after for BOTH open views
    val two = Seq(
      ev(1, 0L, 9, "view"),
      ev(2, 500L, 9, "view"),
      ev(3, 1000L, 9, "click"),
      ev(4, 2000L, 9, "purchase"))
    assert(batchCounts(two)(9L) === ((2L, 2L, 2L)))
  }

  test("cross-batch regression is dropped, replayed frontier stays idempotent") {
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-funnel-ckpt2").toString
    val q = FunnelStream.funnel(stream.toDF(), Tol)
      .writeStream.format("memory").queryName("funnel_out2")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(Seq(ev(1, 5000L, 3, "view")))
      q.processAllAvailable()
      // a click BEFORE the carried lastTs regresses -> dropped; the
      // in-order click after it converts the still-open view
      stream.addData(Seq(ev(2, 1000L, 3, "click"), ev(3, 6000L, 3, "click"),
        ev(4, 7000L, 3, "purchase")))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("funnel_out2")
      .groupBy("user_id")
      .agg(max("n_views").as("v"), max("n_s1").as("c"), max("n_s2").as("p"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(last(3L) === ((1L, 1L, 1L)))
  }

  test("at-least-once replay of the exact frontier row is a no-op (round-8 ADVICE)") {
    // Batch 1 ends with a VIEW as the frontier; batch 2 redelivers that
    // exact row (at-least-once). With a ts-only >= frontier the replay
    // re-opens a second pending view (n_views = 2) which the later click/
    // purchase then double-convert; the strict (ts, stage-rank, event_id)
    // frontier must make the redelivery a no-op.
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-funnel-ckpt3").toString
    val q = FunnelStream.funnel(stream.toDF(), Tol)
      .writeStream.format("memory").queryName("funnel_out3")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(Seq(ev(1, 1000L, 11, "view")))
      q.processAllAvailable()
      stream.addData(Seq(ev(1, 1000L, 11, "view"))) // exact frontier redelivery
      q.processAllAvailable()
      stream.addData(Seq(ev(2, 2000L, 11, "click"), ev(3, 2500L, 11, "purchase")))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("funnel_out3")
      .groupBy("user_id")
      .agg(max("n_views").as("v"), max("n_s1").as("c"), max("n_s2").as("p"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(last(11L) === ((1L, 1L, 1L))) // the replay contributed NOTHING
  }
}
