package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SessionFinalizer

/** transformWithState EVENT-TIME TIMERS: a user's session must be emitted
  * exactly once, only after the watermark passes `last event + gap`, with
  * the timer re-armed (not duplicated) by later events. Pins the
  * registerTimer / deleteTimer / handleExpiredTimer surface that
  * TypeStats (ValueState+MapState) and RecentEvents (ListState) don't
  * touch. */
class SessionFinalizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("timer fires only after watermark passes the inactivity deadline, once") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-finalize-ckpt").toString
    // gap 30s, watermark delay 10s.
    val q = SessionFinalizer.finalizedSessions(stream.toDF(), gapSeconds = 30)
      .writeStream.format("memory").queryName("closed_sessions")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // Batch 1: user 1 active at t=0s and t=10s -> deadline t=40s.
      stream.addData(Seq(
        Ev(1L, ts(0), 1L, "view", 1.0),
        Ev(2L, ts(10), 1L, "view", 1.0)))
      q.processAllAvailable()
      assert(spark.table("closed_sessions").count() === 0,
        "no session may close before the watermark reaches the deadline")

      // Batch 2: user 2 at t=120s -> watermark advances to 110s ONLY
      // after this batch commits; user 1's 40s deadline fires on the
      // next trigger.
      stream.addData(Seq(Ev(3L, ts(120), 2L, "view", 1.0)))
      q.processAllAvailable()
      // Batch 3: another event far ahead; by now watermark(110s) > 40s.
      stream.addData(Seq(Ev(4L, ts(240), 2L, "view", 1.0)))
      q.processAllAvailable()

      val closed = spark.table("closed_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val u1 = closed.filter(_._1 == 1L)
      assert(u1.length === 1, s"user 1 must close exactly once, got ${u1.toSeq}")
      assert(u1.head === ((1L, 0L, 10000L, 2L)),
        "closed session must carry min/max event time and the event count")
    } finally q.stop()
  }

  test("later events re-arm the deadline instead of stacking timers") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-finalize-ckpt2").toString
    val q = SessionFinalizer.finalizedSessions(stream.toDF(), gapSeconds = 30)
      .writeStream.format("memory").queryName("closed_sessions2")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // User 1 keeps touching the session: t=0, then t=50 (before the
      // first 30s deadline could fire, watermark still behind), so the
      // deadline moves to 80s; both events must land in ONE session.
      stream.addData(Seq(Ev(1L, ts(0), 1L, "view", 1.0)))
      q.processAllAvailable()
      stream.addData(Seq(Ev(2L, ts(50), 1L, "view", 1.0)))
      q.processAllAvailable()
      stream.addData(Seq(Ev(3L, ts(300), 2L, "view", 1.0)))
      q.processAllAvailable()
      stream.addData(Seq(Ev(4L, ts(400), 2L, "view", 1.0)))
      q.processAllAvailable()
      val u1 = spark.table("closed_sessions2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter(_._1 == 1L)
      assert(u1.length === 1, s"re-armed timer must close one merged session, got ${u1.toSeq}")
      assert(u1.head === ((1L, 0L, 50000L, 2L)))
    } finally q.stop()
  }
}
