package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Scd2Stream

/** Event-time SCD2 history builder: the ordered-arrival contract is
  * replaced by watermark buffering + event-time timers, so the SAME
  * change events shuffled across micro-batches must reproduce the
  * ordered run's history — closed intervals bit-for-bit and emitted
  * exactly once, the open regime as the per-key latest open row. The
  * ordered run itself is pinned against the relational scd2_history
  * oracle by Scd2StreamSpec. */
class Scd2EventTimeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val H = 3600000000L // 1 h in micros

  private def ev(id: Long, tsUs: Long, uid: Long, tpe: String): Ev =
    Ev(id, new Timestamp(tsUs / 1000L), uid, tpe, 1.0)

  private def ordered(events: Seq[Ev]): (Set[(Long, String, Long, Long)], Map[Long, (String, Long)]) =
    collapse(Scd2Stream.history(
        spark.createDataset(events)(Encoders.product[Ev]).toDF())
      .collect().map(o => (o.user_id, o.event_type, o.from_us, o.to_us)))

  /** (closed interval set, per-key current regime = the open row with
    * the max from_us). Closed rows must be unique — exactly-once. */
  private def collapse(rows: Seq[(Long, String, Long, Option[Long])])
      : (Set[(Long, String, Long, Long)], Map[Long, (String, Long)]) = {
    val closed = rows.collect { case (u, t, f, Some(to)) => (u, t, f, to) }
    assert(closed.length === closed.distinct.length, "a closed interval was emitted twice")
    val open = rows.collect { case (u, t, f, None) => (u, t, f) }
      .groupBy(_._1).map { case (u, rs) =>
        val latest = rs.maxBy(_._3)
        u -> (latest._2, latest._3)
      }
    (closed.toSet, open)
  }

  private def streamed(batches: Seq[Seq[Ev]], delay: String,
      name: String): (Set[(Long, String, Long, Long)], Map[Long, (String, Long)]) = {
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory(s"graft-scd2-et-$name").toString
    val q = Scd2Stream.historyEventTime(stream.toDF(), delay)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    finally q.stop()
    val rows = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .filter(_._1 >= 0L) // drop the watermark-carrier user
      .toSeq
    collapse(rows)
  }

  private def tick(id: Long, tsUs: Long): Ev = ev(id, tsUs, -1L, "view")

  test("fully shuffled arrival across micro-batches equals the ordered history") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .limit(900).collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
    val (refClosed, refOpen) = ordered(events)

    val shuffled = new scala.util.Random(44L).shuffle(events)
    val maxUs = events.map(e => e.ts.getTime * 1000L).max
    val delayUs = 3650L * 24 * H
    val batches = shuffled.grouped(300).toSeq :+
      Seq(tick(-1L, maxUs + delayUs + 24 * H)) :+
      Seq(tick(-2L, maxUs + delayUs + 48 * H))
    val (gotClosed, gotOpen) = streamed(batches, "3650 days", "scd2_et_full")

    assert(gotClosed === refClosed)
    assert(gotOpen === refOpen)
    assert(refClosed.nonEmpty)
  }

  test("a regime opened in one flush closes in a later one, exactly once") {
    // u5: regime A (h1..h2 events), closed by B at h5, B closed by A at
    // h9 — three regimes across three watermark firings, each closed
    // interval emitted on a DIFFERENT flush than the one that opened it.
    val events = Seq(
      ev(1, 1 * H, 5, "view"), ev(2, 2 * H, 5, "view"),
      ev(3, 5 * H, 5, "click"),
      ev(4, 9 * H, 5, "view"))
    val (refClosed, refOpen) = ordered(events)
    val batches = Seq(
      Seq(events(1), events(0)), // locally shuffled
      Seq(events(2)),
      Seq(events(3)),
      Seq(tick(-1L, 30 * H)),
      Seq(tick(-2L, 31 * H)))
    val (gotClosed, gotOpen) = streamed(batches, "2 hours", "scd2_et_incr")
    assert(gotClosed === refClosed)
    assert(gotOpen === refOpen)
    assert(refClosed === Set(
      (5L, "view", 1 * H, 5 * H),
      (5L, "click", 5 * H, 9 * H)))
    assert(refOpen === Map(5L -> (("view", 9 * H))))
  }
}
