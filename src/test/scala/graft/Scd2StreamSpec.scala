package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Scd2Stream

/** Streaming SCD2: closed intervals must emit exactly once with the
  * change timestamp, the open interval must follow the frontier across
  * micro-batches, and the final history must equal both the batch
  * one-shot and the relational lag/lead operator. */
class Scd2StreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(id: Long, tsUs: Long, uid: Long, tpe: String): Ev =
    Ev(id, new Timestamp(tsUs / 1000L), uid, tpe, 1.0)

  private def history(events: Seq[Ev]): Set[(Long, String, Long, Option[Long])] =
    Scd2Stream.history(spark.createDataset(events)(Encoders.product[Ev]).toDF())
      .collect().map(o => (o.user_id, o.event_type, o.from_us, o.to_us)).toSet

  test("regime changes close intervals; same-type events only advance") {
    val got = history(Seq(
      ev(1, 1000000L, 1, "view"), ev(2, 2000000L, 1, "view"),
      ev(3, 3000000L, 1, "click"), ev(4, 4000000L, 1, "purchase"),
      ev(5, 9000000L, 2, "view")))
    assert(got === Set(
      (1L, "view", 1000000L, Some(3000000L)),
      (1L, "click", 3000000L, Some(4000000L)),
      (1L, "purchase", 4000000L, None),
      (2L, "view", 9000000L, None)))
  }

  test("cross-batch carry + replay: closed rows emit once, history matches batch") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") < 20)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-scd2-ckpt").toString
    val q = Scd2Stream.history(stream.toDF())
      .writeStream.format("memory").queryName("scd2_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      val batches = events.grouped(400).toSeq
      batches.zipWithIndex.foreach { case (b, i) =>
        // batch 2 replays the tail of batch 1: frontier must drop it
        val withReplay = if (i == 1) batches(0).takeRight(50) ++ b else b
        stream.addData(withReplay); q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table("scd2_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    // closed intervals (to_us defined) must be unique — emitted exactly once
    val closed = rows.filter(_._4.isDefined)
    assert(closed.length === closed.distinct.length)
    // final history = all closed + the LAST open row per user
    val lastOpen = rows.filter(_._4.isEmpty).groupBy(_._1)
      .map { case (_, rs) => rs.maxBy(_._3) }.toSet
    assert((closed.toSet ++ lastOpen) === history(events))
  }

  test("batch one-shot equals the relational scd2_history operator") {
    val dir = "/root/testdata/sf0.001"
    val relational = graft.queries.Relational.queries("scd2_history")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)))).toSet
    val streamed = graft.queries.MediaStreamQueries.queries("stream_scd2")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)))).toSet
    assert(streamed === relational)
    assert(relational.nonEmpty)
  }
}
