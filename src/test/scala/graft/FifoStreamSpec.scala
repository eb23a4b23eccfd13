package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FifoStream

/** Streaming FIFO matcher: the imbalance backlog must carry across
  * micro-batches (a lot queued in batch 1 matches in batch 2 with the
  * original lot identity and wait time), replayed prefixes must be
  * no-ops, and the union of per-batch emissions must equal both the
  * batch one-shot and the relational fifo_match operator. */
class FifoStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(id: Long, tsUs: Long, uid: Long, tpe: String, v: Double): Ev =
    Ev(id, new Timestamp(tsUs / 1000L), uid, tpe, v)

  private def batchMatches(events: Seq[Ev]): Set[(Long, Long, Long, Long, Long)] =
    FifoStream.matches(spark.createDataset(events)(Encoders.product[Ev]).toDF())
      .collect().map(m => (m.user_id, m.in_event, m.out_event, m.qty_cents, m.wait_us)).toSet

  test("lot splitting, partial fills, and demand-before-supply") {
    val got = batchMatches(Seq(
      ev(1, 1000000L, 1, "view", 3.00), // supply 300
      ev(2, 2000000L, 1, "purchase", 1.00), // takes 100 of lot 1
      ev(3, 3000000L, 1, "purchase", 2.50), // takes 200 of lot 1 + queues 50
      ev(4, 4000000L, 1, "view", 0.60))) // fills the queued 50, keeps 10
    assert(got === Set(
      (1L, 1L, 2L, 100L, 1000000L),
      (1L, 1L, 3L, 200L, 2000000L),
      (1L, 4L, 3L, 50L, -1000000L))) // demand waited for supply: negative wait
  }

  test("cross-batch backlog carry + replayed prefix is a no-op") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("view", "purchase"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-fifo-ckpt").toString
    val q = FifoStream.matches(stream.toDF())
      .writeStream.format("memory").queryName("fifo_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      val batches = events.grouped(250).toSeq
      batches.zipWithIndex.foreach { case (b, i) =>
        val withReplay = if (i == 1) batches(0).takeRight(40) ++ b else b
        stream.addData(withReplay); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("fifo_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // no duplicate lot matches despite the replayed prefix
    assert(streamed.length === streamed.distinct.length)
    assert(streamed.toSet === batchMatches(events))
    // ...and the batch one-shot equals the relational operator
    val relational = graft.queries.Relational.queries("fifo_match")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(batchMatches(events) === relational)
    assert(relational.nonEmpty)
  }
}
