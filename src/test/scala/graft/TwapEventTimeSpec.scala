package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TwapStream

/** Event-time TWAP: the watermark-buffered edition must reproduce the
  * ordered run's exact integer accumulators (and hence its one-division
  * double) when the SAME readings arrive shuffled across micro-batches
  * inside the watermark delay. */
class TwapEventTimeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val H = 3600000000L // 1 h in micros

  private def ev(id: Long, tsUs: Long, uid: Long, value: Double): Ev =
    Ev(id, new Timestamp(tsUs / 1000L), uid, "reading", value)

  private def orderedTwap(events: Seq[Ev]): Map[Long, (Long, Double)] =
    TwapStream.twap(
        spark.createDataset(events)(Encoders.product[Ev]).toDF())
      .toDF().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("shuffled arrival across micro-batches equals the ordered run") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .limit(600).collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
    val reference = orderedTwap(events)

    val shuffled = new scala.util.Random(7L).shuffle(events)
    val maxUs = events.map(e => e.ts.getTime * 1000L).max
    val delayUs = 3650L * 24 * H
    // watermark carriers: far-future rows for a dedicated user, excluded
    // from the comparison (TWAP has no event-type filter, so any row
    // advances the watermark; the dedicated user keeps real users clean)
    val batches = shuffled.grouped(200).toSeq :+
      Seq(ev(-1L, maxUs + delayUs + 24 * H, -1L, 1.0)) :+
      Seq(ev(-2L, maxUs + delayUs + 48 * H, -1L, 1.0))

    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-twap-et").toString
    val q = TwapStream.twapEventTime(stream.toDF(), "3650 days")
      .writeStream.format("memory").queryName("twap_et")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    finally q.stop()

    // n_intervals only grows; per user the max-n row is the final state
    val got = spark.table("twap_et")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("n_intervals").desc)))
      .filter(col("rn") === 1).drop("rn")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      .filter(_._1 >= 0L)

    assert(got === reference)
    assert(reference.nonEmpty)
  }
}
