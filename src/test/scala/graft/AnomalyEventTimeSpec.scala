package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AnomalyStream

/** Event-time gap anomalies: a per-event detector (not a running
  * aggregate) under watermark buffering — the flag SET over shuffled
  * micro-batches must equal the ordered run's, and no flag may fire
  * twice even though flushes re-emit nothing (per-event outputs
  * accumulate in the sink, so set-equality is the strong check). */
class AnomalyEventTimeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val H = 3600000000L // 1 h in micros

  private def ev(id: Long, tsUs: Long, uid: Long): Ev =
    Ev(id, new Timestamp(tsUs / 1000L), uid, "ping", 1.0)

  test("shuffled arrival flags exactly the ordered run's anomaly set") {
    // u5: steady 1 h cadence, then a 30 h silence (the flag), then steady
    // again; u6: steady, never flags.
    val events =
      (0 to 7).map(i => ev(10 + i, i * H, 5)) ++
        Seq(ev(18, 37 * H, 5)) ++
        (1 to 3).map(i => ev(18 + i, (37 + i) * H, 5)) ++
        (0 to 9).map(i => ev(40 + i, i * H, 6))
    val ordered = AnomalyStream.gapAnomalies(
        spark.createDataset(events)(Encoders.product[Ev]).toDF())
      .collect().map(f => (f.user_id, f.event_id, f.gap_s, f.n_prior)).toSet
    assert(ordered.exists(_._2 == 18L), "the 30 h silence must flag")

    val shuffled = new scala.util.Random(3L).shuffle(events)
    val batches = shuffled.grouped(8).toSeq :+
      Seq(ev(-1L, 2000 * H, -1L)) :+ Seq(ev(-2L, 2001 * H, -1L))
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-anom-et").toString
    val q = AnomalyStream.gapAnomaliesEventTime(stream.toDF(), "1000 hours")
      .writeStream.format("memory").queryName("anom_et")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    finally q.stop()

    val got = spark.table("anom_et")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet.filter(_._1 >= 0L)
    assert(got === ordered)
  }
}
