package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TwapStream

/** Streaming TWAP: the interval that straddles a micro-batch boundary
  * must still be closed (last reading carried in state), so the final
  * emission per user equals the one-shot batch run; and the batch fold
  * is row-order insensitive (the processor sorts its buffer). */
class TwapStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixtureEvents(n: Int): Seq[Ev] = {
    val raw = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(n).collect()
    raw.map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
  }

  test("cross-batch interval closes and the final stream state equals the batch run") {
    val events = fixtureEvents(600).sortBy(e => (e.ts.getTime, e.event_id))
    val (first, second) = events.splitAt(300)
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-twap-ckpt").toString
    val q = TwapStream.twap(stream.toDF())
      .writeStream.format("memory").queryName("twap_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
    } finally q.stop()

    // n_intervals grows monotonically; the max-n emission is the final.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val streamedFinal = spark.table("twap_out")
      .withColumn("max_n", max("n_intervals").over(w))
      .filter(col("n_intervals") === col("max_n"))
      .select("user_id", "n_intervals", "twap").distinct()
    val batch = TwapStream.twap(
      spark.createDataset(events)(Encoders.product[Ev]).toDF()).toDF()
    assert(streamedFinal.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamedFinal).count() === 0)
    assert(batch.count() > 0)
  }

  test("a cross-batch late event (ts before the carried last reading) is dropped, not folded negative") {
    import java.sql.Timestamp
    val t0 = 1704067200000L // 2024-01-01 00:00:00
    def ev(id: Long, offSec: Long, v: Double) =
      Ev(id, new Timestamp(t0 + offSec * 1000), 1L, "view", v)
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-twap-late-ckpt").toString
    val q = TwapStream.twap(stream.toDF())
      .writeStream.format("memory").queryName("twap_late_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(Seq(ev(1, 0, 10.0), ev(2, 100, 20.0)))
      q.processAllAvailable()
      stream.addData(Seq(ev(3, 50, 99.0)))  // late: before the carried t=100 reading
      q.processAllAvailable()
      stream.addData(Seq(ev(4, 200, 30.0))) // on-time: closes the t=100 interval
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("twap_late_out")
      .orderBy(col("n_intervals").desc).collect()
    // Final state: intervals [0,100)@10 and [100,200)@20 — the late event
    // contributed nothing (no negative duration, no accumulator corruption).
    val top = rows.head
    assert(top.getAs[Long]("n_intervals") === 2L)
    assert(math.abs(top.getAs[Double]("twap") - 15.0) < 1e-12)
  }

  test("batch fold is row-order insensitive") {
    val events = fixtureEvents(500)
    def run(es: Seq[Ev]) = TwapStream.twap(
      spark.createDataset(es)(Encoders.product[Ev]).toDF()).toDF()
    val a = run(events)
    val b = run(scala.util.Random.javaRandomToRandom(new java.util.Random(17)).shuffle(events))
    assert(a.exceptAll(b).count() === 0)
    assert(a.count() === b.count())
  }

  test("at-least-once replay of the exact frontier row is a no-op (round-8 ADVICE)") {
    import java.sql.Timestamp
    val t0 = 1704067200000L
    def ev(id: Long, offSec: Long, v: Double) =
      Ev(id, new Timestamp(t0 + offSec * 1000), 1L, "view", v)
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-twap-replay-ckpt").toString
    val q = TwapStream.twap(stream.toDF())
      .writeStream.format("memory").queryName("twap_replay_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(Seq(ev(1, 0, 10.0), ev(2, 100, 20.0)))
      q.processAllAvailable()
      // Redeliver the frontier reading (same ts AND same event_id): with a
      // ts-only >= guard this re-closes a zero-length interval and bumps
      // n_intervals; the strict (ts, event_id) frontier must drop it.
      stream.addData(Seq(ev(2, 100, 20.0)))
      q.processAllAvailable()
      stream.addData(Seq(ev(3, 200, 30.0)))
      q.processAllAvailable()
    } finally q.stop()
    val top = spark.table("twap_replay_out")
      .orderBy(col("n_intervals").desc).collect().head
    // Two closed intervals only: [0,100)@10, [100,200)@20 → twap 15.
    assert(top.getAs[Long]("n_intervals") === 2L)
    assert(math.abs(top.getAs[Double]("twap") - 15.0) < 1e-12)
  }
}
