package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DeltaCompressStream

/** Streaming delta compression: the per-user (value, ts) ValueState must
  * carry across micro-batches (a batch-2 event that barely moved against
  * the user's LAST batch-1 event is dropped — the rule applies over the
  * batch boundary, not per batch), and the batch one-shot run must be
  * row-order insensitive (the processor re-sorts each user's batch rows
  * into the relational window order). Events are synthetic so every rule
  * branch (first / value-jump / silence-gap / drop) provably fires. */
class DeltaCompressStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val t0 = 1700000000000L // fixed epoch millis
  private def ev(id: Long, user: Long, minutes: Long, v: Double): Ev =
    Ev(id, new Timestamp(t0 + minutes * 60000L), user, "sensor", v)

  // user 1: keep(first) drop(+0.5) keep(+2.0) keep(gap 20m despite +0.1)
  // user 2: keep(first) drop(+1.0 exactly — strict >) keep(-3.0)
  private val batch1 = Seq(
    ev(10, 1, 0, 10.0), ev(11, 1, 1, 10.5), ev(12, 1, 2, 12.5), ev(13, 1, 22, 12.6),
    ev(20, 2, 0, 5.0), ev(21, 2, 3, 6.0), ev(22, 2, 6, 3.0))
  // batch 2 continues both users: user 1 +0.2 within 10m of ev13 → DROP
  // (state crossed the boundary); user 2 after a 15m silence → KEEP.
  private val batch2 = Seq(
    ev(14, 1, 25, 12.8), ev(23, 2, 21, 3.1))
  private val keptIds = Set(10L, 12L, 13L, 20L, 22L, 23L)

  private def idsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  test("keep-on-change state carries across micro-batches and equals the batch run") {
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-delta-ckpt").toString
    val q = DeltaCompressStream.kept(stream.toDF())
      .writeStream.format("memory").queryName("delta_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(batch1)
      q.processAllAvailable()
      stream.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("delta_out")
    assert(idsOf(streamed) === keptIds)
    val batch = DeltaCompressStream.kept(
      spark.createDataset(batch1 ++ batch2)(Encoders.product[Ev]).toDF()).toDF()
    assert(idsOf(batch) === keptIds)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("batch fold is row-order insensitive") {
    val events = batch1 ++ batch2
    def run(es: Seq[Ev]) = DeltaCompressStream.kept(
      spark.createDataset(es)(Encoders.product[Ev]).toDF()).toDF()
    val a = run(events)
    val b = run(scala.util.Random.javaRandomToRandom(new java.util.Random(13)).shuffle(events))
    assert(idsOf(a) === keptIds)
    assert(a.exceptAll(b).count() === 0)
    assert(a.count() === b.count())
  }
}
