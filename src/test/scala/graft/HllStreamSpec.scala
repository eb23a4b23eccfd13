package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HllStream

/** Streaming HLL: registers must MAX-merge across micro-batches (the
  * final per-key estimate after two batches equals the batch one-shot
  * over the union — sketch mergeability, online), duplicate replays must
  * not move the estimate (idempotence), and the estimate must be
  * row-order insensitive by construction. */
class HllStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixtureEvents(n: Int): Seq[Ev] = {
    val raw = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(n).collect()
    raw.map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
  }

  private def finalRows(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Double)] =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("registers max-merge across batches; replays are idempotent") {
    val events = fixtureEvents(400)
    val (first, second) = events.splitAt(200)
    val replayed = second ++ first.take(80) // batch 2 replays 80 batch-1 rows
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-hll-ckpt").toString
    val q = HllStream.distinctUsers(stream.toDF())
      .writeStream.format("memory").queryName("hll_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(replayed)
      q.processAllAvailable()
    } finally q.stop()

    // Update mode re-emits per batch: the LAST emission per key is the
    // live estimate. Batch 2 is the last batch for every key it touches.
    val streamed = spark.table("hll_out")
    import org.apache.spark.sql.functions._
    val last = streamed.withColumn("rn", monotonically_increasing_id())
      .groupBy("event_type")
      .agg(max(struct(col("rn"), col("n_used"), col("estimate"))).as("s"))
      .select(col("event_type"), col("s.n_used").as("n_used"), col("s.estimate").as("estimate"))
    val batch = HllStream.distinctUsers(
      spark.createDataset(events)(Encoders.product[Ev]).toDF()).toDF()
    assert(finalRows(last) === finalRows(batch))
    assert(batch.count() > 0)
  }

  test("batch fold is row-order insensitive") {
    val events = fixtureEvents(300)
    def run(es: Seq[Ev]) = finalRows(HllStream.distinctUsers(
      spark.createDataset(es)(Encoders.product[Ev]).toDF()).toDF())
    val a = run(events)
    val b = run(scala.util.Random.javaRandomToRandom(new java.util.Random(17)).shuffle(events))
    assert(a === b)
    assert(a.nonEmpty)
  }
}
