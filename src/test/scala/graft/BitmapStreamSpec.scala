package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BitmapStream

/** Streaming exact-distinct bitmap: counts must be idempotent under
  * replay (OR of the same bit is a no-op) and monotone across batches —
  * the latest emission per key equals the batch one-shot, which equals
  * the relational COUNT(DISTINCT). */
class BitmapStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixtureEvents(n: Int): Seq[Ev] = {
    val raw = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(n).collect()
    raw.map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
  }

  test("replay-idempotent across batches; final counts equal COUNT(DISTINCT)") {
    val events = fixtureEvents(600)
    val (first, second) = events.splitAt(300)
    val replayed = second ++ first.take(100) // batch 2 replays 100 batch-1 rows
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-bitmap-ckpt").toString
    val q = BitmapStream.distinctUsers(stream.toDF())
      .writeStream.format("memory").queryName("bitmap_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(replayed)
      q.processAllAvailable()
    } finally q.stop()

    // Counts only grow; the max emission per key is the final state.
    val streamed = spark.table("bitmap_out")
      .groupBy("event_type").agg(max("n_distinct").as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = spark.createDataset(events)(Encoders.product[Ev])
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === expected)
    assert(expected.nonEmpty)
  }

  test("batch fold is row-order insensitive") {
    val events = fixtureEvents(400)
    def run(es: Seq[Ev]) = BitmapStream.distinctUsers(
        spark.createDataset(es)(Encoders.product[Ev]).toDF())
      .toDF().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = run(events)
    val b = run(scala.util.Random.javaRandomToRandom(new java.util.Random(3)).shuffle(events))
    assert(a === b)
  }

  test("an id outside the dense domain fails loudly instead of corrupting state") {
    import java.sql.Timestamp
    // Bitmap state is linear in max(uid): a negative id would index
    // negative, and a 2^36-ish id would attempt a multi-GB allocation.
    // Both must be a clear error, not a crash deep in the array code.
    for (bad <- Seq(-1L, BitmapStream.MaxId, 1L << 40)) {
      val events = Seq(Ev(1L, new Timestamp(0L), bad, "view", 1.0))
      val ex = intercept[Exception] {
        BitmapStream.distinctUsers(
          spark.createDataset(events)(Encoders.product[Ev]).toDF()).toDF().collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("dense domain")),
        s"uid=$bad should fail the domain check, got: ${ex.getMessage}")
    }
  }
}
