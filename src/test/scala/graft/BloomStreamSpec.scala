package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BloomStream

final case class Fp(h: Long)

/** Streaming Bloom: registers must OR-merge across micro-batches and be
  * idempotent under replay (batch 2 re-sends batch-1 fingerprints; the
  * final registers equal the batch one-shot over the distinct union),
  * and the fold must be row-order insensitive (bitwise OR commutes). */
class BloomStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fingerprints(n: Int): Seq[Fp] = {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(graft.functions.PolyHash.hash(col("text")).as("h"))
      .limit(n).collect().map(r => Fp(r.getLong(0))).toSeq
  }

  private def regsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("registers OR-merge across batches; replays are idempotent") {
    val fps = fingerprints(200)
    val (first, second) = fps.splitAt(100)
    val replayed = second ++ first.take(40) // batch 2 replays 40 batch-1 rows
    val stream = MemoryStream[Fp](Encoders.product[Fp], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-bloom-ckpt").toString
    val q = BloomStream.sketch(stream.toDF(), "h")
      .writeStream.format("memory").queryName("bloom_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(replayed)
      q.processAllAvailable()
    } finally q.stop()

    import org.apache.spark.sql.functions._
    // Registers only gain bits; the last emission per reg is the widest —
    // and bit_or over all emissions equals it.
    val streamedFinal = spark.table("bloom_out")
      .groupBy("reg").agg(expr("bit_or(bits)").as("bits"))
    val batch = BloomStream.sketch(
      spark.createDataset(fps)(Encoders.product[Fp]).toDF(), "h").toDF()
    assert(regsOf(streamedFinal) === regsOf(batch))
    assert(batch.count() > 0)
  }

  test("batch fold is row-order insensitive") {
    val fps = fingerprints(150)
    def run(xs: Seq[Fp]) = regsOf(BloomStream.sketch(
      spark.createDataset(xs)(Encoders.product[Fp]).toDF(), "h").toDF())
    val a = run(fps)
    val b = run(scala.util.Random.javaRandomToRandom(new java.util.Random(23)).shuffle(fps))
    assert(a === b)
    assert(a.nonEmpty)
  }
}
