package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CmsStream

/** Streaming CMS: cell counters must ADD across micro-batches (the final
  * sketch after two batches equals the batch one-shot over the union —
  * sketch mergeability, online) and the batch fold must be row-order
  * insensitive (counter addition commutes). Counters only grow, so the
  * last per-cell emission equals the per-cell MAX over all emissions. */
final case class Tok(term: String)

class CmsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tokens(n: Int): Seq[Tok] = {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(graft.operators.TextOps.words(col("text"))).as("term"))
      .limit(n).collect().map(r => Tok(r.getString(0))).toSeq
  }

  private def cellsOf(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
    df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("cell counters add across batches and equal the batch one-shot") {
    val toks = tokens(2000)
    val (first, second) = toks.splitAt(1000)
    val stream = MemoryStream[Tok](Encoders.product[Tok], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-cms-ckpt").toString
    val q = CmsStream.sketch(stream.toDF(), "term")
      .writeStream.format("memory").queryName("cms_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
    } finally q.stop()

    import org.apache.spark.sql.functions._
    val streamedFinal = spark.table("cms_out")
      .groupBy("row_j", "bucket").agg(max("cnt").as("cnt"))
    val batch = CmsStream.sketch(
      spark.createDataset(toks)(Encoders.product[Tok]).toDF(), "term").toDF()
    assert(cellsOf(streamedFinal) === cellsOf(batch))
    assert(batch.count() > 0)
    // Total mass conservation: every token occurrence lands in exactly
    // d cells, so Σcnt = d × n_tokens.
    val mass = batch.agg(sum("cnt")).collect()(0).getLong(0)
    assert(mass === graft.operators.Sketches.CmsDepth.toLong * toks.size)
  }

  test("batch fold is row-order insensitive") {
    val toks = tokens(1500)
    def run(ts: Seq[Tok]) = cellsOf(CmsStream.sketch(
      spark.createDataset(ts)(Encoders.product[Tok]).toDF(), "term").toDF())
    val a = run(toks)
    val b = run(scala.util.Random.javaRandomToRandom(new java.util.Random(19)).shuffle(toks))
    assert(a === b)
    assert(a.nonEmpty)
  }
}
