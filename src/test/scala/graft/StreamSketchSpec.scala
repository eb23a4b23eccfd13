package graft

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** The sketch-merge contract under streaming ingest: a CMS accumulated
  * micro-batch by micro-batch through `foreachBatch` (cell-wise SUM into a
  * running sketch — the day-over-day corpus-stats job) must equal the
  * sketch built from the whole corpus in one batch. This is exactly the
  * mergeability property that lets 100-TB pipelines keep ONE tiny
  * relation as the source of truth for term frequencies while data
  * arrives incrementally — no re-scan of history, ever. */
class StreamSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("foreachBatch-accumulated CMS equals the one-shot batch CMS") {
    implicit val sq = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(300)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    def tokens(df: DataFrame): DataFrame =
      df.select(explode(graft.operators.TextOps.words(col("text"))).as("term"))

    // running sketch state: (row_j, bucket) -> cnt, merged per epoch
    val acc = scala.collection.mutable.Map.empty[(Int, Long), Long]
    val stream = MemoryStream[(Long, String)](
      Encoders.product[(Long, String)], spark.sqlContext)
    // three micro-batches of 100 docs
    docs.grouped(100).foreach(stream.addData(_))
    val q = stream.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sketches.cmsSketch(tokens(batch), "term").collect().foreach { r =>
          val k = (r.getInt(0), r.getLong(1))
          acc(k) = acc.getOrElse(k, 0L) + r.getLong(2)
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val sess = spark
    import sess.implicits._
    val whole = Sketches.cmsSketch(tokens(docs.toDF("doc_id", "text")), "term")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(acc.toMap === whole,
      "micro-batch-merged sketch must equal the one-shot sketch")
  }
}
