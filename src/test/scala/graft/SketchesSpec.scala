package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sketches, TextOps}
import graft.sources.Tables

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tokens = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(explode(TextOps.words(col("text"))).as("term"))

  test("CMS estimates are one-sided: est >= exact for EVERY term") {
    val toks = GraftCaches.track(tokens)
    val exact = toks.groupBy("term").agg(count(lit(1)).as("exact"))
    val est = Sketches.cmsEstimates(Sketches.cmsSketch(toks, "term"),
      exact.select("term"), "term")
    val joined = est.join(exact, "term").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"CMS must never underestimate: term=${r.getString(0)} est=${r.getLong(1)} exact=${r.getLong(2)}")
    }
    GraftCaches.releaseAll()
  }

  test("CMS sketches merge by cell-wise sum: shard sketches == whole sketch") {
    val all = GraftCaches.track(tokens.withColumn("h", abs(hash(col("term")))))
    val whole = Sketches.cmsSketch(all, "term")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val shardA = Sketches.cmsSketch(all.filter(col("h") % 2 === 0), "term")
    val shardB = Sketches.cmsSketch(all.filter(col("h") % 2 === 1), "term")
    val merged = shardA.unionByName(shardB)
      .groupBy("row_j", "bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === whole)
    GraftCaches.releaseAll()
  }

  test("sketch relation never exceeds d*w cells and counts total the stream") {
    val toks = GraftCaches.track(tokens)
    val n = toks.count()
    val sk = Sketches.cmsSketch(toks, "term").collect()
    assert(sk.length <= Sketches.CmsDepth * Sketches.CmsWidth)
    // every row of the sketch sums to the full stream length
    (0 until Sketches.CmsDepth).foreach { j =>
      assert(sk.filter(_.getInt(0) == j).map(_.getLong(2)).sum === n)
    }
    GraftCaches.releaseAll()
  }
}
