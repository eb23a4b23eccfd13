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

  test("Bloom filter has NO false negatives and merges by bitwise OR") {
    val hs = GraftCaches.track(
      spark.range(2000).select((col("id") * 7919L % 1000000007L).as("h")))
    val sketch = Sketches.bloomSketch(hs, "h")
    // Every inserted element must probe positive.
    val misses = Sketches.bloomProbe(sketch, hs, "h")
      .filter(!col("bloom_pos")).count()
    assert(misses === 0L, "Bloom filters never have false negatives")
    // Shard filters OR together into exactly the whole filter.
    val whole = sketch.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shardA = Sketches.bloomSketch(hs.filter(col("h") % 2 === 0), "h")
    val shardB = Sketches.bloomSketch(hs.filter(col("h") % 2 === 1), "h")
    val merged = shardA.unionByName(shardB)
      .groupBy("reg").agg(expr("bit_or(bits)").as("bits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === whole)
    GraftCaches.releaseAll()
  }

  test("Bloom false-positive rate stays near the analytic bound") {
    // n=2000 inserted into m=65536 bits with k=3:
    // p = (1 - exp(-kn/m))^3 ~ 0.00066. Disjoint probes should land
    // within a loose factor of it (exactness is the oracle's job;
    // this pins the sketch isn't degenerate).
    val ins = spark.range(2000).select((col("id") * 7919L % 1000000007L).as("h"))
    val sketch = Sketches.bloomSketch(ins, "h")
    val probes = spark.range(2000, 42000)
      .select((col("id") * 7919L % 1000000007L).as("h"))
    val fp = Sketches.bloomProbe(sketch, probes, "h")
      .filter(col("bloom_pos")).count()
    assert(fp < 400, s"FPR wildly above the analytic bound: $fp/40000")
  }
}
