package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("LSH top-k sims agree with brute force on shared pairs and ranks are dense") {
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", col("vec_id") < 3, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", col("vec_id") < 3, 10).collect()
    assert(lsh.nonEmpty)
    // same (query, candidate) pair → bit-identical cosine on both paths
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(bsim => assert(bsim === r.getDouble(2)))
    }
    // ranks are 1..n per query, descending sim
    lsh.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.map(_.getDouble(2)).toSeq.reverse.sorted.reverse ===
        sorted.map(_.getDouble(2)).toSeq)
    }
  }

  test("LSH candidates all share at least one band key with the query") {
    val keys = Similarity.bandRows(
        Similarity.indexed(emb, "vec_id", "embedding"), "vec_id")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(r => (r.getInt(1), r.getLong(2))).toSet }
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", col("vec_id") < 3, 10).collect()
    assert(lsh.nonEmpty)
    lsh.foreach(r =>
      assert(keys(r.getLong(0)).intersect(keys(r.getLong(1))).nonEmpty))
  }

  test("codegen LshBandKey equals the SQL-reproducible HOF fold on every vector") {
    // the reference formulation the DuckDB oracles rebuild: a strict
    // left-fold plane dot + 2^jj per positive sign
    def hofKey(v: org.apache.spark.sql.Column, band: Int, bits: Int) =
      aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, jj) => {
        val j = jj + lit(band * bits)
        val planeDot = aggregate(
          sequence(lit(1), size(v)),
          lit(0.0),
          (s, i) => s + element_at(v, i).cast("double") *
            when(((i * 31 + j * 37) % 97) % 2 === 0, lit(1.0)).otherwise(lit(-1.0)))
        acc + when(planeDot > 0, pow(lit(2.0), jj).cast("long")).otherwise(0L)
      })
    val v = Similarity.toDoubleVec(col("embedding"))
    val mismatches = emb.select(
        Similarity.lshBandKey(v, 0).as("k0"), hofKey(v, 0, Similarity.BandBits).as("h0"),
        Similarity.lshBandKey(v, 1).as("k1"), hofKey(v, 1, Similarity.BandBits).as("h1"))
      .filter(col("k0") =!= col("h0") || col("k1") =!= col("h1"))
      .count()
    assert(mismatches === 0)
  }

  test("near-dup pairs are ordered, thresholded and self-free") {
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.3).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3)
    }
  }

  test("maxmin seeding: k distinct seeds, first is the lowest id, spread monotone") {
    val seeds = Similarity.kmeansPlusPlusCentroids(emb, "vec_id", "embedding", 8)
      .collect().map(_.getLong(0))
    assert(seeds.length === 8)
    assert(seeds.distinct.length === 8, "seeds must be distinct vectors")
    assert(seeds.head === emb.agg(org.apache.spark.sql.functions.min("vec_id"))
      .collect()(0).getLong(0))
    // greedy maxmin: each later seed's min-distance to its predecessors
    // can only shrink or hold (the farthest point is taken first)
    val vecs = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cosDist(a: Array[Double], b: Array[Double]): Double = {
      def d(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (p, q) => p * q }.sum
      1.0 - d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    val spreads = (1 until seeds.length).map { j =>
      (0 until j).map(i => cosDist(vecs(seeds(j)), vecs(seeds(i)))).min
    }
    assert(spreads.zip(spreads.tail).forall { case (a, b) => b <= a + 1e-12 },
      s"maxmin spread must be non-increasing: $spreads")
    GraftCaches.releaseAll()
  }

  test("a degenerate hot bucket is capped, normal buckets still pair") {
    // 150 identical vectors share every band key: an uncapped self-join
    // would emit 150*149/2 = 11175 pairs from ONE bucket (the quadratic
    // hot task at corpus scale). With maxBucket=100 the hot buckets drop
    // entirely, while a 2-member bucket elsewhere still pairs.
    import spark.implicits._
    val hot = (100L until 250L).map(i => (i, Array(1.0f, 2.0f, -1.0f, 0.5f)))
    val dup = Seq(
      (1L, Array(-3.0f, 1.0f, 2.0f, -0.5f)),
      (2L, Array(-3.0f, 1.0f, 2.0f, -0.5f)))
    val corpus = (hot ++ dup).toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(corpus, "vec_id", "embedding",
        threshold = 0.9, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 2L)),
      s"hot-bucket pairs must be capped away, got ${pairs.length} pairs")
    GraftCaches.releaseAll()
  }

  test("PQ codes are bounded, seeds reconstruct exactly, ADC is exact on seeds") {
    val codes = Similarity.pqCodes(emb, "vec_id", "embedding").collect()
    assert(codes.length === 500)
    codes.foreach { r =>
      val cs = r.getSeq[Long](1)
      assert(cs.length === Similarity.PqM)
      assert(cs.forall(c => c >= 0 && c < Similarity.PqK))
      assert(r.getDouble(2) >= 0.0)
    }
    // a codebook seed's own subvectors are in the codebook → zero error
    codes.filter(_.getLong(0) < Similarity.PqK)
      .foreach(r => assert(r.getDouble(2) === 0.0,
        s"seed ${r.getLong(0)} must reconstruct exactly, got ${r.getDouble(2)}"))

    // for a seed vector the PQ reconstruction IS the vector, so the ADC
    // distance to it must equal the micro-rounded exact squared L2
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val adc = Similarity.pqAdcTopK(emb, "vec_id", "embedding", col("vec_id") < 3, 10)
      .collect()
    assert(adc.nonEmpty)
    adc.filter(r => r.getLong(1) < Similarity.PqK).foreach { r =>
      val exact = sq(vecs(r.getLong(0)), vecs(r.getLong(1)))
      // per-subspace micro-rounding: |adc - exact| <= m * 0.5e-6
      assert(math.abs(r.getDouble(2) - exact) <= Similarity.PqM * 0.5e-6,
        s"ADC to seed ${r.getLong(1)} drifted: ${r.getDouble(2)} vs $exact")
    }
  }
}
