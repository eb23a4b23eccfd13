package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupQueries, SimilarityQueries}

/** The operators persist working-set relations (LSH bands, shingle sets,
  * ANN index) through [[GraftCaches]]; a long-lived session running query
  * after query must be able to return to its pre-query storage footprint.
  * Round-2 VERDICT item: back-to-back dedup queries must show no
  * storage-memory growth once the caller releases. */
class CacheLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("operator caches are tracked and releaseAll returns storage to baseline") {
    GraftCaches.releaseAll()
    val before = GraftCaches.persistentRddIds(spark)

    // Two query families back to back, each consumed by a real action.
    assert(DedupQueries.queries("dedup_minhash_pairs")(spark, dir).count() >= 0)
    assert(DedupQueries.queries("dedup_ngram_jaccard")(spark, dir).count() >= 0)
    assert(SimilarityQueries.queries("embed_neardup_pairs")(spark, dir).count() >= 0)
    assert(GraftCaches.trackedCount > 0, "operators should have tracked caches")

    GraftCaches.releaseAll()
    assert(GraftCaches.trackedCount === 0)
    val after = GraftCaches.persistentRddIds(spark)
    assert(after.subsetOf(before),
      s"persistent RDDs grew: ${after -- before} remain after releaseAll")
  }

  test("PrefixScan pin checkpoint blocks are freed by releaseAll (round-8 VERDICT 2)") {
    // pin() localCheckpoints the range-partitioned input of every scan;
    // before round 9 those blocks persisted until the frame was GC'd, so
    // a long-lived session accumulated executor storage query after
    // query. releaseAll must now unpersist them explicitly.
    GraftCaches.releaseAll()
    val before = GraftCaches.persistentRddIds(spark)
    Seq("exact_quantiles", "weighted_median_by_group", "abc_classification").foreach { q =>
      assert(SparkEntry.queries(q)(spark, dir).count() > 0, q)
    }
    assert(GraftCaches.persistentRddIds(spark).size > before.size,
      "PrefixScan queries should have pinned checkpoint blocks while running")
    GraftCaches.releaseAll()
    val after = GraftCaches.persistentRddIds(spark)
    assert(after.subsetOf(before),
      s"pinned checkpoint RDDs leaked past releaseAll: ${after -- before}")
  }

  test("bm25_search and retrieve_rerank track no caches (round-6 VERDICT 6/7)") {
    // bm25's token relation is single-consumer since the dl agg moved to a
    // size()-at-scan projection, so neither the lexical stage nor the
    // two-stage rerank pipeline should persist anything: plan construction
    // must leave the registry exactly as it found it.
    GraftCaches.releaseAll()
    graft.queries.TextQueries.bm25Search(spark, dir)
    assert(GraftCaches.trackedCount === 0,
      "bm25_search tracked a cache; its token relation is single-use")
    SimilarityQueries.retrieveRerank(spark, dir)
    assert(GraftCaches.trackedCount === 0,
      "retrieve_rerank tracked a cache; candidates are already bounded")
  }
}
