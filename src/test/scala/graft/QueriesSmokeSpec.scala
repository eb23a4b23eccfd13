package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke over the shared sf0.001 fixtures: every declared query runs and
  * yields a sane shape. Value-level parity is the driver's DuckDB diff
  * (tools/diff.py locally); this guards compilation/runtime regressions. */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** pair-producing queries may legitimately be empty at tiny scale */
  private val mayBeEmpty = Set("dedup_ngram_jaccard", "embed_neardup_pairs", "dedup_minhash_pairs")

  test("entry returns rows") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query is oracle-backed") {
    // The engine's standing invariant since round 7: NO oracle-less
    // queries — a new query without DuckDB SQL fails here loudly
    // instead of silently downgrading to the driver's rows-only check.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without an oracle: ${missing.toSeq.sorted}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      // release per query, like Verify/Bench: leaked tracked caches from
      // 160+ queries otherwise accumulate across THIS suite and change
      // sibling suites' plan shapes (InMemoryRelation variants plan extra
      // exchanges — an order-dependent ShuffleBudgetSpec flake).
      try {
        val df = fn(spark, dir)
        assert(df.columns.nonEmpty)
        val n = df.count()
        if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      } finally GraftCaches.releaseAll()
    }
  }
}
