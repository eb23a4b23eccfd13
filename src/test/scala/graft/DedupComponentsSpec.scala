package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("min-label propagation resolves chains and keeps clusters apart") {
    import spark.implicits._
    // cluster 1: 1-2-3-4 chain (diameter 3); cluster 2: 10-11; singleton
    // edges only — nodes without edges don't appear (nothing to dedup)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.duplicateComponents(edges, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (10L, 10L, true), (11L, 10L, false)))
    GraftCaches.releaseAll()
  }

  test("iteration bound is honored: a long chain needs enough rounds") {
    import spark.implicits._
    val chain = (1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    // 1 round: node 6 only sees neighbor 5 -> label 5
    val one = Dedup.duplicateComponents(chain, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(6L) === 5L)
    // after j rounds a node's label is the min over nodes within j hops:
    // the 5-hop chain resolves in 5 rounds
    val enough = Dedup.duplicateComponents(chain, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(enough.values.toSet === Set(1L))
    GraftCaches.releaseAll()
  }

  test("converged variant resolves a chain deeper than the fixed 3 rounds") {
    import spark.implicits._
    // path graph 1-2-...-8: diameter 7 > 3, so the fixed-3 operator
    // MUST mislabel the tail (documented trade-off) while the
    // iterate-until-stable variant resolves the whole component.
    val chain = (1L to 8L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    val fixed = Dedup.duplicateComponents(chain, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed(8L) !== 1L, "fixed-3 should split a diameter-7 chain")
    val conv = Dedup.duplicateComponentsConverged(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(conv === (1L to 8L).map(i => (i, 1L, i == 1L)).toSet)
    GraftCaches.releaseAll()
  }

  test("converged variant honors the hard cap") {
    import spark.implicits._
    val chain = (1L to 8L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    // maxIters=2 behaves exactly like the fixed 2-round operator
    val capped = Dedup.duplicateComponentsConverged(chain, maxIters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed2 = Dedup.duplicateComponents(chain, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped === fixed2)
    GraftCaches.releaseAll()
  }
}
