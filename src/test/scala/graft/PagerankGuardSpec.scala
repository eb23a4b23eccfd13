package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphQueries

/** The int64 overflow bound of the integer-exact PageRank
  * (85 · N · R0 < 2^63, GraphQueries scaladoc) must be ENFORCED, not
  * just documented (round-9 VERDICT 5): feeding a graph past the bound
  * must raise the documented remedy, never wrap silently. */
class PagerankGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Mirrored star graph: hub 0 ↔ spokes 1..n (n+1 nodes total). */
  private def star(n: Long) = {
    val spokes = spark.range(1L, n + 1L).select(col("id"))
    spokes.select(lit(0L).as("src"), col("id").as("dst"))
      .unionByName(spokes.select(col("id").as("src"), lit(0L).as("dst")))
  }

  test("a graph past the int64-safe node bound fails loudly with the remedy") {
    val over = GraphQueries.MaxNodesAtScale + 10L
    val ex = intercept[IllegalArgumentException] {
      GraphQueries.pagerankIterate(star(over - 1L)).count()
    }
    assert(ex.getMessage.contains("int64-safe bound"))
    assert(ex.getMessage.contains("DECIMAL(38,0)"))
    GraftCaches.releaseAll()
  }

  test("a graph inside the bound iterates (guard does not over-fire)") {
    // tiny 4-node cycle-ish graph: mass conservation sanity on the result
    val got = GraphQueries.pagerankIterate(star(3L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    GraftCaches.releaseAll()
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    // the hub receives all three spokes' contributions; spokes tie
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(0L) > got(1L))
  }
}
