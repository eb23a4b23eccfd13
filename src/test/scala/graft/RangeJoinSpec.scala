package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** RangeJoin.timeRangeJoin must equal the naive |Δt| <= r join exactly:
  * the bucket trick (left in one bucket, right expanded to ±1 neighbor)
  * is a pure candidate-generation rewrite — every true pair found once,
  * no false pairs survive the exact predicate, radius boundary inclusive.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("bucketed range join equals brute force, boundary inclusive, no dup pairs") {
    val sess = spark
    import sess.implicits._
    val radiusUs = 100L * 1000000L // 100 s
    // Timestamps straddling bucket edges: 0, 99, 100, 101, 199, 200, 350
    // seconds; two keys; one row in a far bucket to prove key isolation.
    val rows = Seq(
      (1L, "a", ts(0)), (2L, "a", ts(99)), (3L, "a", ts(100)),
      (4L, "a", ts(101)), (5L, "a", ts(199)), (6L, "a", ts(200)),
      (7L, "a", ts(350)), (8L, "b", ts(100)), (9L, "b", ts(100000)))
    val df = rows.toDF("id", "k", "t")
    val l = df.select($"id", $"k", $"t")
    val r = df.select($"id".as("id2"), $"k".as("k2"), $"t".as("t2"))

    val got = RangeJoin.timeRangeJoin(l, r, $"k", $"k2", $"t", $"t2", radiusUs)
      .filter($"id" < $"id2")
      .select($"id", $"id2", $"delta_us")
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSet

    val want = (for {
      (i, ki, ti) <- rows; (j, kj, tj) <- rows
      if i < j && ki == kj && math.abs(ti.getTime - tj.getTime) * 1000L <= radiusUs
    } yield (i, j, (ti.getTime - tj.getTime) * 1000L)).toSet

    assert(got === want)
    // Boundary: (3,103) pairs at exactly radius (0 vs 100 s) must be present.
    assert(want.contains((1L, 3L, -radiusUs)))
    // Multiplicity: no pair may be emitted twice by the ±1 bucket expansion.
    val all = RangeJoin.timeRangeJoin(l, r, $"k", $"k2", $"t", $"t2", radiusUs)
      .groupBy($"id", $"id2").count().filter($"count" > 1).count()
    assert(all === 0L)
  }
}
