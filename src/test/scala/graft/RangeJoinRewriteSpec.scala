package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{GraftExtensions, RangeJoinRewrite}

/** The RangeJoinRewrite optimizer rule must (a) fire on `abs(x-y) <= r`
  * join predicates, turning the nested-loop plan into an equi-join on
  * time buckets, and (b) leave results bit-identical to the naive plan.
  */
class RangeJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withRule[A](body: => A): A = {
    val prior = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prior :+ RangeJoinRewrite
    try body finally spark.experimental.extraOptimizations = prior
  }

  private def frames(): (DataFrame, DataFrame) = {
    val sess = spark
    import sess.implicits._
    // Long "micros" values straddling bucket edges of radius 100,
    // including negatives (truncating div regime differs there).
    val l = Seq((1L, 0L), (2L, 99L), (3L, 100L), (4L, 250L), (5L, -120L))
      .toDF("lid", "lt")
    val r = Seq((11L, -100L), (12L, 50L), (13L, 199L), (14L, 301L), (15L, -21L))
      .toDF("rid", "rt")
    (l, r)
  }

  private def expected(radius: Long): Set[(Long, Long)] = {
    val ls = Seq((1L, 0L), (2L, 99L), (3L, 100L), (4L, 250L), (5L, -120L))
    val rs = Seq((11L, -100L), (12L, 50L), (13L, 199L), (14L, 301L), (15L, -21L))
    (for {
      (li, lt) <- ls; (ri, rt) <- rs if math.abs(lt - rt) <= radius
    } yield (li, ri)).toSet
  }

  test("keyless abs-range join rewrites to an equi-join via session extensions") {
    // TestSpark runs with GraftExtensions active (production wiring), so
    // the rule fires with no per-query registration: the naive plan for
    // this predicate would be a BroadcastNestedLoopJoin.
    val (l, r) = frames()
    val q = l.join(r, abs(col("lt") - col("rt")) <= lit(100L))
      .select("lid", "rid")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"rule did not rewrite to an equi-join:\n$plan")
    assert(plan.contains("_graft_bucket"), s"bucket column missing:\n$plan")
    val got = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === expected(100L))
  }

  test("rule is a fixpoint: double registration neither loops nor duplicates") {
    // extraOptimizations ADDS a second copy of the rule on top of the
    // extensions copy — the _graft_bucket marker must keep the second
    // application a no-op (rows would duplicate if the right side
    // exploded twice).
    val (l, r) = frames()
    withRule {
      val q = l.join(r, abs(col("lt") - col("rt")) <= lit(100L))
        .select("lid", "rid")
      val got = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      assert(got.size === got.toSet.size, "double rewrite duplicated rows")
      assert(got.toSet === expected(100L))
    }
  }

  test("keyed range join keeps equi keys and stays correct under the rule") {
    val sess = spark
    import sess.implicits._
    val l = Seq((1L, "a", 0L), (2L, "a", 99L), (3L, "b", 100L)).toDF("lid", "k", "lt")
    val r = Seq((11L, "a", 50L), (12L, "b", 199L), (13L, "b", 201L)).toDF("rid", "k2", "rt")
    def q() = l.join(r, col("k") === col("k2") &&
      abs(col("lt") - col("rt")) <= lit(100L)).select("lid", "rid")
    val got = q().collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 11L), (2L, 11L), (3L, 12L)))
  }

  test("GraftExtensions registers the rule without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // buildOptimizerRules is internal; constructing + applying w/o throw
    // is the contract here, end-to-end wiring is the extraOptimizations
    // path above (same Rule object).
  }
}
