package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BucketedJoinStrategy

/** The planner-strategy surface: with GraftExtensions active, a
  * `_graft_bucket` equi-join (the shape both RangeJoinRewrite and
  * RangeJoin.timeRangeJoin produce) must plan as the custom
  * BucketedRangeJoinExec — not SortMergeJoin — and produce exactly the
  * rows the default planning produces. */
class BucketedRangeJoinExecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rangeJoin() =
    graft.queries.Relational.rangeJoin(spark, dir)

  /** Stats at test SFs fit the broadcast threshold, where the strategy
    * correctly defers to BHJ — disable broadcast to reproduce the
    * large-large shape the exec exists for (at 100 TB nothing fits). */
  private def noBroadcast[A](body: => A): A = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("range_join plans through BucketedRangeJoin when no side broadcasts") {
    noBroadcast {
      val plan = rangeJoin().queryExecution.executedPlan.toString
      assert(plan.contains("BucketedRangeJoin"),
        s"custom strategy node missing from executed plan:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"bucketed join should not fall back to SMJ:\n$plan")
    }
  }

  test("strategy defers to BroadcastHashJoin when a side fits the threshold") {
    val plan = rangeJoin().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("BucketedRangeJoin"),
      s"small-side joins should keep the zero-shuffle broadcast plan:\n$plan")
  }

  test("custom exec rows are identical to default SMJ planning") {
    noBroadcast {
      def rows() = rangeJoin().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val custom = rows()
      spark.conf.set(BucketedJoinStrategy.EnabledKey, "false")
      try {
        val plan = rangeJoin().queryExecution.executedPlan.toString
        assert(!plan.contains("BucketedRangeJoin"),
          s"kill switch must restore default planning:\n$plan")
        val default = rows()
        assert(custom.nonEmpty && custom === default)
      } finally spark.conf.unset(BucketedJoinStrategy.EnabledKey)
    }
  }

  test("null join keys never match (SQL equi-join semantics)") {
    import spark.implicits._
    noBroadcast {
      val l = Seq((java.lang.Long.valueOf(1L), 10L), (null.asInstanceOf[java.lang.Long], 20L))
        .toDF("k", "x")
        .withColumn("_graft_bucket", col("x") * 0)
      val r = Seq((java.lang.Long.valueOf(1L), 11L), (null.asInstanceOf[java.lang.Long], 21L))
        .toDF("k2", "y")
        .withColumn("_graft_bucket", col("y") * 0)
      val j = l.join(r, l("k") === r("k2") && l("_graft_bucket") === r("_graft_bucket"))
      assert(j.queryExecution.executedPlan.toString.contains("BucketedRangeJoin"))
      assert(j.select("x", "y").collect().map(rw => (rw.getLong(0), rw.getLong(1))).toSet
        === Set((10L, 11L)))
    }
  }
}
