package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join complements the manual rewrite in operators/SkewJoin:
  * SkewJoin.saltedJoin is the explicit, oracle-checked mitigation; AQE's
  * OptimizeSkewedJoin is the runtime one (split an oversized shuffle
  * partition into sub-reads of the same map outputs). This spec pins that
  * the engine's session config actually triggers it on a synthetic hot
  * key, so a plan regression (AQE off, thresholds wrong, join degrading
  * to broadcast) fails here instead of at scale. */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits a skewed shuffle partition (skew=true in the final plan)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // One hot key carrying ~10 MB vs a long tail of tiny keys.
      val pad = "x" * 100
      val left = spark.range(0, 100000).select(lit(0L).as("k"), concat(lit(pad), $"id".cast("string")).as("v"))
        .union(spark.range(0, 5000).select(($"id" % 50 + 1).as("k"), lit(pad).as("v")))
      val right = spark.range(0, 51).select($"id".as("k"), lit(1L).as("w"))
      // collect() (not count()) so THIS dataset's own queryExecution runs
      // and the adaptive plan finalizes — count() plans a separate query.
      val joined = left.join(right, "k")
      assert(joined.collect().length === 105000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split SortMergeJoin in the final adaptive plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
