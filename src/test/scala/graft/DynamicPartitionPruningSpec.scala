package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Dynamic partition pruning (DPP) — the RUNTIME half of partition
  * design, next to PartitionPruneSpec's static pruning: when the
  * partition-key predicate only materializes through a join (filter on
  * a dimension, not on the fact), Catalyst must push a dynamic
  * subquery filter into the fact scan's partition index so only the
  * joined keys' directories are read. At 100 TB this is what makes
  * star-schema queries touch one region's shard instead of the world
  * when the filter lives on the region dimension. */
class DynamicPartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("a dimension filter prunes fact partitions through the join at runtime") {
    // Plain (non-AQE) plan for this one query so the fact
    // FileSourceScanExec is directly reachable for metric assertions —
    // DPP itself is independent of AQE.
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try dppBody()
    finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  private def dppBody(): Unit = {
    val dir = Files.createTempDirectory("graft-dpp").toString
    // Fact partitioned by customer nation (denormalized partition key —
    // the usual layout for nation-sliced marts).
    val fact = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("c_nationkey").as("nat"))
    fact.write.partitionBy("nat").mode("overwrite").parquet(dir)

    // DPP needs a joinable dim with a selective non-key filter. Exchange
    // reuse requires the dim to be worth broadcasting — nation is.
    val dim = Tables.nation(spark, sfDir)
      .filter(col("n_name").isin("NATION_3", "NATION_7"))
    val q = spark.read.parquet(dir)
      .join(dim, col("nat") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n_orders"))

    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected a dynamic pruning subquery on the fact scan:\n$plan")

    // Execute, then check the scan really touched only the 2 joined
    // partitions (post-execution: DPP resolves at runtime).
    val rows = q.collect()
    val scans = q.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    // Column pruning may strip every fact column but the partition key
    // from the scan output — identify the fact scan by that key.
    val factScan = scans.find(_.output.exists(_.name == "nat"))
    assert(factScan.nonEmpty, "expected the fact FileSourceScanExec")
    val pruned = factScan.get.metrics.get("numPartitions").map(_.value)
    assert(pruned.contains(2L), s"expected 2 partitions read after DPP, got $pruned")

    // Row parity with the unpartitioned equivalent.
    val expect = fact.join(dim, col("nat") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n_orders")).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toMap ===
      expect.map(r => (r.getString(0), r.getLong(1))).toMap)
  }
}
