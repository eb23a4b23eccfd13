package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Hive-style partitioned parquet layout — the other half of the physical
  * data design next to bucketing (BucketedTablesSpec): a corpus
  * partitioned by a categorical column must answer partition-key filters
  * by PRUNING directories at planning time, never by scanning and
  * filtering. At 100 TB partition pruning is the difference between
  * reading one language's shard and reading the world. */
class PartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("lang-partitioned write + lang filter prunes to one partition directory") {
    val dir = Files.createTempDirectory("graft-part").toString
    val docs = Tables.documents(spark, sfDir)
    docs.write.partitionBy("lang").mode("overwrite").parquet(dir)

    val scan = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = scan.queryExecution.executedPlan.toString

    // The partition-key predicate must appear as a PartitionFilter on the
    // scan (pruned at file-index time), NOT as a data Filter above it.
    assert(plan.contains("PartitionFilters:") && plan.contains("lang"),
      s"expected a lang PartitionFilter on the scan:\n$plan")

    // Pruning really happened: the file index selects only the lang=en
    // directory's files.
    val scanned = scan.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scanned.nonEmpty, "expected a FileSourceScanExec leaf")
    val selected = scanned.head.selectedPartitions
    assert(selected.partitionCount == 1,
      s"expected exactly the lang=en partition, got ${selected.partitionCount}")

    // And row parity with the unpartitioned filter.
    val expect = docs.filter(col("lang") === "en").count()
    assert(scan.count() == expect)
  }

  test("no filter reads all partitions; non-key filters do not prune") {
    val dir = Files.createTempDirectory("graft-part2").toString
    Tables.documents(spark, sfDir).write.partitionBy("lang").mode("overwrite").parquet(dir)
    val all = spark.read.parquet(dir)
    val langs = all.select("lang").distinct().count()
    val scanned = all.filter(col("n_chars") > 0).queryExecution.executedPlan
      .collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    // A predicate on a NON-partition column selects every partition (the
    // pruning contract is key-only) — it must land in PushedFilters instead.
    assert(scanned.head.selectedPartitions.partitionCount == langs)
    assert(scanned.head.toString.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,0)]"),
      s"n_chars predicate should push to parquet:\n${scanned.head}")
  }
}
