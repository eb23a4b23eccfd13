package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrderCode

/** The Z-order layout claim at the actual FILE level: a compaction
  * rewrite that range-partitions on the Morton code and sorts within
  * partitions produces parquet files whose per-file min/max ranges are
  * narrow on BOTH dimensions — the statistics a scan prunes on — while a
  * single-column rewrite leaves the other dimension at full width in
  * every file (zero pruning for its filters). This is the maintenance
  * job (OPTIMIZE ... ZORDER BY) a 100-TB lake table runs; here the
  * write path, the file statistics, and the comparison are all real. */
class ZOrderLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("z-order compaction keeps per-file ranges narrow on both keys") {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"))
    val full = li.agg(max("pk").as("mpk"), max("sk").as("msk")).head()
    val (pkRange, skRange) = (full.getLong(0).toDouble, full.getLong(1).toDouble)

    def avgSpans(dir: String): (Double, Double) = {
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max("pk") - min("pk")).cast("double").as("pks"),
          (max("sk") - min("sk")).cast("double").as("sks"))
        .agg(avg("pks"), avg("sks")).head()
      (perFile.getDouble(0), perFile.getDouble(1))
    }

    // Range-normalize each dimension to 8 bits BEFORE interleaving (what
    // production Z-ORDER does): with raw keys of unequal magnitude (pk
    // ~200, sk ~10 here) the split prefix would land entirely on the
    // wider key's high bits and the narrow key would never cluster.
    val npk = floor(col("pk") * 256 / (lit(full.getLong(0)) + 1)).cast("long")
    val nsk = floor(col("sk") * 256 / (lit(full.getLong(1)) + 1)).cast("long")

    val zDir = Files.createTempDirectory("zorder_files").toString
    li.withColumn("z", ZOrderCode.z(npk, nsk))
      .repartitionByRange(16, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(zDir)

    val linDir = Files.createTempDirectory("linear_files").toString
    li.repartitionByRange(16, col("pk"))
      .sortWithinPartitions("pk")
      .write.mode("overwrite").parquet(linDir)

    val (zPk, zSk) = avgSpans(zDir)
    val (lPk, lSk) = avgSpans(linDir)
    // z-order: BOTH dims bounded well under full width per file
    assert(zPk < 0.6 * pkRange, s"z files' pk span $zPk vs range $pkRange")
    assert(zSk < 0.6 * skRange, s"z files' sk span $zSk vs range $skRange")
    // single-column sort: its own key is tight, the other is useless
    assert(lPk < 0.3 * pkRange)
    assert(lSk > 0.9 * skRange,
      s"pk-sorted files should leave sk wide (no pruning), got $lSk of $skRange")
  }
}
