package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table write path — the co-located-join story for 100 TB.
  *
  * A fact-fact join (orders ⋈ lineitem on orderkey) shuffles BOTH sides
  * on every run. Writing each side `bucketBy(n, key).sortBy(key)` once
  * pre-shuffles the data on disk: every later join on the bucket key
  * plans as a SortMergeJoin with ZERO Exchange — each task zips bucket i
  * of both tables locally. One shuffle amortized over every downstream
  * query; at 100 TB this is the difference between re-shuffling ~TBs per
  * query and none.
  *
  * Bucket count is a layout contract: both sides must use the same `n`,
  * and `n` should be sized so a bucket (table size / n) fits an executor
  * task comfortably — for a 100 TB fact table, n in the thousands.
  */
object BucketedTables {

  /** Write `df` as a bucketed+sorted external parquet table at
    * `path`, registered as `table` in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Inner equi-join of two co-bucketed catalog tables on `key`. When
    * both were written by [[writeBucketed]] with equal `numBuckets`,
    * the physical plan has no Exchange on either side. */
  def cobucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Hive-style partitioned parquet write: one directory per value of
    * `partitionCol`. The complement of bucketing: bucketing pre-shuffles
    * for joins, partitioning prunes SCANS — a reader filtering on the
    * partition column touches only matching directories (the plan shows
    * it as PartitionFilters, zero I/O for pruned partitions). Partition
    * by low-cardinality columns only: each (task × value) pair opens a
    * file, so a high-cardinality partition column at 100 TB is a
    * small-files explosion. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)
}
