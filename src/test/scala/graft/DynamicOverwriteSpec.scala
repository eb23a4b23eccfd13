package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition overwrite — the at-scale incremental-write contract:
  * `INSERT OVERWRITE` with `partitionOverwriteMode=dynamic` must replace
  * ONLY the partitions present in the incoming batch and leave every
  * other partition's files untouched (static mode wipes the whole table
  * root first — the classic "reprocessing one day deleted the year"
  * incident). A daily-partitioned pipeline reprocessing one day depends
  * on exactly this. */
class DynamicOverwriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dynamic mode overwrites only the partitions in the incoming batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dynover").toString + "/t"
    val init = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0),
      (3L, "2024-01-02", 30.0), (4L, "2024-01-03", 40.0))
      .toDF("id", "day", "v")
    init.write.partitionBy("day").parquet(dir)

    // Reprocess ONLY day 2 with corrected values.
    val fix = Seq((3L, "2024-01-02", 99.0)).toDF("id", "day", "v")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try fix.write.mode("overwrite").partitionBy("day").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    // Partition-column inference reads `day` back as DATE; compare as string.
    val got = spark.read.parquet(dir)
      .select(col("id"), col("day").cast("string"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set(
      (1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0), // untouched
      (3L, "2024-01-02", 99.0),                           // replaced
      (4L, "2024-01-03", 40.0)))                          // untouched
  }

  test("static mode (the default) wipes partitions absent from the batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-statover").toString + "/t"
    Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0))
      .toDF("id", "day", "v")
      .write.partitionBy("day").parquet(dir)
    Seq((9L, "2024-01-02", 99.0)).toDF("id", "day", "v")
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val got = spark.read.parquet(dir).select("id").as[Long].collect().toSet
    assert(got === Set(9L), "static overwrite must have replaced the whole table")
  }
}
