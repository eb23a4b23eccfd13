package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution on the read path: a table directory whose older
  * files lack a column that newer files carry must read as ONE relation
  * with nulls for the missing column (mergeSchema), filters on the new
  * column must not error on old files, and column pruning must still
  * reach both vintages. This is the contract a 100 TB table that gained
  * a column mid-life depends on — no rewrite of old files. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def twoVintageDir(): String = {
    val dir = Files.createTempDirectory("graft-evolve").toString
    // v1 files: (id, v) — no `tag` column.
    spark.range(0, 100).select(col("id"), (col("id") * 2).as("v"))
      .write.mode("append").parquet(dir)
    // v2 files: (id, v, tag) — the column added mid-life.
    spark.range(100, 150).select(col("id"), (col("id") * 2).as("v"),
        concat(lit("t"), pmod(col("id"), lit(3))).as("tag"))
      .write.mode("append").parquet(dir)
    dir
  }

  test("mergeSchema unions vintages with nulls for the added column") {
    val df = spark.read.option("mergeSchema", "true").parquet(twoVintageDir())
    assert(df.columns.sorted.toSeq === Seq("id", "tag", "v"))
    assert(df.count() === 150)
    assert(df.filter(col("tag").isNull).count() === 100, "old files read null tag")
    assert(df.filter(col("tag") === "t0").count() > 0, "new files read real tags")
    // Aggregation across vintages sees one coherent relation.
    val total = df.agg(sum("v")).collect()(0).getLong(0)
    assert(total === (0L until 150L).map(_ * 2).sum)
  }

  test("filters and pruning on the evolved column survive old files") {
    val df = spark.read.option("mergeSchema", "true").parquet(twoVintageDir())
    // A predicate on the added column must not error on files lacking it
    // and must select only new-vintage rows.
    val newOnly = df.filter(col("tag").isNotNull)
    assert(newOnly.count() === 50)
    assert(newOnly.agg(min("id")).collect()(0).getLong(0) === 100L)
    // Projection pruned to old-vintage columns reads both vintages.
    assert(df.select("id", "v").count() === 150)
  }
}
