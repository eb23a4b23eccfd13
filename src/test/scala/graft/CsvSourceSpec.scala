package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Source-format breadth: the engine's queries are format-agnostic — any
  * relation with the fixture schema plugs in. This spec pins the CSV path:
  * schema'd read round-trips the parquet fixture exactly, and predicate
  * pushdown reaches the CSV scan (spark.sql.csv.filterPushdown is on by
  * default — a regression here silently full-scans at 100 TB). */
class CsvSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("CSV round-trips the customer fixture and pushes filters") {
    val out = Files.createTempDirectory("graft-csv").toString
    val cust = Tables.customer(spark, dir)
    cust.write.mode("overwrite").option("header", "true").csv(out)

    val back = spark.read.schema(cust.schema).option("header", "true").csv(out)
    assert(back.count() === cust.count())
    assert(back.exceptAll(cust).count() === 0)
    assert(cust.exceptAll(back).count() === 0)

    val filtered = back.filter(col("c_custkey") === 42L)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)]"),
      s"CSV scan must receive the pushed filter:\n$plan")
    assert(filtered.count() === 1)
  }
}
