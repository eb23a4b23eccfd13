package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 connector contract: generation-bound pushdown (a pushed
  * doc_id range must shrink the planned bounds, not post-filter), column
  * pruning reaching readSchema, deterministic content across reads and
  * partitionings, and correct parallel slicing. */
class SyntheticDocsSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val fmt = "graft.sources.v2.SyntheticDocs"

  private def read(rows: Long = 1000L, parts: Int = 4) =
    spark.read.format(fmt)
      .option("rows", rows.toString).option("partitions", parts.toString).load()

  test("full scan yields `rows` deterministic rows across re-reads and partitionings") {
    val a = read(rows = 500, parts = 4)
    val b = read(rows = 500, parts = 7)
    assert(a.count() === 500)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    // schema contract
    assert(a.columns.toSeq === Seq("doc_id", "lang", "text", "n_chars"))
    assert(a.filter(length(col("text")) =!= col("n_chars")).count() === 0)
  }

  test("doc_id range predicates push down as generation bounds") {
    val df = read(rows = 100000, parts = 8)
      .filter(col("doc_id") >= 1000 && col("doc_id") < 1100)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[1000,1100)"),
      s"pushed range should shrink the generation bounds:\n$plan")
    assert(df.count() === 100)
    // equality collapses to a single-id bound
    val one = read(rows = 100000, parts = 8).filter(col("doc_id") === 42L)
    assert(one.queryExecution.executedPlan.toString.contains("bounds=[42,43)"))
    assert(one.count() === 1)
  }

  test("column pruning reaches the scan and non-key filters stay with Spark") {
    val df = read(rows = 1000, parts = 4)
      .filter(col("lang") === "en").select("doc_id", "lang")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=doc_id,lang"),
      s"pruned columns should reach readSchema:\n$plan")
    // lang filter is NOT a generation bound — rows still filter post-scan
    assert(plan.contains("bounds=[0,1000)"))
    val langs = df.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs === Set("en"))
  }

  test("the source feeds engine operators like any table") {
    val docs = read(rows = 2000, parts = 8)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("en", "es", "de"))
    assert(counts.values.sum === 2000L)
  }
}
