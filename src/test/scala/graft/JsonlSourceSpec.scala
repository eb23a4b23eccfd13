package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Source-format breadth, JSONL leg (mirrors CsvSourceSpec): a schema'd
  * `json()` read round-trips the parquet fixture exactly, and BOTH
  * column pruning and filter pushdown reach the JSON scan
  * (`spark.sql.json.filterPushdown.enabled`, on by default since Spark
  * 3.1 — the parser short-circuits a record as soon as the pushed
  * predicate fails). The routing rule this spec documents: JSON
  * "pushdown" only skips per-row PARSE work — every byte of every
  * record is still read and tokenized, unlike parquet, whose row-group
  * statistics skip IO entirely. So JSONL is an ingest/interchange
  * format; hot analytical paths belong on parquet.
  */
class JsonlSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("JSONL round-trips the customer fixture with a pinned schema") {
    val out = Files.createTempDirectory("graft-jsonl").toString
    val cust = Tables.customer(spark, dir)
    cust.write.mode("overwrite").json(out)

    val back = spark.read.schema(cust.schema).json(out)
    assert(back.count() === cust.count())
    assert(back.exceptAll(cust).count() === 0)
    assert(cust.exceptAll(back).count() === 0)
  }

  test("JSON scan prunes columns and pushes filters (parse-skip, not IO-skip)") {
    val out = Files.createTempDirectory("graft-jsonl2").toString
    val cust = Tables.customer(spark, dir)
    cust.write.mode("overwrite").json(out)

    val q = spark.read.schema(cust.schema).json(out)
      .filter(col("c_custkey") === 42L)
      .select("c_custkey", "c_name")
    val plan = q.queryExecution.executedPlan.toString

    // Column pruning works: the scan's ReadSchema carries only the two
    // projected columns (plus nothing else from the 8-column fixture).
    assert(plan.contains("c_custkey") && plan.contains("c_name"))
    assert(!plan.contains("c_acctbal"),
      s"JSON scan must prune unprojected columns:\n$plan")
    // Filter pushdown DOES reach the JSON scan (json.filterPushdown,
    // default on) — but note `Batched: false` in the same scan node:
    // JSON parses row-at-a-time and the pushed filter only aborts a
    // record's parse early; it cannot skip IO the way parquet row-group
    // stats do. Keep hot paths on parquet.
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)]"),
      s"JSON scan should receive the pushed filter:\n$plan")
    assert(plan.contains("Batched: false"),
      s"JSON scans are not vectorized — part of the routing rationale:\n$plan")
    assert(q.count() === 1)
  }

  test("DocSource.readJsonl round-trips the syllabus fixture schema") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-jsonl3").toString
    val rows = Seq(
      ("c1", "UG-c1_1A2024-1.pdf", Seq("page one", "page two"),
        Seq(Seq("Unidad n. 1: Intro", "w")), Seq(Seq("EXAMEN", "20%"))),
      ("c2", "UG-c2_1A2024-1.pdf", Seq("solo"),
        Seq.empty[Seq[String]], Seq.empty[Seq[String]]))
      .toDF("doc_id", "filename", "pages", "units_raw", "assessments_raw")
    rows.write.mode("overwrite").json(out)
    val back = graft.sources.DocSource.readJsonl(spark, out)
    assert(back.schema === graft.sources.DocSource.schema)
    assert(back.count() === 2)
    assert(back.filter(col("doc_id") === "c1")
      .select(element_at(col("pages"), 2)).as[String].head() === "page two")
  }
}
