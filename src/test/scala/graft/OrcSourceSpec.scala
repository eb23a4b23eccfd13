package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Source-format breadth, ORC leg (completing the parquet/CSV/JSONL
  * matrix): ORC is the other columnar format Spark ships a vectorized
  * reader for — round-trips the fixture exactly, and gets BOTH column
  * pruning and filter pushdown (ORC carries stripe/row-group statistics
  * like parquet, so pushed filters skip IO, not just parse). Hot paths
  * can live on either columnar format; the spec pins that neither
  * capability silently regresses. */
class OrcSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("ORC round-trips the customer fixture and pushes filters") {
    val out = Files.createTempDirectory("graft-orc").toString
    val cust = Tables.customer(spark, dir)
    cust.write.mode("overwrite").orc(out)

    val back = spark.read.schema(cust.schema).orc(out)
    assert(back.count() === cust.count())
    assert(back.exceptAll(cust).count() === 0)
    assert(cust.exceptAll(back).count() === 0)

    val q = back.filter(col("c_custkey") === 42L).select("c_custkey", "c_name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)]"),
      s"ORC scan must receive the pushed filter:\n$plan")
    assert(plan.contains("Batched: true"),
      s"ORC reads should be vectorized:\n$plan")
    assert(!plan.contains("c_acctbal"),
      s"ORC scan must prune unprojected columns:\n$plan")
    assert(q.count() === 1)
  }
}
