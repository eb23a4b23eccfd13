package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.Tables

/** Differential guarantee of the bloom-filter decontamination path vs the
  * exact broadcast-set operator: the bloom variant may only OVER-count
  * (false positives bounded by fpp), never under-count — a benchmark
  * gram the exact operator matched must always be matched by the filter.
  * That one-sidedness is what makes the bloom path safe to ship at scale:
  * it can quarantine a clean document (and be rechecked exactly), it can
  * never leak a contaminated one. */
class BloomDecontaminationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("bloom overlap dominates exact overlap and misses no contaminated doc") {
    val docs = Tables.documents(spark, dir)
    val exact = Dedup.contaminationOverlap(docs, "doc_id", "text",
        benchPred = col("doc_id") < 10, threshold = 0.3)
      .select(col("doc_id"), col("n_matched").as("m_exact"),
        col("contaminated").as("c_exact"))
    val bloom = Dedup.contaminationOverlapBloom(docs, "doc_id", "text",
        benchPred = col("doc_id") < 10, threshold = 0.3, fpp = 0.01)
      .select(col("doc_id"), col("n_grams"), col("n_matched").as("m_bloom"),
        col("contaminated").as("c_bloom"))
    val j = exact.join(bloom, "doc_id")

    // One-sided error: never fewer matches than the exact operator …
    assert(j.filter(col("m_bloom") < col("m_exact")).count() === 0)
    // … so no contaminated document can be missed.
    assert(j.filter(col("c_exact") && !col("c_bloom")).count() === 0)
    assert(j.count() > 0)

    // False-positive inflation stays in the fpp ballpark (generous 5x
    // slack — the guarantee under test is one-sidedness, not tightness).
    val row = j.agg(
      sum(col("m_bloom") - col("m_exact")).cast("double").as("extra"),
      sum(col("n_grams")).cast("double").as("grams")).head()
    assert(row.getDouble(0) / row.getDouble(1) <= 0.05,
      s"bloom FP inflation ${row.getDouble(0)} / ${row.getDouble(1)} grams exceeds 5x fpp")
  }

  test("bloom membership is deterministic across rebuilds") {
    val docs = Tables.documents(spark, dir)
    def run() = Dedup.contaminationOverlapBloom(docs, "doc_id", "text",
        benchPred = col("doc_id") < 10, threshold = 0.3, fpp = 0.01)
      .select("doc_id", "n_matched")
    assert(run().exceptAll(run()).count() === 0)
  }
}
