package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Span-level exact dedup (Dedup.spanDedup): repeated cross-document
  * token spans are cut out of every document's text; unique content and
  * short documents pass through intact. */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val boiler = "all rights reserved no part may be reproduced"  // 8 tokens

  test("shared span removed from every copy, unique text kept in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma delta"),
      (2L, s"one two three $boiler"),
      (3L, "totally unique text with eight or so words here")
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // The 8-token boilerplate is exactly one window in each host doc;
    // it covers exactly the 8 boilerplate tokens.
    assert(got(1L) === ((12L, 8L, "alpha beta gamma delta")))
    assert(got(2L) === ((11L, 8L, "one two three")))
    // Unique doc: windows exist (>= 8 tokens) but none repeats elsewhere.
    assert(got(3L) === ((9L, 0L, "totally unique text with eight or so words here")))
    GraftCaches.releaseAll()
  }

  test("document fully covered by duplicated windows empties to ''") {
    import spark.implicits._
    val docs = Seq(
      (1L, boiler),                 // 8 tokens, all boilerplate
      (2L, s"intro words $boiler")
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((8L, 8L, "")))
    assert(got(2L) === ((10L, 8L, "intro words")))
    GraftCaches.releaseAll()
  }

  test("documents shorter than the window pass through untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "short doc"), (2L, "short doc"),  // identical but < 8 tokens
      (3L, "")
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((2L, 0L, "short doc")))
    assert(got(2L) === ((2L, 0L, "short doc")))
    assert(got(3L) === ((0L, 0L, "")))
    GraftCaches.releaseAll()
  }

  test("repeat WITHIN one doc only does not mark a span (cross-doc df)") {
    import spark.implicits._
    // The same 8-token run twice in one document: window hash df counts
    // DISTINCT documents, so an intra-doc repeat alone is not removed —
    // that inventory belongs to duplicate_ngrams/repetition_ratio.
    val run = "a b c d e f g h"
    val docs = Seq(
      (1L, s"$run x $run"),
      (2L, "entirely different words so nothing matches across documents")
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) === 0L)
    assert(got(2L) === 0L)
    GraftCaches.releaseAll()
  }
}
