package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Unigram

/** Unigram-LM tokenizer trainer (round-9 VERDICT 3): hard-EM semantics
  * pinned on hand-built corpora — the oracle hash check covers the
  * fixture; these pin the ALGEBRA (seeding, Viterbi tie-breaks, count
  * evolution, coverage floor) on inputs chosen to exercise each rule. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("viterbi prefers the dominant multi-char piece and breaks ties to the longest last piece") {
    // "abab" repeated: piece "abab" (len 4) is in the top-K inventory;
    // its single best segmentation is the whole word.
    val d = docs(Seq.fill(20)("abab").mkString(" "))
    val enc = Unigram.encodeVocab(d, "text", iters = 2, topK = 8)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    GraftCaches.releaseAll()
    assert(enc("abab") === (("abab", 1L)))
  }

  test("train logs every inventory piece at every iteration, zero counts included") {
    val d = docs("aa ab aa", "ab aa ab")
    val rows = Unigram.train(d, "text", iters = 2, topK = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    GraftCaches.releaseAll()
    val byIter = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // same inventory at every iteration (0 = seeds)
    assert(byIter.keySet === Set(0, 1, 2))
    assert(byIter(0) === byIter(1) && byIter(1) === byIter(2))
    // single chars are always in the inventory (coverage floor)
    assert(byIter(0).contains("a") && byIter(0).contains("b"))
    // hand trace: seeds a=9, b=3, aa=3, ab=3 (T=18, P=4). Round 1:
    // "aa" → [a,a] ((10/22)² > 4/22) and "ab" → [ab] (4/22 > 10·4/22²),
    // so c1 = {a:6, ab:3, aa:0, b:0}; round 2 re-derives the same
    // segmentations from those counts — a fixpoint. Zero-count pieces
    // (aa, b) must still be logged.
    val it2 = rows.filter(_._1 == 2).map(r => r._2 -> r._3).toMap
    assert(it2("a") === 6L && it2("ab") === 3L)
    assert(it2("aa") === 0L && it2("b") === 0L)
    assert(rows.filter(_._1 == 1).map(r => r._2 -> r._3).toMap === it2)
  }

  test("every char of every word stays segmentable even when multi-char pieces dominate") {
    // "zq" appears once: rare chars must never become unreachable
    // (Laplace smoothing keeps the char floor alive).
    val d = docs(Seq.fill(50)("abcd").mkString(" ") + " zq")
    val enc = Unigram.encodeVocab(d, "text", iters = 3, topK = 4)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    GraftCaches.releaseAll()
    assert(enc.contains("zq"))
    assert(enc("zq") >= 1L && enc("zq") <= 2L)
    assert(enc("abcd") === 1L)
  }

  test("scale smoke: trains over the synthetic corpus with no banned plan shapes") {
    val n = 20000L
    val d = spark.read.format("graft.sources.v2.SyntheticDocs")
      .option("rows", n).option("partitions", 32).load()
    val enc = Unigram.encodeVocab(d, "text", iters = 2, topK = 32)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "CartesianProduct in plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ in plan")
    val t0 = System.nanoTime()
    val rows = enc.count()
    info(f"unigram encodeVocab over $n docs: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    GraftCaches.releaseAll()
    assert(rows > 0L)
  }
}
