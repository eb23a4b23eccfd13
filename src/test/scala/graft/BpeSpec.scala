package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE merge training (Bpe.train): frequency-weighted pair counts,
  * deterministic argmax tie-break, single-pass leftmost replace merge,
  * early stop when no adjacent pairs remain. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def trainList(texts: Seq[String], rounds: Int): Seq[(Int, String, String, String, Long)] = {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    Bpe.train(docs, "text", rounds).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq.sortBy(_._1)
  }

  test("frequency-weighted argmax, merged symbols feed later rounds, early stop") {
    // vocab: ab x3, ac x1. Round 1 merges (a,b) cnt 3; round 2 (a,c) cnt 1;
    // round 3 finds no pairs -> stops at 2 rows though 4 were requested.
    val got = trainList(Seq("ab ab ab", "ac"), rounds = 4)
    assert(got === Seq(
      (1, "a", "b", "ab", 3L),
      (2, "a", "c", "ac", 1L)))
    GraftCaches.releaseAll()
  }

  test("single-pass replace on a symbol run + lexicographic tie-break") {
    // One word 'aaaaa' (5 symbols). Round 1: pair (a,a) appears 4 times
    // (overlapping adjacency, classic BPE counting); the single-pass
    // leftmost replace turns ' a a a a a ' into ' aa a aa ' (the odd-run
    // artifact the operator documents). Round 2: pairs (aa,a) and (a,aa)
    // tie at 1 -> lexicographically smallest (l, r) wins: (a, aa).
    // State ' aa aaa '. Round 3 merges (aa, aaa); round 4 has no pairs.
    val got = trainList(Seq("aaaaa"), rounds = 4)
    assert(got === Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "aa", "aaa", 1L),
      (3, "aa", "aaa", "aaaaa", 1L)))
    GraftCaches.releaseAll()
  }

  test("encodeVocab is the training loop's own final state") {
    import spark.implicits._
    // Round 1 merges (a,b): 'ab' collapses to 1 unit, 'ac' stays 2
    // ('a','c'), 'abc' becomes 2 ('ab','c') — apply = train-state, so
    // subword counts reflect exactly the merges learned, no more.
    val docs = Seq((0L, "ab ab ab abc"), (1L, "ac")).toDF("doc_id", "text")
    val got = Bpe.encodeVocab(docs, "text", rounds = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("ab" -> 1L, "ac" -> 2L, "abc" -> 2L))
    GraftCaches.releaseAll()
  }
}
