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

  test("viterbi equals brute-force enumeration on 2000 random words (differential)") {
    // Independent reference: enumerate EVERY segmentation into pieces of
    // length 1..MaxPieceLen, score by the same left-to-right product,
    // pick max score with ties to the lexicographically smallest
    // cut-position sequence read right-to-left (= at every suffix the
    // longest last piece — the DP's smallest-j rule). The DuckDB oracle
    // replays the DP; this check derives the answer a different way.
    val rnd = new scala.util.Random(77L)
    val alphabet = "abcd"
    def enumerate(w: String): Seq[List[(Int, Int)]] = {
      def go(from: Int): Seq[List[(Int, Int)]] =
        if (from == w.length) Seq(Nil)
        else (1 to math.min(graft.operators.Unigram.MaxPieceLen, w.length - from))
          .flatMap(l => go(from + l).map((from, from + l) :: _))
      go(0)
    }
    (1 to 2000).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      // random piece probabilities over all substrings (chars included so
      // every cell is reachable), quantized so exact score ties OCCUR and
      // the tie-break is actually exercised
      val pieces = (for {
        i <- 0 until w.length; l <- 1 to math.min(4, w.length - i)
      } yield w.substring(i, i + l)).distinct
      val probs = pieces.map(p => p -> (1 + rnd.nextInt(4)).toDouble / 8.0).toMap
      def score(seg: List[(Int, Int)]): Double =
        seg.foldLeft(1.0)((s, c) => s * probs(w.substring(c._1, c._2)))
      // best = max score; ties: compare cut sequences from the END —
      // a LATER last-cut start (= longer last piece) wins, recursively
      def better(a: List[(Int, Int)], b: List[(Int, Int)]): Boolean = {
        val (sa, sb) = (score(a), score(b))
        if (sa != sb) sa > sb
        else {
          val (ra, rb) = (a.reverse.map(_._1), b.reverse.map(_._1))
          ra.zip(rb).find { case (x, y) => x != y } match {
            case Some((x, y)) => x < y // smaller j at the first divergent suffix cut
            case None => ra.lengthCompare(rb.length) <= 0
          }
        }
      }
      val best = enumerate(w).reduceLeft((a, b) => if (better(a, b)) a else b)
      val expected = best.map { case (f, t) => w.substring(f, t) }
      val got = graft.operators.Unigram.viterbi(w, probs).toList
      assert(got === expected, s"w=$w probs=$probs")
    }
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
