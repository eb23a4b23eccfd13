package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ScoredId, TopKAggregator, TopKList}

/** Round-4 VERDICT item 4: the bounded-heap top-k aggregator must be
  * TOTAL-ORDER-DETERMINISTIC — duplicate scores at the k boundary, folded
  * under adversarial partition splits and merge orders, must always yield
  * the k least elements of the strict (sim desc, id asc) order, exactly as
  * a `row_number` window over the same keys would. An aggregator whose
  * kept set depended on partial-merge order would make every consumer
  * (ann_recall, embed_cosine_topk, ann_lsh_topk) partitioning-dependent.
  */
class TopKAggregatorPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Scores drawn from FOUR distinct values over up to 60 ids: ties at the
  // boundary are near-certain, which is the whole point.
  private val caseGen = for {
    n <- Gen.choose(0, 60)
    k <- Gen.choose(1, 8)
    scores <- Gen.listOfN(n, Gen.oneOf(0.25, 0.5, 0.5, 0.75, 1.0))
  } yield (k, scores.zipWithIndex.map { case (s, i) => ScoredId(i.toLong, s) })

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4242L + i)))

  private def reference(items: Seq[ScoredId], k: Int): (Seq[Long], Seq[Double]) = {
    val sorted = items.sortBy(s => (-s.sim, s.cand_id)).take(k)
    (sorted.map(_.cand_id), sorted.map(_.sim))
  }

  test("serial fold under adversarial insertion orders matches the total order") {
    val agg = samples(caseGen, 25)
    agg.foreach { case (k, items) =>
      val a = new TopKAggregator(k)
      val want = reference(items, k)
      // Three adversarial insertion orders: ascending, descending, interleaved.
      val orders = Seq(items, items.reverse,
        items.grouped(2).toSeq.reverse.flatten)
      orders.foreach { order =>
        val folded = order.foldLeft(a.zero)((b, s) => a.reduce(b, s))
        assert((folded.ids, folded.sims) == want,
          s"k=$k order=${order.take(5)}... got=${folded.ids} want=${want._1}")
      }
    }
  }

  test("merge is associative and order-insensitive across adversarial splits") {
    samples(caseGen, 25).foreach { case (k, items) =>
      val a = new TopKAggregator(k)
      val want = reference(items, k)
      def fold(xs: Seq[ScoredId]): TopKList =
        xs.foldLeft(a.zero)((b, s) => a.reduce(b, s))
      // Split into 1..4 partitions at varying cut points, merge in both
      // directions and in a skewed tree — all must agree with the total order.
      val splits: Seq[Seq[Seq[ScoredId]]] = Seq(
        Seq(items),
        { val (x, y) = items.splitAt(items.length / 3); Seq(x, y) },
        { val (x, y) = items.splitAt(2 * items.length / 3); Seq(x, y) },
        items.grouped(math.max(1, items.length / 4 + 1)).toSeq)
      splits.foreach { parts =>
        val bufs = parts.map(fold)
        val ltr = bufs.foldLeft(a.zero)(a.merge)
        val rtl = bufs.reverse.foldLeft(a.zero)(a.merge)
        assert((ltr.ids, ltr.sims) == want)
        assert((rtl.ids, rtl.sims) == want)
      }
    }
  }

  test("distributed fold over forced partition splits equals the window formulation") {
    import spark.implicits._
    val items = samples(caseGen, 1).head match {
      case (_, xs) if xs.nonEmpty => xs
      case _ => (0 until 40).map(i => ScoredId(i.toLong, (i % 3) * 0.5))
    }
    val k = 5
    Seq(1, 3, 7, 16).foreach { nPart =>
      val df = items.toDF("cand_id", "sim").repartition(nPart)
      val got = df.agg(TopKAggregator.topK(k)(col("cand_id"), col("sim")).as("t"))
        .select(col("t.ids"), col("t.sims")).head()
      val want = reference(items, k)
      assert((got.getSeq[Long](0), got.getSeq[Double](1)) == want,
        s"nPart=$nPart")
    }
  }
}
