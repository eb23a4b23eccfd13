package graft

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Property checks for the objective-shaping plans (no oracle needed —
  * these are algebraic invariants of the plan itself):
  *
  * span_corruption: splicing each <extra_id_k> sentinel's span from
  * `target_text` back into `input_text` must reconstruct the original
  * document EXACTLY — i.e. the encoder/decoder pair is lossless. Plus
  * count algebra: target tokens = n_corrupt + n_spans sentinels,
  * n_spans ≤ n_corrupt, and corruption stays near the design rate.
  *
  * mlm_mask_plan (checked via the query at sf0.001 in QueriesSmokeSpec;
  * here the operator-level invariant): masked_text has exactly n_tokens
  * tokens — masking never changes sequence length. */
class SpanCorruptionPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(n: Int): org.apache.spark.sql.DataFrame = {
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val rnd = new scala.util.Random(42)
    val rows = (0 until n).map { i =>
      val len = 1 + rnd.nextInt(120)
      (i.toLong, (0 until len).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    }
    spark.createDataset(rows)(Encoders.product[(Long, String)])
      .toDF("doc_id", "text")
  }

  test("input_text + target_text reconstruct the original document") {
    val d = docs(60)
    val plan = TextOps.spanCorruptionPlan(d, "doc_id", "text")
    val orig = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = plan.collect()
    assert(rows.length === 60)
    val sentinel = "<extra_id_(\\d+)>".r
    rows.foreach { r =>
      val (id, nTok, nCor, nSpans) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val input = r.getString(4)
      val target = r.getString(5)
      // Parse target into span-id -> tokens.
      val spans = scala.collection.mutable.Map.empty[Int, Vector[String]]
      var cur = -1
      target.split(" ").filter(_.nonEmpty).foreach {
        case sentinel(k) => cur = k.toInt; spans(cur) = Vector.empty
        case tok => spans(cur) = spans(cur) :+ tok
      }
      assert(spans.size.toLong === nSpans, s"doc $id: sentinel count != n_spans")
      assert(spans.values.map(_.size).sum.toLong === nCor,
        s"doc $id: target span tokens != n_corrupt")
      // Splice spans back into the input at their sentinels.
      val rebuilt = input.split(" ").filter(_.nonEmpty).flatMap {
        case sentinel(k) => spans(k.toInt)
        case tok => Vector(tok)
      }.mkString(" ")
      assert(rebuilt === orig(id), s"doc $id: reconstruction mismatch")
      assert(rebuilt.split(" ").count(_.nonEmpty).toLong === nTok)
      assert(nSpans <= nCor)
    }
    // Aggregate corruption rate lands near the design point (~5% starts
    // x 3-token spans ≈ 14% of positions; merged overlaps pull it down).
    val totTok = rows.map(_.getLong(1)).sum.toDouble
    val totCor = rows.map(_.getLong(2)).sum.toDouble
    assert(totCor / totTok > 0.05 && totCor / totTok < 0.30,
      f"corruption rate ${totCor / totTok}%.3f outside sanity band")
    GraftCaches.releaseAll()
  }

  test("mlm masking preserves sequence length and masks ~15% of positions") {
    val plan = graft.queries.TextQueries.mlmMaskPlan(spark, "/root/testdata/sf0.001")
    val rows = plan.collect()
    rows.foreach { r =>
      val nTok = r.getLong(1); val nMask = r.getLong(2)
      val positions = r.getString(3)
      val masked = r.getString(4)
      assert(masked.split(" ").count(_.nonEmpty).toLong === nTok,
        s"doc ${r.getLong(0)}: masking changed sequence length")
      val nPos = if (positions.isEmpty) 0 else positions.split(",").length
      assert(nPos.toLong === nMask)
    }
    val tot = rows.map(_.getLong(1)).sum.toDouble
    val mask = rows.map(_.getLong(2)).sum.toDouble
    assert(mask / tot > 0.10 && mask / tot < 0.20,
      f"mask rate ${mask / tot}%.3f outside the 15%% design band")
    GraftCaches.releaseAll()
  }
}
