package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries
import graft.sources.Tables

/** Algebraic invariants of the corpus-export planners (complementing their
  * DuckDB hash checks):
  *
  * sft_loss_mask — the mask is exactly n_tokens wide (loss masking never
  * changes sequence length), the boundary stays inside the document
  * (1 ≤ prompt_len < n_tokens, so every example trains on ≥1 token and
  * conditions on ≥1 token), and the mask string is literally
  * 0^prompt_len 1^n_loss.
  *
  * shard_plan — shards partition the corpus: token totals and doc counts
  * sum to the corpus totals, and the start-offset rule makes shard doc
  * ranges strictly ordered and non-overlapping (shard i's last_doc <
  * shard i+1's first_doc), i.e. a writer can emit shards independently.
  *
  * interleave_sources — positions are distinct, strictly increasing, and
  * obey position = r·k + si; the first k positions are exactly 0..k-1
  * (every source contributes its rank-0 example before any source
  * contributes rank 1 — the round-robin guarantee). */
class ShardInterleavePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("sft_loss_mask: mask width, boundary bounds, mask literal shape") {
    val rows = TextQueries.sftLossMask(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val p = r.getAs[Long]("prompt_len")
      val l = r.getAs[Long]("n_loss_tokens")
      val mask = r.getAs[String]("loss_mask")
      assert(p >= 1 && p < n, s"doc ${r.get(0)}: prompt_len $p out of [1, $n)")
      assert(l == n - p)
      assert(mask.length == n, s"doc ${r.get(0)}: mask width ${mask.length} != $n")
      assert(mask == ("0" * p.toInt) + ("1" * l.toInt))
    }
  }

  test("shard_plan: shards partition the corpus in doc_id order") {
    import org.apache.spark.sql.functions._
    val shards = TextQueries.shardPlan(spark, dir).collect()
    val corpus = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("docs"),
        sum(size(graft.operators.TextOps.words(col("text"))).cast("bigint")).as("toks"))
      .head()
    assert(shards.map(_.getAs[Long]("n_docs")).sum == corpus.getAs[Long]("docs"))
    assert(shards.map(_.getAs[Long]("n_tokens")).sum == corpus.getAs[Long]("toks"))
    shards.sortBy(_.getAs[Long]("shard_id")).sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"),
          s"shards ${a.get(0)} and ${b.get(0)} overlap")
      case _ => ()
    }
  }

  test("interleave_sources: round-robin head — first k positions are 0..k-1") {
    val rows = TextQueries.interleaveSources(spark, dir).collect()
    assert(rows.nonEmpty)
    val k = rows.map(_.getAs[Long]("si")).max + 1
    rows.foreach { r =>
      assert(r.getAs[Long]("position") ==
        r.getAs[Long]("r") * k + r.getAs[Long]("si"))
    }
    val positions = rows.map(_.getAs[Long]("position")).sorted
    assert(positions.distinct.length == positions.length)
    assert(positions.take(k.toInt).toSeq == (0L until k).toSeq,
      s"first $k positions not a full source rotation")
  }
}
