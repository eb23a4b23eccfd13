package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** Packing invariants: no sequence exceeds the budget (except a lone
  * oversized chunk), every chunk lands in exactly one sequence, and
  * within a shard the original (doc_id, chunk_no) order is preserved
  * across sequence boundaries. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val chunksGen = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.listOfN(n, for {
      doc <- Gen.choose(0L, 12L)
      cn <- Gen.choose(0, 5)
      tok <- Gen.choose(1, 200)
    } yield (doc, cn, tok))
  } yield rows.distinctBy(r => (r._1, r._2))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("pack invariants hold on generated chunk sets") {
    import spark.implicits._
    samples(chunksGen, 15).foreach { rows =>
      val budget = 128
      val packed = Packing.packSequences(
        rows.toDF("doc_id", "chunk_no", "n_tokens"),
        "doc_id", "chunk_no", "n_tokens", shards = 4, budget = budget).collect()

      // budget respected unless the sequence is a single oversized chunk
      packed.foreach(s =>
        assert(s.n_tokens <= budget || s.n_chunks === 1L,
          s"overflowing multi-chunk sequence: $s"))

      // exact partition of the input chunk set
      val members = packed.flatMap(_.chunks.split(',').filter(_.nonEmpty))
      assert(members.length === rows.length)
      assert(members.toSet ===
        rows.map(r => s"${r._1}:${r._2}").toSet)

      // order within a shard: concatenating sequences in seq_no order
      // yields the (doc_id, chunk_no)-sorted chunk list
      packed.groupBy(_.shard).foreach { case (shard, seqs) =>
        val concat = seqs.sortBy(_.seq_no)
          .flatMap(_.chunks.split(',').filter(_.nonEmpty))
          .map { m => val Array(d, c) = m.split(':'); (d.toLong, c.toInt) }
        val expected = rows
          .filter(r => java.lang.Math.floorMod(r._1, 4L) == shard)
          .map(r => (r._1, r._2)).sorted
        assert(concat.toSeq === expected)
      }
    }
  }

  test("greedy boundary: a chunk that exactly fills the budget stays") {
    import spark.implicits._
    val rows = Seq((0L, 0, 100), (0L, 1, 28), (0L, 2, 1))
    val packed = Packing.packSequences(
        rows.toDF("doc_id", "chunk_no", "n_tokens"),
        "doc_id", "chunk_no", "n_tokens", shards = 1, budget = 128)
      .collect().sortBy(_.seq_no)
    assert(packed.map(_.chunks).toSeq === Seq("0:0,0:1", "0:2"))
    assert(packed.map(_.n_tokens).toSeq === Seq(128L, 1L))
  }
}
