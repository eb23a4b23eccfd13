package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential property pin for next-fit packing: the two independent
  * production implementations (CurationQueries' flatMapGroups scan and
  * PackStream's O(1) stateful fold) are each checked against a
  * third, obviously-correct reference fold on random shard contents —
  * driver-side, no Spark jobs, thousands of cases. */
class PackPropertySpec extends AnyFunSuite {

  private val Cap = 256L

  /** Reference next-fit: one obvious functional fold. Returns
    * (bin_id, n_docs, bin_tokens) per bin in order. */
  private def referencePack(tokens: Seq[Long]): Seq[(Long, Long, Long)] =
    tokens.foldLeft(Vector.empty[(Long, Long, Long)]) { (bins, t) =>
      bins.lastOption match {
        case Some((id, n, cur)) if cur + t <= Cap =>
          bins.init :+ ((id, n + 1, cur + t))
        case Some((id, _, _)) => bins :+ ((id + 1, 1L, t))
        case None => Vector((1L, 1L, t))
      }
    }

  /** CurationQueries' scan, replicated byte-for-byte from
    * packSequences' flatMapGroups body (kept in sync by this spec:
    * if the query's inline lambda changes semantics, the end-to-end
    * ScaleSmoke invariant AND the oracle catch it; this pins the
    * algorithm against the reference on inputs the fixture never has). */
  private def batchStylePack(tokens: Seq[Long]): Seq[(Long, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var bin = 0L; var cur = 0L; var n = 0L
    tokens.foreach { t =>
      if (bin == 0L || cur + t > Cap) {
        if (bin > 0L) out += ((bin, n, cur))
        bin += 1; cur = t; n = 1
      } else { cur += t; n += 1 }
    }
    if (bin > 0L) out += ((bin, n, cur))
    out.toSeq
  }

  /** PackStream's fold, replayed through its real processor state
    * transitions (the per-doc arm of handleInputRows), split across
    * random "batch" boundaries to exercise the cross-batch carry. */
  private def streamStylePack(tokens: Seq[Long], seed: Long): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    var s = graft.streaming.PackStream.PackState(Long.MinValue, 0L, 0L, 0L)
    val closed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var docId = 0L
    tokens.grouped(1 + rnd.nextInt(4)).foreach { batch =>
      batch.foreach { t =>
        docId += 1
        if (docId > s.lastDoc) {
          if (s.bin == 0L || s.cur + t > Cap) {
            if (s.bin > 0L) closed += ((s.bin, s.n, s.cur))
            s = graft.streaming.PackStream.PackState(docId, s.bin + 1, t, 1L)
          } else s = graft.streaming.PackStream.PackState(docId, s.bin, s.cur + t, s.n + 1)
        }
      }
    }
    (closed :+ ((s.bin, s.n, s.cur))).toSeq.filter(_._1 > 0L)
  }

  test("5k random shards: batch scan and stream fold both equal the reference") {
    val rnd = new scala.util.Random(99L)
    (1 to 5000).foreach { i =>
      val tokens = Seq.fill(rnd.nextInt(80))(1L + rnd.nextInt(400)) // incl. oversize
      val want = referencePack(tokens)
      assert(batchStylePack(tokens) === want, s"batch case $i: $tokens")
      assert(streamStylePack(tokens, i) === want, s"stream case $i: $tokens")
      // invariants: no bin over capacity unless it is a single oversize
      // doc; every doc lands in exactly one bin
      want.foreach { case (_, n, cur) =>
        assert(cur <= Cap || n == 1L, s"overfull multi-doc bin in case $i")
      }
      assert(want.map(_._2).sum === tokens.length)
      assert(want.map(_._3).sum === tokens.sum)
    }
  }
}
