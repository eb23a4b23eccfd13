package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PerceptualHash

/** Differential property pin for the dHash kernel (the JaroWinkler
  * discipline): the tight production loop is re-proven against an
  * independently-written, obviously-correct reference — functional
  * style, Seq-based, no shared helpers — on 20k random payloads, plus
  * the algebraic properties the banding layer relies on. */
class PerceptualHashPropertySpec extends AnyFunSuite {

  /** Reference implementation: straight transcription of the spec —
    * 64 equal byte segments [k·n/64, (k+1)·n/64), unsigned mean by
    * integer division, bit r·7+c = cell(r,c) > cell(r,c+1). */
  private def referenceDhash(bytes: Seq[Int]): Long = {
    val n = bytes.length
    val cells = (0 until 64).map { k =>
      val seg = bytes.slice(k * n / 64, (k + 1) * n / 64)
      if (seg.isEmpty) 0L else seg.map(_.toLong).sum / seg.length
    }
    (0 until 8).flatMap(r => (0 until 7).map(c => (r, c))).zipWithIndex
      .collect { case ((r, c), i) if cells(r * 8 + c) > cells(r * 8 + c + 1) => 1L << i }
      .sum
  }

  test("20k random payloads: production kernel equals the reference") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 20000).foreach { i =>
      val n = rnd.nextInt(300) // includes 0 and shorter-than-64
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      val got = PerceptualHash.dhash(bytes)
      val want = referenceDhash(bytes.map(_ & 0xff).toSeq)
      assert(got === want, s"case $i (n=$n)")
      assert(got >= 0L && got < (1L << 56), s"case $i out of 56-bit range")
    }
  }

  test("band decomposition is exact: reassembling 7x8-bit bands restores the hash") {
    val rnd = new scala.util.Random(7L)
    (1 to 2000).foreach { _ =>
      val bytes = Array.fill(64 + rnd.nextInt(512))(rnd.nextInt(256).toByte)
      val fp = PerceptualHash.dhash(bytes)
      val reassembled = (0 until 7).map(k => ((fp >> (k * 8)) & 255L) << (k * 8)).sum
      assert(reassembled === fp)
    }
  }

  test("pigeonhole: any pair within Hamming 6 shares at least one band") {
    // flip up to 6 random bit positions of random 56-bit values and
    // check the lossless-candidate claim the equi-join rests on
    val rnd = new scala.util.Random(6L)
    (1 to 5000).foreach { _ =>
      val a = rnd.nextLong() & ((1L << 56) - 1)
      val flips = rnd.nextInt(7) // 0..6
      val b = (1 to flips).foldLeft(a)((acc, _) => acc ^ (1L << rnd.nextInt(56)))
      val shares = (0 until 7).exists(k => ((a >> (k * 8)) & 255L) == ((b >> (k * 8)) & 255L))
      assert(shares, f"a=$a%x b=$b%x hamming=${java.lang.Long.bitCount(a ^ b)}")
    }
  }

  test("pigeonhole: any pair within Hamming 13 has some band within 1 bit (multi-probe reach)") {
    // the lossless claim the MULTI-PROBE equi-join rests on (round-9
    // VERDICT 4): 7 bands, probes at Hamming <= 1 per band, so any pair
    // with total Hamming <= 13 has a band differing in <= floor(13/7)=1
    // bit, whose probe ball contains the other side's exact band value
    val rnd = new scala.util.Random(13L)
    (1 to 5000).foreach { _ =>
      val a = rnd.nextLong() & ((1L << 56) - 1)
      val flips = rnd.nextInt(14) // 0..13
      val b = (1 to flips).foldLeft(a)((acc, _) => acc ^ (1L << rnd.nextInt(56)))
      val reachable = (0 until 7).exists(k =>
        java.lang.Long.bitCount(((a ^ b) >> (k * 8)) & 255L) <= 1)
      assert(reachable, f"a=$a%x b=$b%x hamming=${java.lang.Long.bitCount(a ^ b)}")
    }
  }
}
