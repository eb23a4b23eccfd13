package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrderCode

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleave16 is a bijection on 16-bit pairs (property)") {
    val gen = for { x <- Gen.choose(0L, 0xFFFFL); y <- Gen.choose(0L, 0xFFFFL) } yield (x, y)
    val cases = (0 until 500).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))) ++
      Seq((0L, 0L), (0xFFFFL, 0xFFFFL), (0L, 0xFFFFL), (0xFFFFL, 0L))
    cases.foreach { case (x, y) =>
      val z = ZOrderCode.interleave16(x, y)
      assert(z >= 0L && z < (1L << 32))
      assert(ZOrderCode.deinterleave16(z) === ((x, y)))
    }
  }

  test("the codegen Expression matches the Scala reference through a real plan") {
    val df = (0 until 1000).map(i => (i.toLong * 37 % 65536, i.toLong * 101 % 65536))
      .toDF("x", "y")
    val rows = df.select(col("x"), col("y"), ZOrderCode.z(col("x"), col("y")).as("z"))
      .collect()
    rows.foreach(r => assert(r.getLong(2) === ZOrderCode.interleave16(r.getLong(0), r.getLong(1))))
    // and via the SQL registration installed by GraftExtensions
    df.createOrReplaceTempView("zsrc")
    val sqlRows = spark.sql("SELECT x, y, zorder_code(x, y) AS z FROM zsrc").collect()
    sqlRows.foreach(r => assert(r.getLong(2) === ZOrderCode.interleave16(r.getLong(0), r.getLong(1))))
  }

  test("z-sorted chunks keep BOTH dims narrow; single-column sort leaves one wide") {
    // deterministic pseudo-uniform points in [0, 4096)^2
    val pts = (0 until 4096).map { i =>
      val x = (i * 2654435761L) % 4096
      val y = (i * 40503L + 17) % 4096
      (x, y)
    }
    val chunks = 16
    def spans(sorted: Seq[(Long, Long)], dim: ((Long, Long)) => Long): Double = {
      val per = sorted.grouped(sorted.length / chunks).toSeq
      per.map { c => (c.map(dim).max - c.map(dim).min).toDouble }.sum / per.length
    }
    val zSorted = pts.sortBy { case (x, y) => ZOrderCode.interleave16(x, y) }
    val xSorted = pts.sortBy(_._1)
    val full = 4096.0
    // z-sort: each chunk is a compact z-region → both dims well under full width
    assert(spans(zSorted, _._1) < 0.5 * full, s"z-sort x-span ${spans(zSorted, _._1)}")
    assert(spans(zSorted, _._2) < 0.5 * full, s"z-sort y-span ${spans(zSorted, _._2)}")
    // x-sort: x is narrow but y stays at (nearly) full width — no pruning on y
    assert(spans(xSorted, _._1) < 0.1 * full)
    assert(spans(xSorted, _._2) > 0.9 * full,
      s"x-sort should leave y wide, got ${spans(xSorted, _._2)}")
  }
}
