package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force property checks for the statistical aggregates, driven
  * through the REAL query paths on random parquet fixtures (same method
  * as WeightedMedianPropertySpec): per-nation Gini against the O(n²)
  * mean-absolute-difference definition, and the mode against a plain
  * max-count scan with the smallest-value tie-break. */
class StatisticalPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("gini_by_nation equals the O(n^2) mean-absolute-difference definition") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(4), math.rint(rnd.nextDouble() * 10000) / 100.0)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-gini").toString
    import spark.implicits._
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")

    val got = graft.queries.Relational.giniByNation(spark, tmp)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap

    rows.groupBy(_._2).foreach { case (nat, rs) =>
      val xs = rs.map(r => BigDecimal(r._3).setScale(2))
      val n = xs.length
      val sum = xs.sum
      // G = Σᵢⱼ|xᵢ−xⱼ| / (2n·Σx) — the definition the rank form rewrites.
      val mad = (for (a <- xs; b <- xs) yield (a - b).abs).sum
      val expected = (mad / (BigDecimal(2) * n * sum)).toDouble
      assert(math.abs(got(nat) - expected) < 1e-9, s"nation $nat")
    }
    GraftCaches.releaseAll()
  }

  test("mode_by_group equals a plain max-count scan with smallest-value tie-break") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 400).map { _ =>
      (Seq("A", "N", "R")(rnd.nextInt(3)), (rnd.nextInt(10) + 1).toDouble, 100.0)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-mode").toString
    import spark.implicits._
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")

    val got = graft.queries.Relational.modeByGroup(spark, tmp)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap

    rows.groupBy(_._1).foreach { case (flag, rs) =>
      val counts = rs.groupBy(_._2).map { case (q, g) => q -> g.size.toLong }
      val maxN = counts.values.max
      val mode = counts.filter(_._2 == maxN).keys.min
      assert(got(flag) === ((mode, maxN)), s"group $flag")
    }
    GraftCaches.releaseAll()
  }
}
