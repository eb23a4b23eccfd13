package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property check for `weighted_median_by_group` through the REAL query
  * path: random lineitem fixtures (gridded prices to force ties,
  * fractional quantities) written as parquet, the query run against
  * them, and every group's answer compared to the brute-force weighted
  * median computed in plain Scala — smallest price whose cumulative
  * weight reaches half the group total. */
class WeightedMedianPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("query result equals brute-force weighted median on random fixtures") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val rows = (1 to 500).map { _ =>
        val flag = Seq("A", "N", "R")(rnd.nextInt(3))
        val price = (rnd.nextInt(40) + 1) * 25.0 + (if (rnd.nextBoolean()) 0.5 else 0.0)
        val qty = rnd.nextInt(50) + 1.0
        (flag, price, qty)
      }
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-wm-$trial").toString
      import spark.implicits._
      rows.toDF("l_returnflag", "l_extendedprice", "l_quantity")
        .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")

      val got = graft.queries.Relational.weightedMedianByGroup(spark, tmp)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

      val expected = rows.groupBy(_._1).map { case (flag, rs) =>
        // Exact-cent arithmetic mirrors the query's DECIMAL(12,2) casts.
        val levels = rs.groupBy(r => BigDecimal(r._2).setScale(2))
          .map { case (p, g) => p -> g.map(r => BigDecimal(r._3).setScale(2)).sum }
          .toSeq.sortBy(_._1)
        val total = levels.map(_._2).sum
        var cum = BigDecimal(0)
        val median = levels.find { case (_, w) => cum += w; cum * 2 >= total }.get._1
        flag -> median.toDouble
      }
      assert(got.keySet === expected.keySet)
      expected.foreach { case (flag, m) =>
        assert(got(flag) === m, s"trial $trial group $flag")
      }
      GraftCaches.releaseAll()
    }
  }
}
