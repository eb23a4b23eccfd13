package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The SQL-only door: Tables.registerViews + the zorder_code function
  * registration give a no-Scala user the full fixture surface through
  * spark.sql — including the nanos-repaired events view and re-pointing
  * views at a different scale factor. */
class SqlCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every fixture table is queryable via pure SQL after registerViews") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT COUNT(*) FROM $n").head().getLong(0) > 0L, n)
    }
    // events goes through the nanos repair: ts must be a usable timestamp
    val d = spark.sql(
      "SELECT CAST(MIN(ts) AS DATE) AS d0, COUNT(DISTINCT user_id) AS u FROM events").head()
    assert(d.getDate(0).toString === "2024-01-01")
    assert(d.getLong(1) > 0L)
    // the registered zorder_code function composes with the views
    val z = spark.sql(
      """SELECT MAX(zorder_code(l_partkey, l_suppkey)) AS mz FROM lineitem""").head()
    assert(z.getLong(0) > 0L)
  }

  test("re-registering on another sfDir repoints the views") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    val n1 = spark.sql("SELECT COUNT(*) FROM orders").head().getLong(0)
    Tables.registerViews(spark, "/root/testdata/sf0.01")
    val n2 = spark.sql("SELECT COUNT(*) FROM orders").head().getLong(0)
    assert(n2 > n1, s"sf0.01 view should see more orders: $n1 vs $n2")
    Tables.registerViews(spark, "/root/testdata/sf0.001")
  }
}
