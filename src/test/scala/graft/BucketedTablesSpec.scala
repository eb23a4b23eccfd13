package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.BucketedTables
import graft.sources.Tables

/** The bucketed write path must actually buy the shuffle-free join: two
  * tables bucketed on the join key with equal bucket counts join with no
  * Exchange anywhere in the physical plan, and the result matches the
  * plain (shuffling) join.
  */
class BucketedTablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("co-bucketed orders/lineitem join has no Exchange and matches plain join") {
    val tmp = Files.createTempDirectory("graft_bucketed").toString
    val orders = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey AS o_orderkey", "l_quantity")
    BucketedTables.writeBucketed(orders, "orders_b", "o_orderkey", 8, s"$tmp/orders")
    BucketedTables.writeBucketed(lineitem, "lineitem_b", "o_orderkey", 8, s"$tmp/lineitem")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedTables.cobucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"co-bucketed join still shuffles:\n$plan")

      val plain = orders.join(lineitem, "o_orderkey")
      assert(joined.count() === plain.count())
      // Decimal sums: double addition is order-dependent across plans.
      val sums = Seq("sum(cast(o_totalprice AS DECIMAL(18,2)))",
        "sum(cast(l_quantity AS DECIMAL(18,2)))")
      val a = joined.selectExpr(sums: _*).head()
      val b = plain.selectExpr(sums: _*).head()
      assert(a === b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitioned write prunes non-matching partitions at scan time") {
    val tmp = Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, dir).select("event_id", "event_type", "value")
    BucketedTables.writePartitioned(ev, s"$tmp/events_p", "event_type")
    val one = spark.read.parquet(s"$tmp/events_p")
      .filter(col("event_type") === "click")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filter:\n$plan")
    assert(!plan.contains("PartitionFilters: []"),
      s"partition filter not pushed:\n$plan")
    val want = ev.filter(col("event_type") === "click").count()
    assert(one.count() === want)
    assert(want > 0)
  }
}
