package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin
import graft.sources.Tables

/** saltedJoin must be a pure distribution rewrite: row-identical to the
  * plain equi-join for any salt count, including salts=1. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("salted join is row-identical to the plain join") {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val plain = cust.join(nat, col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "n_name")
    Seq(1, 8).foreach { salts =>
      val salted = SkewJoin.saltedJoin(cust, nat,
          col("c_nationkey"), col("n_nationkey"), col("c_custkey"), salts)
        .select("c_custkey", "n_name")
      assert(salted.count() === plain.count(), s"salts=$salts row count")
      assert(salted.exceptAll(plain).count() === 0, s"salts=$salts extra rows")
      assert(plain.exceptAll(salted).count() === 0, s"salts=$salts missing rows")
    }
  }

  test("distinctCountByKey equals countDistinct") {
    val ev = Tables.events(spark, dir)
    val got = SkewJoin.distinctCountByKey(ev, col("user_id"), col("event_type"),
      keyName = "user_id")
    val want = ev.groupBy("user_id")
      .agg(countDistinct("event_type").as("n_distinct"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }
}
