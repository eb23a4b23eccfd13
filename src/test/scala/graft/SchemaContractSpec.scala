package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Fixture-schema contract (round-6 VERDICT item 2).
  *
  * Round 6 lost 45/165 queries to a silent driver-side regeneration of
  * `events.parquet` (`ts` drifted TIMESTAMP(NANOS) → timestamp[us]); nothing
  * in `sbt test` named the drifted column. This spec pins the ENGINE-LOADED
  * schema of all 10 fixture tables at sf0.001 — i.e. what `Tables.*` hands to
  * every query, after any vintage repair — so the next testdata regeneration
  * fails ONE cheap test with a message naming the table and column, not 45
  * queries at driver time.
  *
  * `Tables.events` is intentionally vintage-absorbing (nanos-int64 OR
  * micros-timestamp fixtures both load as TimestampType); the contract here
  * asserts the POST-repair schema, which is the engine's stable surface.
  */
class SchemaContractSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int")
  )

  Tables.names.foreach { table =>
    test(s"fixture table '$table' matches the pinned schema contract") {
      val df = table match {
        case "events" => Tables.events(spark, sfDir)
        case t        => Tables(spark, sfDir, t)
      }
      val actual = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq
      val exp = expected(table)
      val drift =
        exp.filterNot(actual.contains).map { case (n, t) =>
          actual.find(_._1 == n) match {
            case Some((_, at)) => s"column '$n': expected $t, loaded $at"
            case None          => s"column '$n' ($t) missing from fixture"
          }
        } ++
        actual.filterNot { case (n, _) => exp.exists(_._1 == n) }
          .map { case (n, t) => s"unexpected new column '$n' ($t)" }
      assert(drift.isEmpty,
        s"\nfixture schema drift in $table.parquet:\n  ${drift.mkString("\n  ")}" +
        s"\nIf the driver regenerated testdata, update SchemaContractSpec AND " +
        s"audit every consumer of the drifted column(s) (see Tables.eventsWithTs).")
      assert(actual.map(_._1) == exp.map(_._1),
        s"$table column ORDER drifted: ${actual.map(_._1)} vs ${exp.map(_._1)}")
    }
  }
}
