package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables
import graft.operators.Calendar

/** Core relational queries over the shared fixture tables, each with a
  * DuckDB oracle (SURVEY §5.2.1). Naming ties back to SURVEY §2 operator ids.
  *
  * Float-parity notes (binding for every oracle in this repo):
  *  - double SUMs are computed as `SUM(CAST(x AS DECIMAL))` then cast back to
  *    double — decimal addition is exact and associative, so Spark's
  *    partition-parallel partial aggregation and DuckDB's sequential sum
  *    agree bit-for-bit; a raw double SUM would be order-dependent.
  *  - doubles are never formatted into strings (Java vs DuckDB repr differ).
  *  - every query ends in a total ORDER BY so the written parquet is
  *    deterministic regardless of how the driver compares.
  */
object Relational {

  /** A1-A4 flagship: weekly calendar over `events` (week = 1-based week
    * since 2024-01-01, the generator's epoch). Reference:
    * etl_pipeline.py:74-123 (flatten, group, sort, join). */
  def calendarWeekly(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    Calendar.weekly(
      e,
      week = (floor(datediff(col("ts").cast("date"), to_date(lit("2024-01-01"))) / 7) + 1).cast("int"),
      sortKey = col("event_id"),
      line = concat(lit("•"), col("event_id"), lit(": "), col("event_type")))
  }

  val calendarWeeklySql: String =
    """SELECT week, COUNT(*) AS n_events, STRING_AGG(line, CHR(10) ORDER BY event_id) AS content
      |FROM (SELECT CAST(FLOOR(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0) + 1 AS INT) AS week,
      |             event_id, '•' || event_id || ': ' || event_type AS line
      |      FROM events) t
      |GROUP BY week ORDER BY week""".stripMargin

  /** TPC-H Q1-shaped pricing summary: scan-heavy groupBy on low-cardinality
    * keys — at 100 TB this is all map-side partial aggregation; the shuffle
    * moves only |groups| x |partitions| rows. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // Exact decimal arithmetic: money columns are 2-decimal values, so the
    // decimal products/sums are exact on both engines; a double SUM (or a
    // double-product-then-round) would diverge on rounding ties.
    val price = col("l_extendedprice").cast(DecimalType(12, 2))
    val disc  = col("l_discount").cast(DecimalType(4, 2))
    val tax   = col("l_tax").cast(DecimalType(4, 2))
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(DecimalType(12, 2))).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
        sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "calendar_weekly" -> (calendarWeekly _),
    "pricing_summary" -> (pricingSummary _))

  val oracles: Map[String, String] = Map(
    "calendar_weekly" -> calendarWeeklySql,
    "pricing_summary" -> pricingSummarySql)
}
