package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables
import graft.streaming.StreamingCalendar

/** Windowed-aggregation and multimodal-plumbing queries. The window rollup
  * runs the *same* code as the Structured Streaming path
  * (StreamingCalendar.weeklyTypeCounts) in batch mode, so the streaming
  * operator itself is oracle-checked here; the stateful and mapPartitions
  * operators are not SQL-expressible → rows-only entries (no oracle).
  */
object MediaStreamQueries {

  /** Tumbling 7-day event-time windows (epoch-aligned, like Spark's
    * `window()`), counts + exact decimal value sums. */
  def windowedEventAgg(spark: SparkSession, dir: String): DataFrame =
    StreamingCalendar.weeklyTypeCounts(Tables.events(spark, dir))
      .orderBy("window_start", "event_type")

  val windowedEventAggSql: String =
    """SELECT make_timestamp((epoch_us(ts) // 604800000000) * 604800000000) AS window_start,
      |       event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Multimodal binary-column plumbing, oracle-checkable slice: modality
    * tagging + byte-level metadata on the opaque payload. */
  def binaryMetaExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        length(col("text").cast("binary")).cast("bigint").as("n_bytes"),
        ascii(substring(col("text"), 1, 1)).as("first_byte"))
      .orderBy("doc_id")

  val binaryMetaExtractSql: String =
    """SELECT doc_id,
      |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS modality,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  ascii(substr(text, 1, 1)) AS first_byte
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Rows-only (no SQL oracle): full stub-decode feature extraction via
    * repartition + mapPartitions (the mapInPandas-shaped batch path). */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
      Multimodal.asMedia(Tables.documents(spark, dir), "doc_id", "text"),
      partitions = 8)
      .orderBy("id")
      .toDF()

  /** Rows-only (no SQL oracle): mapGroupsWithState stateful aggregation,
    * exercised in batch mode. */
  def streamUserRunning(spark: SparkSession, dir: String): DataFrame =
    StreamingCalendar.userRunningCounts(Tables.events(spark, dir))
      .orderBy("user_id")
      .toDF()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "windowed_event_agg" -> (windowedEventAgg _),
    "binary_meta_extract" -> (binaryMetaExtract _),
    "multimodal_features" -> (multimodalFeatures _),
    "stream_user_running" -> (streamUserRunning _))

  val oracles: Map[String, String] = Map(
    "windowed_event_agg" -> windowedEventAggSql,
    "binary_meta_extract" -> binaryMetaExtractSql)
}
