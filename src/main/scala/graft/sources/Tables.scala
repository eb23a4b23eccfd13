package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet fixture readers for the shared test tables (TESTDATA.md).
  *
  * All engine queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read
  * one parquet file per table. Reads are plain `spark.read.parquet` so
  * Catalyst keeps full pushdown/pruning freedom — callers project and filter
  * declaratively and the parquet scan receives `PushedFilters`/`ReadSchema`.
  *
  * At cluster scale the same call works on a directory of many files; nothing
  * here assumes a single file.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.parquet` fixtures have shipped `ts` in two vintages:
    * parquet TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts
    * as a raw int64 via `spark.sql.legacy.parquet.nanosAsLong`) and plain
    * TIMESTAMP(MICROS) (loaded as TIMESTAMP_NTZ when not UTC-adjusted).
    * Branch on the LOADED schema so the engine absorbs either vintage and
    * always hands consumers a session-tz `TimestampType` column:
    *  - `LongType`  → legacy nanos fixture: convert nanos → micros timestamp
    *    (fixtures carry no sub-microsecond components; lossless).
    *  - anything else (TIMESTAMP_NTZ / TIMESTAMP) → `cast("timestamp")`;
    *    the session timezone is pinned to UTC (GraftSession), so the NTZ →
    *    LTZ cast is wall-clock identity.
    *
    * NOTE this mutates SESSION-GLOBAL config as a side effect of the read:
    * any later parquet read of nanos timestamps in the same session sees
    * longs instead of failing. The engine mains (Verify/Bench/Explain,
    * TestSpark) also set the flag at session build; the set here is a
    * defensive idempotent repeat for foreign sessions. */
  private def eventsWithTs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    val tsCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    raw.withColumn("ts", tsCol)
  }

  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame    = eventsWithTs(spark, dir)
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every fixture table as a temp view, so the whole engine is
    * drivable from pure SQL (`spark.sql("SELECT ... FROM lineitem ...")`)
    * with no Scala imports — the `events` view goes through the
    * nanos-repair read like every other consumer. Combined with the
    * `zorder_code` function GraftExtensions registers, a SQL-only user
    * has the full surface. Views are session-scoped metadata; re-running
    * on another sfDir repoints them. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else apply(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
