package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Syllabus document sources (SURVEY §2.1).
  *
  * S1: the recursive, pattern-filtered file scan is Spark-native —
  * `binaryFile` with `pathGlobFilter`/`recursiveFileLookup` prunes at
  * file-listing time, the distributed equivalent of the reference's
  * `rglob("UG-*_1A*-*.pdf")` (etl_pipeline.py:32-35).
  *
  * S2/S3: no PDF library ships in this environment, so binary → pages/
  * tables extraction sits behind the pre-extraction contract (SURVEY §7.2):
  * any adapter producing `(doc_id, filename, pages, units_raw,
  * assessments_raw)` plugs in; fixtures provide it as JSONL/parquet.
  * Everything downstream — the entire semantic content of the reference —
  * is engine code over that relation.
  */
object DocSource {

  /** FIXTURES.md §B schema. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("filename", StringType),
    StructField("pages", ArrayType(StringType)),
    StructField("units_raw", ArrayType(ArrayType(StringType))),
    StructField("assessments_raw", ArrayType(ArrayType(StringType)))))

  /** S1: recursive glob scan over a directory of PDFs; yields
    * (path, filename, content) — extraction adapters map `content`. */
  def binaryScan(spark: SparkSession, dir: String,
      glob: String = "UG-*_1A*-*.pdf"): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"),
        element_at(split(col("path"), "/"), -1).as("filename"),
        col("content"))

  /** Pre-extracted documents from JSONL (the test-fixture adapter). */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** Pre-extracted documents from parquet. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S5/S6 (etl_infrastructure.py:160-170, both effectively unimplemented
    * in the reference): the real read path over the serialized JSONL sink —
    * predicate pushdown by column, not filename globbing. `limit(1)`
    * matches the reference's first-match semantics
    * (etl_infrastructure.py:162-165 loads only the first glob hit). */
  def findById(spark: SparkSession, outDir: String, courseId: String): DataFrame =
    spark.read.json(outDir).filter(col("id") === courseId).limit(1)

  def findByPeriod(spark: SparkSession, outDir: String, period: String): DataFrame =
    spark.read.json(outDir).filter(col("period") === period)
}
