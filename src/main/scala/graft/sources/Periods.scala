package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Period calendar dimension (SURVEY §1.1 last row): period → start/end
  * dates, mirroring /root/reference/config.json. The reference loads this
  * config and then never uses it (dead code, etl_infrastructure.py:189-207,
  * output dates are hard-coded constants); here the dimension is real and
  * broadcast-joined by the serializer (flagged semantic fix, SURVEY §7.3).
  */
object Periods {
  val schema: StructType = StructType(Seq(
    StructField("period_key", StringType),
    StructField("start_date", StringType),
    StructField("end_date", StringType)))

  /** The reference's shipped config.json content. */
  def default(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(Row("2025-2", "2025-08-25", "2025-12-06")),
      schema)

  /** Load a config.json-shaped file: `{ "<period>": {"start_date": ...,
    * "end_date": ...}, ... }`. The map keys become rows (tiny dimension —
    * a driver-side pivot of the single JSON object). */
  def load(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", true).json(path)
    val row = raw.head()
    val rows = raw.schema.fields.toSeq.map { f =>
      val s = row.getStruct(row.fieldIndex(f.name))
      Row(f.name, s.getAs[String]("start_date"), s.getAs[String]("end_date"))
    }
    spark.createDataFrame(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
  }
}
