package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Malformed-record handling on the ingest path — at 100 TB there WILL
  * be broken lines, and the difference between PERMISSIVE (quarantine
  * via _corrupt_record), DROPMALFORMED (silent loss, counted), and
  * FAILFAST (fail the batch) is an operational decision the engine must
  * support deliberately. Pins all three parser modes plus the quarantine
  * accounting identity: clean + corrupt == total lines. */
class CsvBadRecordsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", LongType),
    StructField("_corrupt_record", StringType)))

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("graft-badcsv")
    val lines = Seq(
      "1,alpha,10",
      "2,beta,not_a_number", // bad long
      "3,gamma,30",
      "4,delta",             // missing column
      "5,eps,50")
    Files.write(dir.resolve("part.csv"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    dir.toString
  }

  test("PERMISSIVE quarantines corrupt rows; accounting identity holds") {
    val dir = writeFixture()
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache() // corrupt-record column requires a materialized parse pass
    val total = df.count()
    val corrupt = df.filter(col("_corrupt_record").isNotNull).count()
    val clean = df.filter(col("_corrupt_record").isNull).count()
    assert(total === 5)
    assert(corrupt === 2, "bad long + short row must both quarantine")
    assert(clean + corrupt === total)
    // quarantined rows keep the RAW line for replay/repair
    val rawLines = df.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").collect().map(_.getString(0)).toSet
    assert(rawLines === Set("2,beta,not_a_number", "4,delta"))
    df.unpersist()
  }

  test("DROPMALFORMED keeps only parseable rows") {
    val dir = writeFixture()
    val df = spark.read
      .schema(StructType(schema.fields.filterNot(_.name == "_corrupt_record")))
      .option("mode", "DROPMALFORMED").csv(dir)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 5L))
  }

  test("FAILFAST refuses the batch") {
    val dir = writeFixture()
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read
        .schema(StructType(schema.fields.filterNot(_.name == "_corrupt_record")))
        .option("mode", "FAILFAST").csv(dir).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }
}
