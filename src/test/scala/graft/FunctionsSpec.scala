package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps
import graft.sources.Tables

/** Native codegen expressions must be bit-identical to the interpreted,
  * SQL-reproducible folds the DuckDB oracles rebuild. */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("codegen Simhash32 equals the HOF vote fold on every document") {
    // the reference formulation: floor(h / 2^j) % 2 bit votes, 2^j packing
    def hofSimhash(hs: org.apache.spark.sql.Column) =
      aggregate(
        sequence(lit(0), lit(31)),
        lit(0L),
        (acc, j) => {
          val bitOf = (h: org.apache.spark.sql.Column) =>
            pmod(floor(h / pow(lit(2.0), j)).cast("long"), lit(2L))
          val vote = aggregate(hs, lit(0L),
            (s, h) => s + when(bitOf(h) === 1, 1L).otherwise(-1L))
          acc + when(vote > 0, pow(lit(2.0), j).cast("long")).otherwise(0L)
        })
    val hs = TextOps.wordHashes(col("text"))
    val mismatches = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(TextOps.simhash32(hs).as("a"), hofSimhash(hs).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(mismatches === 0)
  }
}
