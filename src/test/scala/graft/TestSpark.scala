package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites — built through
  * [[GraftSession]] so every spec runs with the production wiring
  * (UTC, nanosAsLong, and the GraftExtensions Catalyst additions:
  * RangeJoinRewrite + BucketedJoinStrategy). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(cores = 4)
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
