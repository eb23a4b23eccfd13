package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming composition surfaces beyond the stateful operators:
  * stream-static enrichment (stateless per-batch join against a static
  * dim — no watermark, no state store) and the `foreachBatch` escape
  * hatch (arbitrary batch sinks with exactly-once-per-epoch semantics,
  * here a parquet append — the lake-ingest shape). */
class StreamSinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixtureEvents(n: Int): Seq[Ev] = {
    val raw = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(n).collect()
    raw.map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
  }

  test("stream-static join enriches each micro-batch like the batch plan") {
    implicit val sq = spark.sqlContext
    val sess = spark
    import sess.implicits._
    val events = fixtureEvents(300)
    // Static cohort dim: small → broadcast per micro-batch, stateless.
    val cohorts = events.map(_.user_id).distinct.sorted
      .map(u => (u, if (u % 2 == 0) "control" else "treatment"))
      .toDF("user_id", "cohort")

    def enrich(df: DataFrame): DataFrame =
      df.join(broadcast(cohorts), Seq("user_id"))
        .groupBy("cohort", "event_type").agg(count(lit(1)).as("n"))

    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    stream.addData(events)
    val q = enrich(stream.toDF())
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("enrich_out")
      .orderBy("cohort", "event_type").collect().toSeq
    val batch = enrich(spark.createDataset(events)(Encoders.product[Ev]).toDF())
      .orderBy("cohort", "event_type").collect().toSeq
    assert(streamed === batch && streamed.nonEmpty)
  }

  test("foreachBatch appends each epoch to parquet exactly once") {
    implicit val sq = spark.sqlContext
    val out = Files.createTempDirectory("graft-febatch").toString + "/sink"
    val events = fixtureEvents(200)
    val (first, second) = events.splitAt(100)

    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val q = stream.toDF()
      .writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        batch.withColumn("epoch", lit(epochId))
          .write.mode("append").parquet(out)
      }
      .start()
    try {
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
    } finally q.stop()

    val sunk = spark.read.parquet(out)
    assert(sunk.count() === events.size)
    // two epochs landed, and no event was written twice
    assert(sunk.select("epoch").distinct().count() === 2)
    assert(sunk.select("event_id").distinct().count() === events.size)
  }
}
