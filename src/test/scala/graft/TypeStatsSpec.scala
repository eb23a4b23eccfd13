package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TypeStats

/** transformWithState (named-state API): the processor's ValueState +
  * MapState must accumulate across micro-batches (RocksDB-backed in
  * streaming mode) and the final per-user emission must equal the one-shot
  * batch run over the same rows — the streaming/batch differential the
  * other stateful operators also pin. */
class TypeStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixtureEvents(n: Int): Seq[Ev] = {
    val raw = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(n).collect()
    raw.map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
  }

  test("named state accumulates across micro-batches and matches the batch run") {
    implicit val sq = spark.sqlContext
    val events = fixtureEvents(200)
    val (first, second) = events.splitAt(100)
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)

    val ckpt = Files.createTempDirectory("graft-tws-ckpt").toString
    val q = TypeStats.userTypeStats(stream.toDF())
      .writeStream.format("memory").queryName("tws_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
    } finally q.stop()

    // Update mode: a user's LAST emission (largest n_events — the count
    // only grows) is the final state.
    val last = spark.table("tws_out")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_types"), col("type_counts"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.n_types"), col("s.type_counts"))
    val batch = TypeStats.userTypeStats(
        spark.createDataset(events)(Encoders.product[Ev]).toDF())
      .toDF()
    assert(last.count() === batch.count())
    assert(last.exceptAll(batch).count() === 0)
    assert(batch.count() > 0)
  }

  test("repeated batch runs in one session are isolated (no state carryover)") {
    // Round-4 VERDICT item 5: a long-lived session runs this stateful
    // query next to 128 others — if consecutive invocations shared any
    // state-store/RocksDB path, counts would double on the second run.
    // Each batch TransformWithStateExec must get a FRESH store: back-to-
    // back runs (with another stateful query interleaved, like the
    // driver's Verify loop) must produce identical rows.
    val events = fixtureEvents(200)
    def run() = TypeStats.userTypeStats(
      spark.createDataset(events)(Encoders.product[Ev]).toDF()).toDF()
    val first = run().collect().toSeq.sortBy(_.getLong(0))
    // Interleave a different stateful pipeline before the re-run.
    assert(graft.queries.MediaStreamQueries
      .queries("sessionize_stateful")(spark, "/root/testdata/sf0.001").count() > 0)
    val second = run().collect().toSeq.sortBy(_.getLong(0))
    assert(first == second)
    assert(first.nonEmpty)
  }

  test("per-user profile is order-insensitive in batch mode") {
    val events = fixtureEvents(150)
    val a = TypeStats.userTypeStats(
      spark.createDataset(events)(Encoders.product[Ev]).toDF()).toDF()
    val b = TypeStats.userTypeStats(
      spark.createDataset(scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(events))(Encoders.product[Ev]).toDF()).toDF()
    assert(a.exceptAll(b).count() === 0)
    assert(a.count() === b.count())
  }
}
