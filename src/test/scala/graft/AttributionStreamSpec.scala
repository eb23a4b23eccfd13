package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AttributionStream

/** Streaming last-touch attribution: purchases in a LATER micro-batch
  * must attribute to clicks from an EARLIER batch (the ValueState carries
  * the last click across batches), and the batch one-shot must equal the
  * relational as-of semantics regardless of row order. */
class AttributionStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixtureEvents(n: Int): Seq[Ev] = {
    val raw = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter("event_type IN ('click', 'purchase')")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(n).collect()
    raw.map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
  }

  test("purchases attribute to clicks from earlier batches; stream equals batch") {
    // Split on event time so batch 2's purchases have their latest click
    // in batch 1 for at least some users — the cross-batch state path.
    val events = fixtureEvents(400).sortBy(e => (e.ts.getTime, e.event_id))
    val (first, second) = events.splitAt(200)
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)

    val ckpt = Files.createTempDirectory("graft-attr-ckpt").toString
    val q = AttributionStream.lastTouch(stream.toDF())
      .writeStream.format("memory").queryName("attr_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("attr_out")
    val batch = AttributionStream.lastTouch(
      spark.createDataset(events)(Encoders.product[Ev]).toDF()).toDF()
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0,
      "time-ordered two-batch stream must equal the one-shot batch run")
    assert(batch.filter("click_id IS NOT NULL").count() > 0)
  }

  test("batch run is row-order insensitive and matches the as-of rules") {
    val events = fixtureEvents(300)
    def run(es: Seq[Ev]) = AttributionStream.lastTouch(
      spark.createDataset(es)(Encoders.product[Ev]).toDF()).toDF()
    val a = run(events)
    val b = run(scala.util.Random.javaRandomToRandom(new java.util.Random(7)).shuffle(events))
    assert(a.exceptAll(b).count() === 0)
    assert(a.count() === b.count())
    // Every purchase row appears exactly once, attributed or not.
    assert(a.count() === events.count(_.event_type == "purchase"))
  }
}
