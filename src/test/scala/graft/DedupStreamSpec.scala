package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupStream

/** Streaming ingest dedup: the ValueState "seen" marker must survive
  * across micro-batches (a key that emitted in batch 1 must emit NOTHING
  * when batch 2 replays it — the at-least-once replay guard), and the
  * batch one-shot run must equal the relational keep-first semantics
  * regardless of row order. */
class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixtureEvents(n: Int): Seq[Ev] = {
    val raw = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(n).collect()
    raw.map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
  }

  test("cross-batch duplicates are dropped and the stream equals the batch run") {
    // Stream in (ts, event_id) order so each key's first arrival is also
    // its global (ts, event_id) minimum — then streaming first-seen and
    // the batch fold must agree exactly.
    val events = fixtureEvents(300).sortBy(e => (e.ts.getTime, e.event_id))
    val (first, second) = events.splitAt(150)
    val replayed = second ++ first.take(50) // batch 2 replays 50 batch-1 rows
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)

    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString
    val q = DedupStream.firstSeen(stream.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(replayed)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("dedup_out")
    val batch = DedupStream.firstSeen(
      spark.createDataset(events)(Encoders.product[Ev]).toDF()).toDF()
    // One emission per key total — replayed keys must NOT re-emit.
    assert(streamed.count() === streamed.select("user_id", "event_type").distinct().count())
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.count() > 0)
  }

  test("batch fold is row-order insensitive") {
    val events = fixtureEvents(200)
    def run(es: Seq[Ev]) = DedupStream.firstSeen(
      spark.createDataset(es)(Encoders.product[Ev]).toDF()).toDF()
    val a = run(events)
    val b = run(scala.util.Random.javaRandomToRandom(new java.util.Random(11)).shuffle(events))
    assert(a.exceptAll(b).count() === 0)
    assert(a.count() === b.count())
    assert(a.count() > 0)
  }
}
