package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AnomalyStream

/** Per-user inter-arrival anomaly flags: the (lastTs, n, Σgap, Σgap²)
  * ValueState must carry across micro-batches (a gap straddling the
  * batch boundary still counts, and prior-gap statistics accumulated in
  * batch 1 gate batch-2 flags), and the batch one-shot fold must be
  * row-order insensitive (the processor sorts its buffer). */
class AnomalyStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixtureEvents(n: Int): Seq[Ev] = {
    val raw = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(n).collect()
    raw.map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
  }

  test("cross-batch state carries and the stream equals the one-shot batch run") {
    // Time-ordered batches: per-user arrival order inside the stream then
    // matches the one-shot sort, so the outputs must agree exactly.
    val events = fixtureEvents(800).sortBy(e => (e.ts.getTime, e.event_id))
    val (first, second) = events.splitAt(400)
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)

    val ckpt = Files.createTempDirectory("graft-anom-ckpt").toString
    val q = AnomalyStream.gapAnomalies(stream.toDF())
      .writeStream.format("memory").queryName("anom_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("anom_out")
    val batch = AnomalyStream.gapAnomalies(
      spark.createDataset(events)(Encoders.product[Ev]).toDF()).toDF()
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    assert(batch.count() > 0)
  }

  test("batch fold is row-order insensitive and needs 5 prior gaps") {
    val events = fixtureEvents(600)
    def run(es: Seq[Ev]) = AnomalyStream.gapAnomalies(
      spark.createDataset(es)(Encoders.product[Ev]).toDF()).toDF()
    val a = run(events)
    val b = run(scala.util.Random.javaRandomToRandom(new java.util.Random(7)).shuffle(events))
    assert(a.exceptAll(b).count() === 0)
    assert(a.count() === b.count())
    import org.apache.spark.sql.functions.min
    assert(a.count() > 0)
    val minPrior = a.agg(min("n_prior")).collect()(0).getLong(0)
    assert(minPrior >= 5)
  }

  test("a cross-batch late event never folds a negative gap into the running stats") {
    import java.sql.Timestamp
    val t0 = 1704067200000L
    def ev(id: Long, offSec: Long) = Ev(id, new Timestamp(t0 + offSec * 1000), 1L, "view", 1.0)
    // Steady 10 s cadence, then a late straggler from before the carried
    // last ts, then more steady events. With the guard the stats stay
    // (n grows by on-time gaps only) and the steady events never flag;
    // an unguarded fold would push S negative and skew every later test.
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-anomaly-late-ckpt").toString
    val q = AnomalyStream.gapAnomalies(stream.toDF())
      .writeStream.format("memory").queryName("anomaly_late_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      stream.addData((1L to 8L).map(i => ev(i, i * 10)))
      q.processAllAvailable()
      stream.addData(Seq(ev(100L, 5L))) // late: before the carried t=80 event
      q.processAllAvailable()
      stream.addData((9L to 12L).map(i => ev(i, i * 10)))
      q.processAllAvailable()
    } finally q.stop()
    // All gaps that were folded are exactly 10 s → nothing deviates 3σ.
    assert(spark.table("anomaly_late_out").count() === 0)
  }

  test("at-least-once replay of the exact frontier row is a no-op (round-8 ADVICE)") {
    import java.sql.Timestamp
    val t0 = 1704067200000L
    def ev(id: Long, offSec: Long) = Ev(id, new Timestamp(t0 + offSec * 1000), 1L, "view", 1.0)
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-anomaly-replay-ckpt").toString
    val q = AnomalyStream.gapAnomalies(stream.toDF())
      .writeStream.format("memory").queryName("anomaly_replay_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // Steady 10 s cadence to build stats past the 5-gap gate.
      stream.addData((1L to 8L).map(i => ev(i, i * 10)))
      q.processAllAvailable()
      // Redeliver the frontier event (same ts AND event_id): with a
      // ts-only >= guard it folds a ZERO gap into (n, S, SS) — the later
      // steady 10 s gaps then deviate from the corrupted mean and flag.
      stream.addData(Seq(ev(8L, 80)))
      q.processAllAvailable()
      stream.addData((9L to 14L).map(i => ev(i, i * 10)))
      q.processAllAvailable()
    } finally q.stop()
    // Every real gap is exactly 10 s → zero flags iff the replay was dropped.
    assert(spark.table("anomaly_replay_out").count() === 0)
  }
}
