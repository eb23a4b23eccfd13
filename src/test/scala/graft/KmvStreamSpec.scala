package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.KmvStream

/** Streaming KMV sketch: the sorted k-min ValueState must merge across
  * micro-batches idempotently (set semantics — replays can't move the
  * estimate), the final per-key emission must equal the batch one-shot,
  * and an under-full sketch must report the EXACT distinct count. */
class KmvStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixtureEvents(n: Int): Seq[Ev] = {
    val raw = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(n).collect()
    raw.map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
  }

  test("cross-batch merge with replay equals the batch one-shot") {
    val events = fixtureEvents(600)
    val (first, second) = events.splitAt(300)
    val replayed = second ++ first.take(150) // batch 2 replays batch-1 rows
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-kmv-ckpt").toString
    val q = KmvStream.distinctUsers(stream.toDF())
      .writeStream.format("memory").queryName("kmv_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(replayed)
      q.processAllAvailable()
    } finally q.stop()

    // k_eff only grows; the max-k_eff emission per key is the final state.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    val streamedFinal = spark.table("kmv_out")
      .withColumn("mx", max("k_eff").over(w))
      .filter(col("k_eff") === col("mx"))
      .select("event_type", "k_eff", "est_distinct").distinct()
    val batch = KmvStream.distinctUsers(
      spark.createDataset(events)(Encoders.product[Ev]).toDF()).toDF()
    assert(streamedFinal.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamedFinal).count() === 0)
    assert(batch.count() > 0)
  }

  test("under-full sketch reports the exact distinct count") {
    import java.sql.Timestamp
    // 10 distinct users (< k=64) across two types with duplicates.
    val events = (1 to 40).map(i =>
      Ev(i.toLong, new Timestamp(i * 1000L), (i % 10).toLong,
        if (i % 2 == 0) "view" else "purchase", 1.0))
    val got = KmvStream.distinctUsers(
        spark.createDataset(events)(Encoders.product[Ev]).toDF())
      .toDF().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("view") === ((5L, 5.0)))     // users 0,2,4,6,8
    assert(got("purchase") === ((5L, 5.0))) // users 1,3,5,7,9
  }

  test("batch fold is row-order insensitive") {
    val events = fixtureEvents(400)
    def run(es: Seq[Ev]) = KmvStream.distinctUsers(
        spark.createDataset(es)(Encoders.product[Ev]).toDF())
      .toDF().collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val a = run(events)
    val b = run(scala.util.Random.javaRandomToRandom(new java.util.Random(11)).shuffle(events))
    assert(a === b)
  }

  test("negative and huge ids hash into [0, Mod) — no Long-wrap skew (round-8 ADVICE)") {
    import java.sql.Timestamp
    // Ids that overflow `uid * A` as a raw Long (the old affine wrapped
    // silently and could go NEGATIVE, skewing tau); the reduced floorMod
    // affine must agree with exact modular arithmetic for every id.
    val ids = Seq(-1L, -987654321L, Long.MinValue + 7, Long.MaxValue - 3, 123L)
    val events = ids.zipWithIndex.map { case (uid, i) =>
      Ev(i.toLong + 1, new Timestamp(1000L * (i + 1)), uid, "view", 1.0) }
    val got = KmvStream.distinctUsers(
        spark.createDataset(events)(Encoders.product[Ev]).toDF())
      .toDF().collect().map(r => (r.getLong(1), r.getDouble(2))).head
    // 5 distinct ids, sketch under-full → exact count. The old wrap-prone
    // hash could collide/misorder but still count 5 here, so ALSO pin the
    // hash values themselves against BigInt ground truth.
    assert(got === ((5L, 5.0)))
    val m = graft.functions.PolyHash.Mod
    ids.foreach { uid =>
      val h = Math.floorMod(Math.floorMod(uid, m) * KmvStream.A + KmvStream.B, m)
      val truth = ((BigInt(uid) * KmvStream.A + KmvStream.B) mod BigInt(m)).toLong
      assert(h === truth, s"uid=$uid")
      assert(h >= 0 && h < m)
    }
  }
}
