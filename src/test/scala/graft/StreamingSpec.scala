package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingCalendar

final case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Structured Streaming: the streaming plan must produce exactly the batch
  * results (same code path), and stateful ops must accumulate across
  * micro-batches. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixtureEvents(n: Int): Seq[Ev] = {
    val raw = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(n).collect()
    raw.map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
  }

  test("streaming weekly window aggregation equals the batch plan") {
    implicit val sq = spark.sqlContext
    val events = fixtureEvents(400)
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    stream.addData(events)

    val q = StreamingCalendar.weeklyTypeCounts(stream.toDF())
      .writeStream.format("memory").queryName("weekly_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("weekly_out")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = StreamingCalendar.weeklyTypeCounts(
        spark.createDataset(events)(Encoders.product[Ev]).toDF())
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming sliding-window aggregation equals the batch plan") {
    implicit val sq = spark.sqlContext
    val events = fixtureEvents(400)
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    stream.addData(events)

    val q = StreamingCalendar.slidingTypeCounts(stream.toDF())
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sliding_out")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = StreamingCalendar.slidingTypeCounts(
        spark.createDataset(events)(Encoders.product[Ev]).toDF())
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed === batch)
    // every event is in exactly 2 overlapping windows: the sliding total
    // count is exactly twice the event count
    val totalN = spark.table("sliding_out").agg(sum("n")).head().getLong(0)
    assert(totalN === 2L * events.size)
  }

  test("flatMapGroupsWithState sessionizer accumulates across micro-batches") {
    implicit val sq = spark.sqlContext
    val gap = 7L * 24 * 3600 * 1000000L
    val events = fixtureEvents(120)
    val (first, second) = events.sortBy(e => (e.ts.getTime, e.event_id)).splitAt(60)
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)

    val q = StreamingCalendar.sessionizeStateful(stream.toDF(), gap)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
    } finally q.stop()

    // a re-emitted tail session only grows: latest = max(n_events) per key
    val streamed = spark.table("sessions_out")
      .groupBy("user_id", "session_no").agg(max("n_events").as("n_events"))
    val batch = StreamingCalendar.sessionizeStateful(
        spark.createDataset(events)(Encoders.product[Ev]).toDF(), gap)
      .select("user_id", "session_no", "n_events")
    assert(streamed.count() === batch.count())
    val mismatch = streamed.as("a").join(batch.as("b"), Seq("user_id", "session_no"))
      .filter(col("a.n_events") =!= col("b.n_events")).count()
    assert(mismatch === 0)
  }

  test("EventTimeTimeout flushes the open tail session once the watermark passes") {
    implicit val sq = spark.sqlContext
    val gap = 7L * 24 * 3600 * 1000000L
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(hours: Long) = new Timestamp(t0.getTime + hours * 3600 * 1000L)
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)

    val q = StreamingCalendar.sessionizeClosed(stream.toDF(), gap)
      .writeStream.format("memory").queryName("closed_out")
      .outputMode("append").start()
    try {
      // user 10: two events an hour apart — one open session, no output yet
      stream.addData(Seq(
        Ev(1L, at(0), 10L, "view", 1.0), Ev(2L, at(1), 10L, "view", 1.0)))
      q.processAllAvailable()
      assert(spark.table("closed_out").count() === 0)
      // 30 days later another user's event advances the watermark far past
      // user 10's (end + gap) → the tail session times out and flushes
      stream.addData(Seq(Ev(3L, at(30L * 24), 20L, "view", 1.0)))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("closed_out")
      .select("user_id", "session_no", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set((10L, 1L, 2L)))
  }

  test("stream-stream interval join equals the batch plan") {
    implicit val sq = spark.sqlContext
    val events = fixtureEvents(200).map(e => Ev(e.event_id, e.ts, e.user_id % 10, e.event_type, e.value))
    val sa = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val sb = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val (h1, h2) = events.splitAt(100)

    val q = graft.streaming.StreamJoins.followWithin(
        sa.toDF().select("user_id", "event_id", "ts"),
        sb.toDF().select("user_id", "event_id", "ts"), followSeconds = 3600L)
      .writeStream.format("memory").queryName("sjoin_out")
      .outputMode("append").start()
    try {
      sa.addData(h1); sb.addData(h1)
      q.processAllAvailable()
      sa.addData(h2); sb.addData(h2)
      q.processAllAvailable()
    } finally q.stop()

    val ev = spark.createDataset(events)(Encoders.product[Ev])
      .select("user_id", "event_id", "ts")
    val batch = graft.streaming.StreamJoins.followWithin(ev, ev, 3600L)
    val streamed = spark.table("sjoin_out")
    assert(streamed.count() === batch.count())
    assert(batch.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("left-outer interval join emits NULL rows only after the watermark closes the window") {
    implicit val sq = spark.sqlContext
    val sa = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val sb = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    def ev(id: Long, sec: Long, user: Long) =
      Ev(id, new java.sql.Timestamp(sec * 1000L), user, "view", 1.0)

    val q = graft.streaming.StreamJoins.followWithinOuter(
        sa.toDF().select("user_id", "event_id", "ts"),
        sb.toDF().select("user_id", "event_id", "ts"), followSeconds = 60L)
      .writeStream.format("memory").queryName("souter_out")
      .outputMode("append").start()
    try {
      // All times offset well past epoch 0: the initial watermark IS 0,
      // and rows at event-time 0 are discarded as late before they ever
      // reach the join state (cost a debugging session to learn).
      val base = 10000L
      // User 1: follower inside the 60s window. User 2: no follower EVER.
      sa.addData(Seq(ev(1, base, 1), ev(2, base + 100, 2)))
      sb.addData(Seq(ev(3, base + 30, 1)))
      q.processAllAvailable()
      val early = spark.table("souter_out").collect()
      assert(!early.exists(r => r.getLong(0) == 2L),
        "user 2's unmatched row must NOT emit before the watermark closes its window")

      // Push the watermark far past base+100+60 (+1h watermark delay).
      sa.addData(Seq(ev(8, base + 20000, 9)))
      sb.addData(Seq(ev(9, base + 20000, 9)))
      q.processAllAvailable()
      sa.addData(Seq(ev(10, base + 40000, 9)))
      sb.addData(Seq(ev(11, base + 40000, 9)))
      q.processAllAvailable()

      val rows = spark.table("souter_out").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(rows.contains((1L, 1L, 3L)), "matched pair must emit")
      assert(rows.contains((2L, 2L, -1L)),
        s"user 2 must emit with NULL follower once the watermark passes; got $rows")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark collapses re-deliveries across micro-batches") {
    implicit val sq = spark.sqlContext
    val events = fixtureEvents(80)
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)

    val q = graft.streaming.StreamJoins.dedupEvents(stream.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(events.take(50))
      q.processAllAvailable()
      // re-deliver an overlapping window — the 30 repeats must be dropped
      stream.addData(events.drop(20))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("dedup_out")
    assert(out.count() === events.length.toLong)
    assert(out.select("event_id").distinct().count() === events.length.toLong)
  }

  test("stateful top-k refines across micro-batches toward the global top-k") {
    implicit val sq = spark.sqlContext
    val events = fixtureEvents(200)
    val (first, second) = events.splitAt(100)
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)

    val q = StreamingCalendar.topKPerUser(stream.toDF(), k = 3)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("update").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
    } finally q.stop()

    // a rank's value only improves, so the max emission per (user, rank)
    // is the final state — and must equal the batch run over all data
    val last = spark.table("topk_out")
      .groupBy("user_id", "rank").agg(max("value").as("value"))
    val batch = StreamingCalendar.topKPerUser(
        spark.createDataset(events)(Encoders.product[Ev]).toDF(), k = 3)
      .select(col("user_id"), col("rank"), col("value"))
    val mismatch = last.as("a").join(batch.as("b"), Seq("user_id", "rank"))
      .filter(col("a.value") =!= col("b.value")).count()
    assert(mismatch === 0)
    assert(last.count() === batch.count())
  }

  test("mapGroupsWithState accumulates across micro-batches") {
    implicit val sq = spark.sqlContext
    val events = fixtureEvents(100)
    val (first, second) = events.splitAt(50)
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)

    val q = StreamingCalendar.userRunningCounts(stream.toDF())
      .writeStream.format("memory").queryName("running_out")
      .outputMode("update").start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
    } finally q.stop()

    // last emitted state per user must equal the total count over all data
    val last = spark.table("running_out")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
    val expected = spark.createDataset(events)(Encoders.product[Ev])
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val mismatch = last.as("a").join(expected.as("b"), Seq("user_id"))
      .filter(col("a.n_events") =!= col("b.n_events")).count()
    assert(mismatch === 0)
    assert(last.count() === expected.count())
  }
}
