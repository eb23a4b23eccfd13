package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamingCalendar, StreamJoins}

/** Checkpointed file-source → stop → restart: the state stores (dedup
  * keys, open sessions) and source offsets must survive a query restart —
  * the exactly-once contract a production ingestion pipeline relies on
  * when executors or the driver die. Round-2 VERDICT item 8 (the other
  * streaming specs cover micro-batch semantics inside ONE query run; this
  * one kills the query between batches). */
class StreamingRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(seconds: Long) = new Timestamp(t0.getTime + seconds * 1000L)

  private def writeBatch(dir: String, rows: Seq[Ev]): Unit =
    spark.createDataset(rows)(Encoders.product[Ev]).repartition(1)
      .write.mode("append").parquet(dir)

  private def evStream(dir: String): DataFrame =
    spark.readStream
      .schema(Encoders.product[Ev].schema)
      .parquet(dir)

  test("dedupEvents drops re-deliveries across a query restart") {
    val root = Files.createTempDirectory("graft-restart-dedup")
    val (in, out, cp) = (s"$root/in", s"$root/out", s"$root/cp")

    writeBatch(in, Seq(
      Ev(1L, at(0), 10L, "view", 1.0),
      Ev(2L, at(10), 10L, "view", 1.0),
      Ev(2L, at(10), 10L, "view", 1.0))) // intra-batch duplicate

    def run(): Unit = {
      val q = StreamJoins.dedupEvents(evStream(in))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()

    // Upstream replays event 1 and 2 (at-least-once delivery) in NEW
    // files after the query died, plus one genuinely new event.
    writeBatch(in, Seq(
      Ev(1L, at(0), 10L, "view", 1.0),
      Ev(2L, at(10), 10L, "view", 1.0),
      Ev(3L, at(20), 10L, "view", 1.0)))
    run()

    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.sorted === Seq(1L, 2L, 3L),
      s"restart must keep dedup state and not re-emit: got $ids")
  }

  test("sessionizeClosed recovers open-session state across a restart") {
    val root = Files.createTempDirectory("graft-restart-sess")
    val (in, out, cp) = (s"$root/in", s"$root/out", s"$root/cp")
    val gap = 60L * 1000000L // 60 s

    def run(): Unit = {
      val q = StreamingCalendar.sessionizeClosed(evStream(in), gap)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }

    // Two events 10s apart: one OPEN session held in state, no output.
    writeBatch(in, Seq(
      Ev(1L, at(0), 10L, "view", 1.0),
      Ev(2L, at(10), 10L, "view", 1.0)))
    run()

    // After the restart, a far-future event advances the watermark past
    // (open_last + gap): the pre-restart session must flush with the
    // pre-restart start/count — only possible if state was recovered.
    writeBatch(in, Seq(Ev(3L, at(3600), 20L, "view", 1.0)))
    run()

    val rows = spark.read.parquet(out)
      .select("user_id", "session_no", "n_events", "first_event")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows === Set((10L, 1L, 2L, 1L)),
      s"recovered session must span both pre-restart events: got $rows")
  }
}
