package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FunnelStream

/** Event-time funnel across a QUERY RESTART: the ListState buffer, the
  * registered timers, and the fold state all live in the RocksDB
  * checkpoint — killing the query between micro-batches and restarting
  * from the same checkpoint must neither lose buffered rows nor
  * double-fold flushed ones. (StreamingRestartSpec covers the
  * ordered-arrival family; this is the event-time edition with timers.) */
class FunnelEventTimeRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val H = 3600000000L // 1 h in micros

  private def ev(id: Long, tsUs: Long, uid: Long, tpe: String): Ev =
    Ev(id, new Timestamp(tsUs / 1000L), uid, tpe, 1.0)

  private def writeBatch(dir: String, rows: Seq[Ev]): Unit =
    spark.createDataset(rows)(Encoders.product[Ev]).repartition(1)
      .write.mode("append").parquet(dir)

  /** One file per micro-batch, so each writeBatch below is its own
    * trigger and the second watermark carrier's DATA batch (not a racy
    * no-data batch) is what fires the flush timers. */
  private def evStream(dir: String): DataFrame =
    spark.readStream.schema(Encoders.product[Ev].schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)

  test("buffer, timers, and fold state survive a restart; final counts equal the one-shot") {
    val root = Files.createTempDirectory("graft-funnel-et-restart")
    val (in, out, cp) = (s"$root/in", s"$root/out", s"$root/cp")
    val tol = 24L * H

    def run(): Unit = {
      val q = FunnelStream.funnelEventTime(evStream(in), tol, "48 hours")
        .toDF()
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", cp)
        .outputMode("update").start()
      try q.processAllAvailable() finally q.stop()
    }

    // Run 1: disordered fragment — u51's click lands before its view,
    // u51's second view arrives with no closer yet (stays buffered or
    // unflushed depending on the watermark — either way it must survive
    // the restart in state, not in the source).
    writeBatch(in, Seq(
      ev(2, 1 * H, 51, "click"), ev(1, 0 * H, 51, "view"),
      ev(3, 20 * H, 51, "view")))
    run()

    // Run 2 (fresh query, same checkpoint): the rest of u51's funnel,
    // u52's doomed-view funnel, then two watermark carriers to flush.
    writeBatch(in, Seq(
      ev(4, 21 * H, 51, "click"), ev(5, 22 * H, 51, "purchase"),
      ev(6, 0 * H, 52, "view"), ev(7, 30 * H, 52, "click")))
    writeBatch(in, Seq(ev(-1, 300 * H, -1, "view")))
    writeBatch(in, Seq(ev(-2, 301 * H, -1, "view")))
    run()

    val got = spark.read.parquet(out)
      .groupBy("user_id")
      .agg(max("n_views").as("v"), max("n_s1").as("c"), max("n_s2").as("p"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap.filter(_._1 >= 0L)

    // reference: the ordered one-shot over the same (real) events
    val all = Seq(
      ev(1, 0 * H, 51, "view"), ev(2, 1 * H, 51, "click"),
      ev(3, 20 * H, 51, "view"), ev(4, 21 * H, 51, "click"),
      ev(5, 22 * H, 51, "purchase"),
      ev(6, 0 * H, 52, "view"), ev(7, 30 * H, 52, "click"))
    val reference = FunnelStream.funnel(
        spark.createDataset(all)(Encoders.product[Ev]).toDF(), tol)
      .toDF().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    assert(got === reference)
    // u51 completes twice over; u52's first click is 30 h late — dead view
    assert(reference(51L) === ((2L, 2L, 2L)))
    assert(reference(52L) === ((1L, 0L, 0L)))
  }
}
