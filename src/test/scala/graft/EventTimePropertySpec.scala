package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FunnelStream

/** Randomized parity property for the event-time funnel: FIVE seeded
  * random (event set, shuffle, batch split) instances, each streamed
  * disordered under a span-covering watermark and compared to the
  * ordered one-shot. The targeted FunnelEventTimeSpec pins specific
  * disorder shapes; this spec samples the space — interleaved users,
  * equal timestamps, funnel stages arriving in arbitrary order. */
class EventTimePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val H = 3600000000L // 1 h in micros
  private val Tol = 24L * H

  private def ev(id: Long, tsUs: Long, uid: Long, tpe: String): Ev =
    Ev(id, new Timestamp(tsUs / 1000L), uid, tpe, 1.0)

  private def ordered(events: Seq[Ev]): Map[Long, (Long, Long, Long)] =
    FunnelStream.funnel(
        spark.createDataset(events)(Encoders.product[Ev]).toDF(), Tol)
      .toDF().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("5 random disorder instances reproduce the ordered run") {
    val types = Array("view", "click", "purchase")
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(1000L + seed)
      // ~120 events, 6 users, 0..72h, heavy ts collisions (hour grid)
      val events = (1 to 120).map { i =>
        ev(i.toLong, rnd.nextInt(73).toLong * H, 60 + rnd.nextInt(6),
          types(rnd.nextInt(3)))
      }
      val reference = ordered(events.sortBy(e => (e.ts.getTime, e.event_id)))

      val shuffled = rnd.shuffle(events)
      val batches = shuffled.grouped(1 + rnd.nextInt(40)).toSeq :+
        Seq(ev(-1L, 3000 * H, -1L, "view")) :+
        Seq(ev(-2L, 3001 * H, -1L, "view"))
      val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
      val ckpt = Files.createTempDirectory(s"graft-et-prop-$seed").toString
      val q = FunnelStream.funnelEventTime(stream.toDF(), Tol, "1000 hours")
        .writeStream.format("memory").queryName(s"et_prop_$seed")
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      finally q.stop()
      val got = spark.table(s"et_prop_$seed")
        .groupBy("user_id")
        .agg(max("n_views").as("v"), max("n_s1").as("c"), max("n_s2").as("p"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap.filter(_._1 >= 0L)
      assert(got === reference, s"seed $seed diverged")
    }
  }
}
