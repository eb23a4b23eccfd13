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

  test("5 random disorder instances reproduce the ordered FIFO match set") {
    import graft.streaming.FifoStream
    val types = Array("view", "purchase")
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(2000L + seed)
      // ~120 events, 5 users, hour-grid ts collisions, cent amounts that
      // force lot splits and partial fills in both directions
      val events = (1 to 120).map { i =>
        Ev(i.toLong, new Timestamp(rnd.nextInt(73).toLong * H / 1000L),
          70 + rnd.nextInt(5), types(rnd.nextInt(2)),
          (1 + rnd.nextInt(400)) / 100.0)
      }
      val reference = FifoStream.matches(
          spark.createDataset(events)(Encoders.product[Ev]).toDF())
        .collect().map(m => (m.user_id, m.in_event, m.out_event, m.qty_cents, m.wait_us)).toSet

      val shuffled = rnd.shuffle(events)
      val batches = shuffled.grouped(1 + rnd.nextInt(40)).toSeq :+
        Seq(ev(-1L, 3000 * H, -1L, "view")) :+
        Seq(ev(-2L, 3001 * H, -1L, "view"))
      val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
      val ckpt = Files.createTempDirectory(s"graft-et-fifo-prop-$seed").toString
      val q = FifoStream.matchesEventTime(stream.toDF(), "1000 hours")
        .writeStream.format("memory").queryName(s"et_fifo_prop_$seed")
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      finally q.stop()
      val rows = spark.table(s"et_fifo_prop_$seed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .filter(_._1 >= 0L)
      assert(rows.length === rows.distinct.length, s"seed $seed emitted a match twice")
      assert(rows.toSet === reference, s"seed $seed diverged")
    }
  }

  test("5 random disorder instances reproduce the ordered SCD2 history") {
    import graft.streaming.Scd2Stream
    val types = Array("view", "click", "purchase")
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(3000L + seed)
      val events = (1 to 120).map { i =>
        ev(i.toLong, rnd.nextInt(73).toLong * H, 80 + rnd.nextInt(5),
          types(rnd.nextInt(3)))
      }
      def collapse(rows: Seq[(Long, String, Long, Option[Long])]) = {
        val closed = rows.collect { case (u, t, f, Some(to)) => (u, t, f, to) }
        assert(closed.length === closed.distinct.length, s"seed $seed re-emitted a closed row")
        val open = rows.collect { case (u, t, f, None) => (u, t, f) }
          .groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._3) }
        (closed.toSet, open)
      }
      val reference = collapse(Scd2Stream.history(
          spark.createDataset(events)(Encoders.product[Ev]).toDF())
        .collect().map(o => (o.user_id, o.event_type, o.from_us, o.to_us)).toSeq)

      val shuffled = rnd.shuffle(events)
      val batches = shuffled.grouped(1 + rnd.nextInt(40)).toSeq :+
        Seq(ev(-1L, 3000 * H, -1L, "view")) :+
        Seq(ev(-2L, 3001 * H, -1L, "view"))
      val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
      val ckpt = Files.createTempDirectory(s"graft-et-scd2-prop-$seed").toString
      val q = Scd2Stream.historyEventTime(stream.toDF(), "1000 hours")
        .writeStream.format("memory").queryName(s"et_scd2_prop_$seed")
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      finally q.stop()
      val got = collapse(spark.table(s"et_scd2_prop_$seed").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .filter(_._1 >= 0L).toSeq)
      assert(got === reference, s"seed $seed diverged")
    }
  }
}
