package graft

import java.nio.file.Files
import java.time.Duration

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}
import org.scalatest.funsuite.AnyFunSuite

/** State TTL on the transformWithState surface: ValueState configured
  * with a TTLConfig expires between query runs, so per-key state is
  * BOUNDED BY TIME as well as by size — the knob that keeps a 100-TB
  * stream's RocksDB store from growing with every key ever seen (the
  * companion to watermark-bounded windows, for keyed state a watermark
  * can't reach). A second no-TTL state in the same processor pins that
  * expiry is per-state, not per-key. TTL requires
  * TimeMode.ProcessingTime, whose internal triggers keep
  * processAllAvailable from ever settling — so each batch runs as its
  * own single-trigger query over a shared checkpoint with file source
  * and sink (the scheduled incremental-run shape production uses
  * anyway; the memory sink cannot recover a checkpoint). */
final case class TtlIn(k: Long)
final case class TtlOut(k: Long, ttl_count: Long, forever_count: Long)

class StateTtlSpec extends AnyFunSuite {

  final class CountProcessor(ttl: Duration)
      extends StatefulProcessor[Long, TtlIn, TtlOut] {
    @transient private var ttlCount: ValueState[Long] = _
    @transient private var foreverCount: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      ttlCount = getHandle.getValueState[Long]("ttlCount",
        Encoders.scalaLong, new TTLConfig(ttl))
      foreverCount = getHandle.getValueState[Long]("foreverCount",
        Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(k: Long, rows: Iterator[TtlIn],
        timers: TimerValues): Iterator[TtlOut] = {
      val n = rows.size.toLong
      val t = (if (ttlCount.exists()) ttlCount.get() else 0L) + n
      val f = (if (foreverCount.exists()) foreverCount.get() else 0L) + n
      ttlCount.update(t)
      foreverCount.update(f)
      Iterator.single(TtlOut(k, t, f))
    }
  }

  test("TTL'd state expires across runs; NONE state survives") {
    val spark = TestSpark.spark
    implicit val enc: Encoder[TtlOut] = Encoders.product[TtlOut]
    val root = Files.createTempDirectory("graft-ttl")
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/cp")

    def writeBatch(ks: Seq[Long]): Unit =
      spark.createDataset(ks.map(TtlIn))(Encoders.product[TtlIn])
        .repartition(1).write.mode("append").parquet(in)

    def run(): Unit = {
      val q = spark.readStream.schema(Encoders.product[TtlIn].schema).parquet(in)
        .as(Encoders.product[TtlIn])
        .groupByKey(_.k)(Encoders.scalaLong)
        .transformWithState(new CountProcessor(Duration.ofMillis(300)),
          TimeMode.ProcessingTime(), OutputMode.Append())
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.Once())
        .start()
      assert(q.awaitTermination(120000), "run did not finish")
    }

    writeBatch(Seq(1L, 1L))       // run 1: two events for key 1
    run()
    Thread.sleep(1500)            // let the 300 ms TTL lapse
    writeBatch(Seq(1L, 1L, 1L))   // run 2: three more
    run()

    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    // run 1 emitted (2, 2); run 2: TTL state restarted at 3 while the
    // NONE state accumulated to 5
    assert(rows === Seq((2L, 2L), (3L, 5L)),
      s"expected TTL reset (3) with surviving NONE state (5), got $rows")
  }
}
