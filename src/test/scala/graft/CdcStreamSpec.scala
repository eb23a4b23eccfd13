package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcStream

final case class Op(key: Long, seq: Long, op: String, status: String, cents: Long)

/** CDC materializer: last-writer-wins by seq with tombstones; replayed
  * or late ops below the applied frontier must be no-ops (idempotent
  * replay), deletes must tombstone without erasing the frontier, and a
  * later-seq insert must resurrect. */
class CdcStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def materialize(ops: Seq[Op]): Map[Long, (Long, Boolean, String, Long)] =
    CdcStream.materialize(spark.createDataset(ops)(Encoders.product[Op]).toDF())
      .toDF().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getString(3), r.getLong(4))))
      .toMap

  test("last-writer-wins, tombstone, resurrect") {
    val got = materialize(Seq(
      Op(1, 0, "I", "O", 100), Op(1, 1, "U", "R", 200), // plain update
      Op(2, 0, "I", "O", 100), Op(2, 1, "D", "", 0), // tombstoned
      Op(3, 0, "I", "O", 100), Op(3, 1, "D", "", 0), Op(3, 2, "I", "N", 300), // resurrected
      Op(4, 1, "U", "R", 500))) // update-before-insert delivery: still materializes
    assert(got(1L) === ((1L, false, "R", 200L)))
    assert(got(2L) === ((1L, true, "O", 100L)))
    assert(got(3L) === ((2L, false, "N", 300L)))
    assert(got(4L) === ((1L, false, "R", 500L)))
  }

  test("cross-batch replay of any log prefix is a no-op") {
    val log = Seq(
      Op(7, 0, "I", "O", 100), Op(7, 1, "U", "R", 200), Op(7, 2, "D", "", 0),
      Op(8, 0, "I", "O", 900), Op(8, 1, "U", "P", 950))
    val stream = MemoryStream[Op](Encoders.product[Op], spark.sqlContext)
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    val q = CdcStream.materialize(stream.toDF())
      .writeStream.format("memory").queryName("cdc_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      stream.addData(log.take(3))
      q.processAllAvailable()
      stream.addData(log.drop(3) ++ log.take(2)) // batch 2 replays a prefix
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("cdc_out")
      .groupBy("o_orderkey")
      .agg(max(struct(col("seq"), col("deleted"), col("o_orderstatus"), col("cents"))).as("s"))
      .select(col("o_orderkey"), col("s.*"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getString(3), r.getLong(4))))
      .toMap
    // the replayed pre-delete update must NOT resurrect key 7
    assert(last(7L) === ((2L, true, "R", 200L)))
    assert(last(8L) === ((1L, false, "P", 950L)))
    assert(materialize(log) === last)
  }

  test("batch fold is op-delivery-order insensitive (seq decides)") {
    val log = (1L to 50L).flatMap(k => Seq(
      Op(k, 0, "I", "O", k * 100),
      Op(k, 1, "U", "R", k * 200)) ++
      (if (k % 5 == 0) Seq(Op(k, 2, "D", "", 0)) else Nil))
    val a = materialize(log)
    val b = materialize(scala.util.Random.javaRandomToRandom(new java.util.Random(3)).shuffle(log))
    assert(a === b)
    assert(a(5L)._2 === true)
    assert(a(1L) === ((1L, false, "R", 200L)))
  }
}
