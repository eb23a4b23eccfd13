package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.v2.{MemBatchWrite, MemCommitMessage, MemTableStore, MemWriterFactory}

/** The V2 write-path contract, at both levels: through Spark's
  * DataFrameWriter (append/overwrite round trips) and at the raw
  * BatchWrite/DataWriter API (the two-phase commit semantics a real lake
  * sink builds on — uncommitted epochs invisible, aborts publish nothing,
  * duplicate task attempts deduplicated by the scheduler's one-message-
  * per-partition commit). */
class MemTableSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeDf(n: Int, name: String, mode: String): Unit = {
    val sess = spark
    import sess.implicits._
    (0 until n).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(4)
      .write.format("graft.sinks.v2.MemTable").option("name", name)
      .mode(mode).save()
  }

  private def readBack(name: String): Seq[(Long, String)] =
    spark.read.format("graft.sinks.v2.MemTable").option("name", name).load()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("append round trip across multiple write partitions") {
    MemTableStore.drop("t_rt")
    writeDf(100, "t_rt", "append")
    assert(readBack("t_rt") === (0 until 100).map(i => (i.toLong, s"row$i")))
    writeDf(3, "t_rt", "append")
    assert(readBack("t_rt").length === 103)
    MemTableStore.drop("t_rt")
  }

  test("overwrite truncates the published epoch") {
    MemTableStore.drop("t_ow")
    writeDf(50, "t_ow", "append")
    writeDf(7, "t_ow", "overwrite")
    assert(readBack("t_ow") === (0 until 7).map(i => (i.toLong, s"row$i")))
    MemTableStore.drop("t_ow")
  }

  test("nothing is visible before driver commit; abort publishes nothing") {
    MemTableStore.drop("t_2pc")
    val schema = StructType(Seq(StructField("id", LongType)))
    val bw = new MemBatchWrite("t_2pc", schema, truncate = false)
    val w = new MemWriterFactory().createWriter(0, 0L)
    w.write(InternalRow(1L)); w.write(InternalRow(2L))
    val msg = w.commit() // task-level commit: still NOT published
    assert(MemTableStore.rowsOf("t_2pc").isEmpty,
      "task commit must not publish")
    bw.abort(Array[WriterCommitMessage](msg))
    assert(MemTableStore.rowsOf("t_2pc").isEmpty, "abort must not publish")
    bw.commit(Array[WriterCommitMessage](msg))
    assert(MemTableStore.rowsOf("t_2pc").map(_.getLong(0)).toSeq === Seq(1L, 2L))
    MemTableStore.drop("t_2pc")
  }

  test("a duplicate speculative attempt never double-publishes") {
    MemTableStore.drop("t_spec")
    val schema = StructType(Seq(StructField("id", LongType)))
    val bw = new MemBatchWrite("t_spec", schema, truncate = false)
    val factory = new MemWriterFactory()
    // two attempts of the SAME partition (speculation / retry)
    val a1 = factory.createWriter(0, 10L)
    val a2 = factory.createWriter(0, 11L)
    Seq(a1, a2).foreach { w => w.write(InternalRow(42L)); w.write(InternalRow(43L)) }
    val m1 = a1.commit()
    val m2 = a2.commit()
    assert(m1.asInstanceOf[MemCommitMessage].rows.length === 2)
    assert(m2.asInstanceOf[MemCommitMessage].rows.length === 2)
    // the scheduler passes ONE message per partition to the driver commit
    bw.commit(Array[WriterCommitMessage](m2))
    assert(MemTableStore.rowsOf("t_spec").length === 2,
      "only the scheduler-chosen attempt publishes")
    MemTableStore.drop("t_spec")
  }
}
