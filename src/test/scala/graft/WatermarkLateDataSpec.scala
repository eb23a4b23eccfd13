package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingCalendar

/** Watermark semantics under APPEND mode — the contract state-bounding at
  * 100 TB rests on: a 7-day window only EMITS once the 1-day watermark
  * passes its end, and data arriving later than the watermark allows is
  * DROPPED (its window's emitted counts never change, no duplicate
  * emission). If a refactor silently weakened the watermark, state would
  * grow with stream history instead of staying bounded. */
class WatermarkLateDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(id: Long, day: Int, typ: String): Ev =
    // day N = 2030-01-01 + (N-1) days at noon; window origin is epoch.
    Ev(id, Timestamp.valueOf(java.time.LocalDate.of(2030, 1, 1)
      .plusDays(day - 1L).atTime(12, 0)), id % 5, typ, 1.0)

  test("append-mode window emits once watermark passes; later-than-watermark rows are dropped") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
    val q = StreamingCalendar.weeklyTypeCounts(stream.toDF())
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      // Epoch-aligned 7-day windows: W1 = [2030-01-03, 2030-01-10). Three
      // rows in W1, then one row on day 25: watermark -> day 24 > W1 end
      // -> W1 emits its finalized counts.
      stream.addData(ev(1, 3, "view"), ev(2, 4, "view"), ev(3, 5, "click"), ev(4, 25, "view"))
      q.processAllAvailable()
      val afterFirst = spark.table("late_out").collect()
      assert(afterFirst.exists(r => r.getLong(2) == 2L && r.getString(1) == "view"),
        s"W1 view-count 2 should have been emitted: ${afterFirst.mkString(";")}")

      // A LATE row targeting W1 (day 6, far behind the day-24 watermark)
      // must be dropped: no new/changed W1 emission, row counts for W1
      // unchanged. A fresh row on day 40 advances the watermark so the
      // day-25 window flushes too — proving the query kept running.
      stream.addData(ev(5, 6, "view"), ev(6, 40, "view"))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("late_out").collect()
    val w1View = out.filter(r => r.getString(1) == "view" && r.getLong(2) == 2L)
    assert(w1View.length == 1, "late row must not re-emit or update the closed window")
    // The late row also must not appear as its own 1-row emission for W1's window start.
    val w1Start = w1View.head.getTimestamp(0)
    assert(out.count(r => r.getTimestamp(0) == w1Start && r.getString(1) == "view") == 1)
    // Day-25 window flushed after the second batch.
    assert(out.exists(r => r.getTimestamp(0).after(w1Start) && r.getString(1) == "view"))
  }
}
