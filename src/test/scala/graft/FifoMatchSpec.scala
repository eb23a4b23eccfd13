package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FIFO matching invariants that hold for ANY in/out stream (the oracle
  * pins exact values; these pin the algebra): conservation (total
  * matched = min(supply, demand) per user), per-lot caps (no inflow or
  * outflow over-consumed), and FIFO nesting (ranges matched in order —
  * an earlier outflow never draws from a later inflow than a later
  * outflow does). */
class FifoMatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def cents = round(col("value") * 100).cast("long")

  test("conservation and per-lot caps") {
    val m = graft.GraftCaches.track(
      graft.queries.Relational.queries("fifo_match")(spark, dir))
    val ev = graft.sources.Tables.events(spark, dir)
    val supply = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(sum(cents).as("s"))
    val demand = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(sum(cents).as("d"))
    val matched = m.groupBy("user_id").agg(sum("qty_cents").as("q"))
    // conservation: per user, matched total = min(supply, demand)
    // (users with one side empty emit no rows -> compare on the join)
    val bad = supply.join(demand, "user_id").join(matched, "user_id")
      .filter(col("q") =!= least(col("s"), col("d"))).count()
    assert(bad === 0)
    // per-lot caps: an inflow's matches never exceed its quantity
    val inQty = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("in_event"), cents.as("q0"))
    val overIn = m.groupBy("in_event").agg(sum("qty_cents").as("used"))
      .join(inQty, "in_event").filter(col("used") > col("q0")).count()
    assert(overIn === 0)
    val outQty = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("out_event"), cents.as("q0"))
    val overOut = m.groupBy("out_event").agg(sum("qty_cents").as("used"))
      .join(outQty, "out_event").filter(col("used") > col("q0")).count()
    assert(overOut === 0)
    // every matched quantity is positive
    assert(m.filter(col("qty_cents") <= 0).count() === 0)
    assert(m.count() > 0)
    GraftCaches.releaseAll()
  }

  test("FIFO nesting: matched (in, out) pairs are monotone per user") {
    // In FIFO, if out1 < out2 (by cumulative position) then out1's
    // matched inflows never come after out2's earliest inflow — i.e.
    // per user, max(in_event rank) of earlier outs <= min over later.
    // Equivalent relational check: for any two matches (i1, o1), (i2, o2)
    // of one user with o1 earlier than o2 in the out order, i1's last
    // match <= i2's: verify no crossing pairs exist.
    val m = graft.queries.Relational.queries("fifo_match")(spark, dir)
      .select(col("user_id"), col("in_event"), col("out_event"))
    val a = m.withColumnRenamed("in_event", "i1").withColumnRenamed("out_event", "o1")
    val b = m.withColumnRenamed("in_event", "i2").withColumnRenamed("out_event", "o2")
    // events ids increase with (ts, event_id) order within a user in the
    // fixtures' per-user streams, so crossing = o1 < o2 while i1 > i2
    val crossing = a.join(b, Seq("user_id"))
      .filter(col("o1") < col("o2") && col("i1") > col("i2")).count()
    assert(crossing === 0)
  }
}
