package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** windowFunnel differential against an in-memory brute-force reference
  * on generated event streams: per view, the EARLIEST click at-or-after
  * it (ties → min id) within tolerance, then the earliest purchase
  * at-or-after that click within tolerance. Exercises the edges fixture
  * data can't be relied on to hit: equal-timestamp view/click/purchase,
  * exact-tolerance boundaries, users with no clicks, empty stages. */
class WindowFunnelPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val types = Seq("view", "click", "purchase", "error")

  private val caseGen = for {
    n <- Gen.choose(5, 60)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 3L)
      t <- Gen.choose(0L, 50L)
      ty <- Gen.oneOf(types)
    } yield (u, t, ty))
    tol <- Gen.choose(1L, 20L)
  } yield (rows.zipWithIndex.map { case ((u, t, ty), i) =>
    Ev(i.toLong, new Timestamp(t * 1000L), u, ty, 0.0)
  }, tol * 1000000L)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4242L + i)))

  /** Brute force: stage row counts + distinct users, same semantics. */
  private def reference(events: Seq[Ev], tolUs: Long): Map[String, (Long, Long)] = {
    def us(e: Ev) = e.ts.getTime * 1000L
    val views = events.filter(_.event_type == "view")
    val s1 = views.flatMap { v =>
      val cands = events.filter(c => c.event_type == "click" && c.user_id == v.user_id &&
        (us(c) > us(v) || (us(c) == us(v))))
        .sortBy(c => (us(c), c.event_id))
      cands.headOption.filter(c => us(c) - us(v) <= tolUs).map(c => (v, c))
    }
    val s2 = s1.flatMap { case (v, c) =>
      val cands = events.filter(p => p.event_type == "purchase" && p.user_id == v.user_id &&
        us(p) >= us(c)).sortBy(p => (us(p), p.event_id))
      cands.headOption.filter(p => us(p) - us(c) <= tolUs).map(p => (v, c, p))
    }
    Map(
      "1_view" -> ((views.size.toLong, views.map(_.user_id).distinct.size.toLong)),
      "2_click" -> ((s1.size.toLong, s1.map(_._1.user_id).distinct.size.toLong)),
      "3_purchase" -> ((s2.size.toLong, s2.map(_._1.user_id).distinct.size.toLong)))
  }

  test("windowFunnelStages equals the brute-force reference on generated cases") {
    import org.apache.spark.sql.Encoders
    samples(caseGen, 12).foreach { case (events, tolUs) =>
      val got = Relational.windowFunnelStages(
          spark.createDataset(events)(Encoders.product[Ev]).toDF(), tolUs)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got === reference(events, tolUs),
        s"funnel mismatch at tolUs=$tolUs over ${events.size} events")
    }
  }
}
