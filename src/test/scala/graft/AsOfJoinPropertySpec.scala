package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** AsOfJoin differential against an in-memory brute-force reference on
  * generated data: per left row, the latest right row with the same key
  * and right-time <= left-time (ties by the tiebreak id, latest wins),
  * NULLed when staler than the tolerance. Exercises the edges the
  * fixture queries can't be relied on to hit every round: keys with no
  * right rows, equal-timestamp ties, exact-tolerance boundaries, and an
  * empty right side. */
final case class AsofL(lid: Long, key: Long, ts: Timestamp)
final case class AsofR(rkey: Long, rts: Timestamp, rid: Long, value: Double)

class AsOfJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private val caseGen = for {
    nL <- Gen.choose(1, 40)
    nR <- Gen.choose(0, 40)
    ls <- Gen.listOfN(nL, for {
      k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 200L)
    } yield (k, t))
    rs <- Gen.listOfN(nR, for {
      k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 200L); v <- Gen.choose(1, 999)
    } yield (k, t, v.toDouble))
    tol <- Gen.choose(1L, 100L)
  } yield (
    ls.zipWithIndex.map { case ((k, t), i) => AsofL(i.toLong, k, ts(t)) },
    rs.zipWithIndex.map { case ((k, t, v), i) => AsofR(k, ts(t), i.toLong, v) },
    tol)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  test("asOfWithin equals the brute-force reference on generated cases") {
    import spark.implicits._
    samples(caseGen, 12).foreach { case (ls, rs, tol) =>
      val got = AsOfJoin.asOfWithin(
          ls.toDF(), rs.toDF(),
          leftKey = col("key"), rightKey = col("rkey"),
          leftTimeCol = "ts", rightTimeCol = "rts",
          rightTie = "rid", rightPayload = Seq("rid", "value"),
          toleranceSec = tol)
        .select("lid", "asof_rid", "asof_value", "asof_age_us")
        .collect()
        .map(r => r.getLong(0) -> (
          if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2), r.getLong(3)))))
        .toMap

      val want = ls.map { l =>
        val cands = rs.filter(r => r.rkey == l.key && !r.rts.after(l.ts))
        val best = if (cands.isEmpty) None
          else Some(cands.maxBy(r => (r.rts.getTime, r.rid)))
        val fresh = best.filter(b => (l.ts.getTime - b.rts.getTime) <= tol * 1000L)
        l.lid -> fresh.map(b =>
          (b.rid, b.value, (l.ts.getTime - b.rts.getTime) * 1000L))
      }.toMap

      assert(got === want,
        s"asOfWithin mismatch (tol=${tol}s, |L|=${ls.size}, |R|=${rs.size})")
    }
  }

  test("asOfNearest equals the brute-force reference on generated cases") {
    import spark.implicits._
    samples(caseGen, 12).foreach { case (ls, rs, _) =>
      val got = AsOfJoin.asOfNearest(
          ls.toDF(), rs.toDF(),
          leftKey = col("key"), rightKey = col("rkey"),
          leftTime = col("ts"), rightTime = col("rts"),
          rightTie = "rid", rightPayload = Seq("rid", "value"))
        .select("lid", "asof_rid", "asof_value", "asof_dir")
        .collect()
        .map(r => r.getLong(0) -> (
          if (r.isNullAt(1)) None
          else Some((r.getLong(1), r.getDouble(2), r.getString(3)))))
        .toMap

      // Brute force: backward = latest right <= t (max (rts, rid));
      // forward = earliest right >= t (min (rts, rid)); choose the
      // smaller absolute distance, direction ties -> backward.
      val want = ls.map { l =>
        val mine = rs.filter(_.rkey == l.key)
        val back = mine.filter(r => !r.rts.after(l.ts)) match {
          case Nil => None; case cs => Some(cs.maxBy(r => (r.rts.getTime, r.rid)))
        }
        val fwd = mine.filter(r => !r.rts.before(l.ts)) match {
          case Nil => None
          case cs => Some(cs.minBy(r => (r.rts.getTime, r.rid)))
        }
        val chosen = (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (l.ts.getTime - b.rts.getTime <= f.rts.getTime - l.ts.getTime)
              Some((b, "b"))
            else Some((f, "f"))
          case (Some(b), None) => Some((b, "b"))
          case (None, Some(f)) => Some((f, "f"))
          case _ => None
        }
        l.lid -> chosen.map { case (r, d) => (r.rid, r.value, d) }
      }.toMap

      assert(got === want,
        s"asOfNearest mismatch (|L|=${ls.size}, |R|=${rs.size})")
    }
  }
}
