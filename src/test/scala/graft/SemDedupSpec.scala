package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Independent differential for [[Similarity.semDedup]]: a straight-line
  * Scala brute force (collect the vectors, argmax-assign, all within-cell
  * pairs, drop on lower-id cosine >= tau) recomputes the full verdict
  * relation on a 2000-vector synthetic corpus and must match the
  * distributed result row-for-row. This is a SECOND oracle next to the
  * DuckDB SQL one (sf0.01, driver diff) — same math, different engine,
  * different author path — plus the structural invariants the rule
  * implies. Synthetic vectors are the ScaleSmokeSpec generator, so the
  * corpus needs no fixture.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val n = 2000
  private val k = 16
  private val maxCell = 200
  private val tau = 0.9

  private def synthVecs(n: Long): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => pmod(hash(col("id"), j), lit(1000)).cast("float") / lit(1000.0f))
        .as("embedding"))

  /** (vec_id, centroid_id, is_kept) from the distributed operator. */
  private lazy val got: Map[Long, (Long, Boolean)] = {
    val rows = Similarity.semDedup(synthVecs(n), "vec_id", "embedding",
        threshold = tau, k = k, maxCell = maxCell)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
    GraftCaches.releaseAll()
    rows.toMap
  }

  /** Brute-force reference: same float->double widening as the operator
    * (toDoubleVec casts each FLOAT element), same tie rule (max sim,
    * lowest centroid id), same cap, same lower-id drop rule. */
  private lazy val expected: Map[Long, (Long, Boolean)] = {
    // hash(id, j) is Spark's Murmur3 — regenerate the widened vectors
    // through a one-stage local frame rather than reimplementing the hash.
    val collected = synthVecs(n)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val ids = collected.map(_._1)
    val v = collected.map(_._2)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nrm = v.map(x => math.sqrt(dot(x, x)))
    def cos(i: Int, j: Int): Double = dot(v(i), v(j)) / (nrm(i) * nrm(j))
    val assign = Array.tabulate(n) { i =>
      var best = -1; var bestSim = Double.NegativeInfinity
      var c = 0
      while (c < k) {
        val s = cos(i, c)
        if (s > bestSim) { bestSim = s; best = c }
        c += 1
      }
      best.toLong
    }
    val cellSizes = assign.groupBy(identity).map { case (c, xs) => c -> xs.length }
    val dropped = Array.fill(n)(false)
    for (i <- 0 until n; j <- 0 until i
         if assign(i) == assign(j) && cellSizes(assign(i)) <= maxCell
         if cos(j, i) >= tau)
      dropped(i) = true
    ids.indices.map(i => ids(i) -> (assign(i), !dropped(i))).toMap
  }

  test("distributed semDedup matches the brute-force reference verdict-for-verdict") {
    assert(got.size === n)
    val mismatches = (0L until n.toLong).flatMap { id =>
      (got(id), expected(id)) match {
        case (g, e) if g == e => None
        case (g, e)           => Some(s"vec $id: got $g expected $e")
      }
    }
    assert(mismatches.isEmpty,
      s"${mismatches.size} mismatches, first: ${mismatches.take(5).mkString("; ")}")
  }

  test("the lowest id in every capped cell is always kept") {
    val byCell = got.toSeq.groupBy(_._2._1)
    byCell.foreach { case (cell, members) =>
      if (members.size <= maxCell) {
        val minId = members.map(_._1).min
        assert(got(minId)._2, s"cell $cell: min id $minId was dropped")
      }
    }
  }

  test("vectors in over-cap cells are never dropped (excluded from pairing)") {
    got.toSeq.groupBy(_._2._1).foreach { case (cell, members) =>
      if (members.size > maxCell)
        members.foreach { case (id, (_, kept)) =>
          assert(kept, s"vec $id in over-cap cell $cell (${members.size}) was dropped")
        }
    }
  }
}
