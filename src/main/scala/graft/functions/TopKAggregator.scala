package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (candidate id, similarity) observation feeding the top-k fold. */
final case class ScoredId(cand_id: Long, sim: Double)

/** Bounded top-k buffer: parallel id/sim lists sorted by
  * (sim desc, id asc), truncated at k. */
final case class TopKList(ids: Seq[Long], sims: Seq[Double])

/** Bounded-heap top-k typed `Aggregator`: keeps at most k (id, sim)
  * entries ordered by (sim desc, id asc) — the deterministic total order
  * a `row_number` window over the same keys would produce, so results are
  * bit-identical to the window formulation.
  *
  * Scale rationale (the reason this exists): a
  * `row_number().over(Window.partitionBy("q_id"))` rank ships EVERY
  * candidate row for a query to one reducer — at 100 TB that is the whole
  * corpus through a single task per query. As an `Aggregator` (udaf →
  * ObjectHashAggregate), each map task folds its partition into a ≤k-entry
  * buffer, the shuffle carries only those buffers (k rows per task per
  * query), and the reducer merges tiny sorted lists — a two-phase exact
  * top-k with no full-corpus exchange.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, TopKList, TopKList] {

  private def insert(b: TopKList, cid: Long, s: Double): TopKList = {
    val n = b.ids.length
    var p = 0
    while (p < n && (b.sims(p) > s || (b.sims(p) == s && b.ids(p) < cid))) p += 1
    if (p >= k) b
    else TopKList(
      ((b.ids.take(p) :+ cid) ++ b.ids.drop(p)).take(k),
      ((b.sims.take(p) :+ s) ++ b.sims.drop(p)).take(k))
  }

  override def zero: TopKList = TopKList(Vector.empty, Vector.empty)

  override def reduce(b: TopKList, a: ScoredId): TopKList =
    insert(b, a.cand_id, a.sim)

  override def merge(b1: TopKList, b2: TopKList): TopKList = {
    var b = b1
    var i = 0
    while (i < b2.ids.length) { b = insert(b, b2.ids(i), b2.sims(i)); i += 1 }
    b
  }

  override def finish(r: TopKList): TopKList = r
  override def bufferEncoder: Encoder[TopKList] = Encoders.product[TopKList]
  override def outputEncoder: Encoder[TopKList] = Encoders.product[TopKList]
}

object TopKAggregator {
  /** Column form: `topK(k)(idCol, simCol)` aggregates to a TopKList struct. */
  def topK(k: Int)(idCol: Column, simCol: Column): Column =
    udaf(new TopKAggregator(k), Encoders.product[ScoredId]).apply(idCol, simCol)
}
