package graft.plans

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight, BuildSide}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.internal.SQLConf

/** Physical-planning leg of the range-join stack (the engine's
  * `SparkStrategy` surface, completing the Catalyst tour: custom
  * expressions, an Aggregator, an optimizer Rule, and now a planner
  * strategy + physical operator, all installed via [[GraftExtensions]]).
  *
  * [[RangeJoinRewrite]] (logical) and
  * [[graft.operators.RangeJoin.timeRangeJoin]] (DataFrame-level) both
  * reduce a `|x - y| <= r` join to an equi-join on a `_graft_bucket`
  * column plus the exact residual predicate. Left to the default
  * planner, that equi-join becomes a SortMergeJoin: both sides shuffle
  * AND SORT on (key, bucket), but the sort buys nothing — bucket cells
  * are tiny by construction (the whole point of the rewrite) and the
  * output needs no order. This strategy recognizes the marker column and
  * plans [[BucketedRangeJoinExec]] instead: a co-partitioned hash join
  * that builds a per-partition map over the UNEXPANDED side (chosen by
  * logical size stats — the 3×-exploded side should stream, not sit in
  * memory) and streams the other, evaluating the exact range predicate
  * on bucket-local candidates only.
  *
  * Scale: per-task memory is one partition of the build side —
  * `spark.sql.shuffle.partitions` is the knob that keeps it bounded,
  * exactly the ShuffledHashJoin trade-off; no sort, no spill-sort IO.
  * Disable with `spark.graft.rangeJoinExec.enabled=false` to fall back
  * to the default SMJ planning of the same (still-correct) rewrite.
  */
object BucketedJoinStrategy extends SparkStrategy with PredicateHelper {

  /** Shared with [[RangeJoinRewrite]] / `RangeJoin.timeRangeJoin`. */
  private val BucketMarker = "_graft_bucket"

  val EnabledKey = "spark.graft.rangeJoinExec.enabled"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, Inner, Some(cond), _)
        if SQLConf.get.getConfString(EnabledKey, "true") == "true" =>
      val classified = splitConjunctivePredicates(cond).map { c =>
        val pair = c match {
          case EqualTo(a, b)
              if a.references.subsetOf(left.outputSet) &&
                b.references.subsetOf(right.outputSet) => Some((a, b))
          case EqualTo(a, b)
              if b.references.subsetOf(left.outputSet) &&
                a.references.subsetOf(right.outputSet) => Some((b, a))
          case _ => None
        }
        (c, pair)
      }
      val keys = classified.collect { case (_, Some(p)) => p }
      val residual = classified.collect { case (c, None) => c }
      val isBucketed = keys.exists { case (lk, rk) =>
        (lk.references ++ rk.references).exists(_.name.startsWith(BucketMarker))
      }
      // Defer to BroadcastHashJoin when a side fits the broadcast
      // threshold: zero shuffles beats this exec's two. The custom node
      // exists for the LARGE-large case — where the default planning is
      // SortMergeJoin and the sort is pure waste.
      def broadcastable(p: LogicalPlan): Boolean = {
        val t = SQLConf.get.autoBroadcastJoinThreshold
        t > 0 && p.stats.sizeInBytes >= 0 && p.stats.sizeInBytes <= t
      }
      if (isBucketed && keys.nonEmpty &&
          !broadcastable(left) && !broadcastable(right)) {
        // Build over the smaller side by optimizer stats: the bucket
        // expansion explodes one side 3x, and that side must stream.
        val buildSide =
          if (left.stats.sizeInBytes <= right.stats.sizeInBytes) BuildLeft
          else BuildRight
        BucketedRangeJoinExec(keys.map(_._1), keys.map(_._2),
          residual.reduceOption(And), buildSide,
          planLater(left), planLater(right)) :: Nil
      } else Nil
    case _ => Nil
  }
}

/** Co-partitioned bucket hash join: children are hash-clustered on the
  * (key, bucket) expressions (EnsureRequirements inserts compatible
  * exchanges), each task builds a HashMap over its build-side partition
  * keyed by the join keys, streams the other side, and emits only the
  * candidate pairs that pass the exact `condition` — for a range join,
  * the original `|x - y| <= r` check over bucket-local candidates.
  *
  * Null keys never match (SQL equi-join semantics): rows whose key
  * projection contains a null are skipped on both sides.
  */
case class BucketedRangeJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    condition: Option[Expression],
    buildSide: BuildSide,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "build side rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def outputPartitioning: Partitioning = buildSide match {
    case BuildLeft => right.outputPartitioning
    case BuildRight => left.outputPartitioning
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val buildRowsMetric = longMetric("buildRows")
    val buildLeft = buildSide == BuildLeft
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val (buildIter, streamIter) = if (buildLeft) (lIter, rIter) else (rIter, lIter)
      val (buildKeys, streamKeys) = if (buildLeft) (leftKeys, rightKeys) else (rightKeys, leftKeys)
      val (buildAttrs, streamAttrs) =
        if (buildLeft) (left.output, right.output) else (right.output, left.output)
      val buildKeyProj = UnsafeProjection.create(buildKeys, buildAttrs)
      val streamKeyProj = UnsafeProjection.create(streamKeys, streamAttrs)
      val pred = condition.map(Predicate.create(_, left.output ++ right.output))
      pred.foreach(_.initialize(TaskContext.getPartitionId()))

      val map = new java.util.HashMap[UnsafeRow, java.util.ArrayList[InternalRow]]()
      while (buildIter.hasNext) {
        val row = buildIter.next()
        val key = buildKeyProj(row)
        if (!key.anyNull) {
          var bucket = map.get(key)
          if (bucket == null) {
            bucket = new java.util.ArrayList[InternalRow](4)
            map.put(key.copy(), bucket)
          }
          bucket.add(row.copy())
          buildRowsMetric += 1
        }
      }

      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)
      streamIter.flatMap { streamRow =>
        val key = streamKeyProj(streamRow)
        val matches = if (key.anyNull) null else map.get(key)
        if (matches == null) Iterator.empty
        else {
          // JoinedRow input order is ALWAYS (left, right) regardless of
          // which side built — `condition` and `output` are bound to
          // left.output ++ right.output.
          if (buildLeft) joined.withRight(streamRow) else joined.withLeft(streamRow)
          new Iterator[InternalRow] {
            private var i = 0
            private var ready: InternalRow = null
            def hasNext: Boolean = {
              while (ready == null && i < matches.size()) {
                val buildRow = matches.get(i); i += 1
                if (buildLeft) joined.withLeft(buildRow) else joined.withRight(buildRow)
                if (pred.forall(_.eval(joined))) { numOutputRows += 1; ready = resultProj(joined) }
              }
              ready != null
            }
            def next(): InternalRow = {
              if (!hasNext) throw new NoSuchElementException
              val r = ready; ready = null; r
            }
          }
        }
      }
    }
  }
}
