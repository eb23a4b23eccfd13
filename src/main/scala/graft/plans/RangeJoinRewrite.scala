package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: plan-level range-join rewrite.
  *
  * An inner join whose condition carries `abs(x - y) <= r` (x from the
  * left, y from the right, both long — e.g. unix micros) is planned by
  * Spark as a nested-loop join (cartesian per key group when equi keys
  * exist, full BroadcastNestedLoopJoin when they don't) — quadratic, the
  * classic 100 TB killer. This rule rewrites the plan into the bucketed
  * shape of [[graft.operators.RangeJoin]]: the left side is tagged with
  * `x div r`, the right side explodes to its bucket and both neighbors,
  * and bucket equality joins the new equi-join condition. Every true
  * pair lands in exactly one (left-bucket, expanded-right-bucket) cell,
  * the original predicate stays in the condition as the exact check, so
  * results are bit-identical while the candidate set per task drops from
  * |key group|² to bucket occupancy.
  *
  * Registered by [[GraftExtensions]] (`spark.sql.extensions`) for
  * production sessions, or ad hoc via
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Marker column name; its presence in a join input means the join was
    * already rewritten — keeps the rule a fixpoint under re-application
    * (predicate pushdown re-merges the exact check into the condition,
    * which would otherwise re-match). */
  private val BucketCol = "_graft_bucket"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, _, Inner, Some(_), _)
        if !left.output.exists(_.name == BucketCol) =>
      rewrite(j).getOrElse(j)
  }

  /** `abs(x - y) <= lit` (either comparison direction) with x referencing
    * only `left`, y only `right`, both LongType → (x, y, radius). */
  private def rangeConjunct(left: LogicalPlan, right: LogicalPlan)(
      e: Expression): Option[(Expression, Expression, Long)] = {
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (a.dataType == LongType && b.dataType == LongType) {
        if (a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet)) Some((a, b))
        else if (b.references.subsetOf(left.outputSet) &&
            a.references.subsetOf(right.outputSet)) Some((b, a))
        else None
      } else None
    val parts = e match {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), Literal(r: Long, LongType)) =>
        Some((a, b, r))
      case GreaterThanOrEqual(Literal(r: Long, LongType), Abs(Subtract(a, b, _), _)) =>
        Some((a, b, r))
      case _ => None
    }
    parts.filter(_._3 > 0).flatMap { case (a, b, r) =>
      sides(a, b).map { case (x, y) => (x, y, r) }
    }
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    conjuncts.iterator
      .flatMap(rangeConjunct(j.left, j.right)(_))
      .nextOption()
      .map { case (x, y, radius) =>
        val r = Literal(radius)
        // Left: one bucket per row, x div r (truncating div matches the
        // ±1 expansion: |x-y| <= r bounds the bucket delta by 1).
        val lBucket = Alias(IntegralDivide(x, r), BucketCol)()
        val newLeft = Project(j.left.output :+ lBucket, j.left)
        // Right: explode to {b-1, b, b+1}.
        val yBucket = IntegralDivide(y, r)
        val one = Literal(1L)
        val arr = CreateArray(Seq(
          Subtract(yBucket, one), yBucket, Add(yBucket, one)))
        val rBucket = AttributeReference(BucketCol + "_r", LongType)()
        val newRight = Generate(Explode(arr), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(rBucket),
          child = j.right)
        // Original condition stays verbatim (the abs check is now the
        // exact filter over bucket candidates); bucket equality makes
        // the join an equi-join for the planner.
        val cond = And(j.condition.get, EqualTo(lBucket.toAttribute, rBucket))
        val newJoin = j.copy(left = newLeft, right = newRight, condition = Some(cond))
        // Rules must preserve output: drop the bucket columns again.
        Project(j.output, newJoin)
      }
  }
}
