package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions entry point for the engine's Catalyst additions.
  *
  * Production wiring (cluster submit):
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * }}}
  * or `SparkSession.builder().withExtensions(new GraftExtensions())`.
  * For an already-built session,
  * `spark.experimental.extraOptimizations :+= RangeJoinRewrite` registers
  * the same rule ad hoc.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => RangeJoinRewrite)
    extensions.injectPlannerStrategy(_ => BucketedJoinStrategy)
    // FunctionRegistry surface: the Z-order layout key as a SQL-callable
    // function, so `spark.sql("... ORDER BY zorder_code(a, b)")` works for
    // users who never touch the Scala API.
    extensions.injectFunction((
      FunctionIdentifier("zorder_code"),
      new ExpressionInfo(classOf[graft.functions.ZOrderCode].getName, "zorder_code"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "zorder_code(x, y) takes exactly 2 arguments")
        graft.functions.ZOrderCode(
          org.apache.spark.sql.catalyst.expressions.Cast(children(0),
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.catalyst.expressions.Cast(children(1),
            org.apache.spark.sql.types.LongType))
      }))
  }
}
