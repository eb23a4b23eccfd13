package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

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
  }
}
