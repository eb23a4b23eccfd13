package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> catalyst Expression bridge. Spark 4's classic
  * `ExpressionUtils` is `private[sql]`, so custom Catalyst expressions
  * (graft.functions.*) go through this shim, which lives inside the
  * `org.apache.spark.sql` namespace for access. No Spark internals are
  * modified — these are one-line delegations.
  */
package object graftbridge {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
