package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  *
  * `classic.ExpressionUtils` is `private[sql]`, so library code outside
  * the Spark package tree can't build a `Column` from a raw
  * `Expression` without going through the FunctionRegistry. This tiny
  * shim (the standard extension-library pattern) re-exports the two
  * conversions needed by [[graft.functions.VectorOps]]'s Column API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a raw LogicalPlan as a DataFrame (classic `Dataset.ofRows`,
    * also `private[sql]`) — needed to hand a custom logical operator
    * like [[graft.plans.AsOfJoinPlan]] back to the user as a normal
    * DataFrame.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
