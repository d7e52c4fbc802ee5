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
}
