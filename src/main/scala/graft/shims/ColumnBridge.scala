package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Catalyst Expression bridge. Spark 4's `Column` wraps ColumnNodes
  * and the converter (`classic.ExpressionUtils`) is `private[sql]`, so this
  * one-file accessor lives in the `org.apache.spark.sql` package — the same
  * technique test harnesses use. Needed to project a custom codegen
  * expression ([[graft.functions.CentroidArgminExpr]]) whose model-state
  * payload (the centroid matrix) cannot be written as SQL function-call
  * text, unlike `graft_dot` which registers in the function registry.
  */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
