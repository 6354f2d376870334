package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ catalyst Expression bridge.
  *
  * Spark 4 gates `ExpressionUtils.column/expression` behind private[sql];
  * libraries that ship custom Catalyst expressions conventionally expose
  * them through a small shim in the sql package. Only used by
  * graft.functions.ShingleExpressions / GraftFunctions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
