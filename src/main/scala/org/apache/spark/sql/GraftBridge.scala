package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim: `classic.ExpressionUtils` is private[sql], and it is
  * the supported way in Spark 4 to wrap a custom Catalyst Expression
  * into a user-facing Column (the old `new Column(expr)` constructor
  * is gone). Keep this object free of any logic.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
