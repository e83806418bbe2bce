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

  /** Wrap a LogicalPlan into a DataFrame (classic.Dataset.ofRows is
    * private[sql]) — needed to expose custom logical operators.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
