package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's `private[sql]` Column <-> Expression adapters
  * (`org.apache.spark.sql.classic.ExpressionUtils`, Spark 4.x). Lives under
  * `org.apache.spark.sql` solely to satisfy the access qualifier — the
  * standard pattern for Spark extension libraries; everything else in this
  * engine is in package `graft`.
  */
object Bridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Fully convert a Column (possibly built from `functions._` column
    * nodes, lambdas included) into a Catalyst Expression tree. Unlike
    * `expression`, which wraps non-expression nodes in an unevaluable
    * `ColumnNodeExpression`, this runs the classic converter — required
    * when the result is handed to Catalyst directly (e.g. a FunctionRegistry
    * builder) rather than through a DataFrame API that converts lazily. */
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a custom LogicalPlan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — needed by operators that introduce their own
    * logical nodes (graft.plans.RangePointJoin). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame (for composing custom nodes). */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
}
