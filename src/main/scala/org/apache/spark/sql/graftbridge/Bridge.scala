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
}
