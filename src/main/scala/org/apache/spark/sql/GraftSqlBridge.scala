package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column <-> Expression conversion (the standard
  * technique Spark extension libraries use to expose custom Catalyst
  * expressions as `Column`s on Spark 4's ColumnNode API).
  */
object GraftSqlBridge {
  def column(e: Expression): Column      = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression  = classic.ExpressionUtils.expression(c)
}
