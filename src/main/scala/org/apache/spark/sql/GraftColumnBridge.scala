package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public `Column(Expression)` constructor (Column is
  * now backed by connect-compatible ColumnNodes). This bridge lives in
  * the `org.apache.spark.sql` package to reach the classic converter so
  * graft's custom Catalyst expressions can be used as ordinary Columns.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
