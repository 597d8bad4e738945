package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column ↔ catalyst Expression converters
  * (Spark 4 wrapped Column around ColumnNode; `classic.ExpressionUtils`
  * is `private[sql]`). Living in Spark's package to expose exactly
  * these two conversions is the established extension-library pattern —
  * it keeps graft's native expressions usable as plain Columns on ANY
  * session, with no FunctionRegistry coupling. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
