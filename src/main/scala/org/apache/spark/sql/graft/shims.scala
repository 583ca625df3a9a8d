package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters, needed
  * to expose custom Catalyst expressions through the public Column API in
  * Spark 4.x (where `new Column(expr)` no longer exists). This file lives
  * under `org.apache.spark.sql` solely to satisfy the `private[sql]` access
  * qualifier — the standard extension-library technique. */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
