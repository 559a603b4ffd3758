package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` / `Column.expr` surface
  * (Column is ColumnNode-based for Connect parity); the classic-mode
  * bridge lives in `org.apache.spark.sql.classic.ExpressionUtils`, which
  * is `private[sql]`. This shim re-exports the two conversions from
  * inside the `org.apache.spark.sql` package tree — the standard way
  * third-party Catalyst extensions bind custom `Expression`s to Columns
  * on Spark 4.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
