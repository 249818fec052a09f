package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Column<->Expression converters, for
  * exposing custom Catalyst expressions (e.g. graft's CuckooFilterAgg) as
  * user-facing Columns. Standard library-extension technique; no Spark
  * internals are modified. */
object GraftInternals {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
