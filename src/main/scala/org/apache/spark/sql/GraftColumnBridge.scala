package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the package-private classic Column<->Expression
  * converters — the standard extension-library pattern for registering
  * custom Catalyst expressions on Spark 4 (Column lost `.expr` in the
  * Connect refactor). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
