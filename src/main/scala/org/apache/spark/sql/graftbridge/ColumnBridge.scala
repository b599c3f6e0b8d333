package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters — the
  * standard shim for libraries that define custom Catalyst expressions
  * against Spark 4's Column API (which no longer exposes `.expr`).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Full ColumnNode→catalyst conversion. Unlike [[expression]] (which
    * wraps the node in an opaque, unevaluable `ColumnNodeExpression`),
    * this produces a real catalyst tree (`UnresolvedFunction`, lambda
    * variables, literals) that the analyzer then resolves — required
    * when the expression is injected into a FunctionRegistry builder
    * rather than entering through the DataFrame API. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
