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

  /** Rebind a DataFrame's logical plan to another session (normally a
    * `cloneSession()`), so per-session conf tweaks needed by one job can
    * run without being visible to concurrent queries on the original
    * session. The plan is already analyzed; the clone shares catalog and
    * runtime state, so execution is identical apart from the conf. */
  def rebind(df: org.apache.spark.sql.DataFrame,
             to: org.apache.spark.sql.SparkSession):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      to.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.logical)

  /** `SparkSession.cloneSession()` is `private[sql]` in Spark 4: expose
    * it for per-job conf isolation (identical shared state, conf copied
    * by value). */
  def cloneSession(s: org.apache.spark.sql.SparkSession):
      org.apache.spark.sql.SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
}
