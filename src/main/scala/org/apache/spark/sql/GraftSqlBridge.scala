package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge into Spark's private[sql] Column <-> Expression converters
 * (org.apache.spark.sql.classic.ExpressionUtils) — the standard pattern for
 * third-party libraries exposing native Catalyst expressions as Columns on
 * Spark 4 (cf. the session-extension ecosystem; Spark's own `package object
 * sql` does the same for its internal callers).
 */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
