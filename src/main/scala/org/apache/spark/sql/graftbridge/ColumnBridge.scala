package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4's Column is backend-agnostic;
  * the classic converters are `private[sql]`, so libraries adding
  * native Catalyst expressions expose them from inside the sql package
  * namespace — the standard pattern for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The EAGER node-to-catalyst conversion: `expression` returns a
    * lazy `ColumnNodeExpression` wrapper whose tree is opaque to
    * pattern matching; structure-inspecting consumers (the zone-map
    * pruner) need the converted tree — `expr("…")` strings parse here
    * too (the SqlExpression node runs through the SQL parser). */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
