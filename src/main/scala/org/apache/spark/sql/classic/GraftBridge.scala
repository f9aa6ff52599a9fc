package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4's Column wraps a ColumnNode (Connect-compatible tree), and the
  * classic converters (`ExpressionUtils`) are `private[sql]` — so the
  * engine exposes exactly the two conversions it needs from inside the
  * package, the conventional extension-point pattern for custom
  * expressions on Spark 4. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
