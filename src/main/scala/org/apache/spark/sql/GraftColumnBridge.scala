package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Classic-mode bridge between `Column` and Catalyst `Expression`.
  *
  * Spark 4's unified Column API (Connect + classic) no longer exposes
  * `Column.expr` / `Column(expr)` publicly; the classic helpers are
  * `private[sql]`. This object lives in the sql package purely to reach
  * them — the supported pattern for libraries that ship native Catalyst
  * expressions against classic Spark.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
