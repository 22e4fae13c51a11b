package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to `private[sql]` Column↔Expression conversions (the
  * classic-mode equivalents of the pre-4.x `new Column(expr)` / `col.expr`
  * public API). Lives in org.apache.spark.sql solely for access; no Spark
  * internals are re-implemented here.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
