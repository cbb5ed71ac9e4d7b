package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the private[sql] Column↔Expression converters —
  * Spark 4's classic Column API no longer exposes them publicly, and
  * custom Catalyst expressions (graft.functions.QuantizedDot) need both
  * directions for a Column-API wrapper.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
