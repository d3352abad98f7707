package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column↔Expression converters —
  * the standard pattern for libraries shipping custom Catalyst
  * expressions against Spark 4's sealed classic API (the alternative,
  * per-session FunctionRegistry registration, can't express pure
  * Column-builder APIs). Nothing else from the internal API is used. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
