package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(expr) constructor; the supported bridge
  * (ExpressionUtils, columnNodeSupport.scala) is private[sql], so this shim
  * lives in the org.apache.spark.sql package to expose it to the engine. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
