package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression converters for
  * graft's custom Catalyst expressions (Spark 4 split Column from
  * Expression; classic.ExpressionUtils is the sanctioned converter but
  * is package-private). Standard pattern for Spark extension libraries.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
