package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into Spark 4's private[sql] Column↔Expression conversions so the
 * engine can expose custom Catalyst expressions as `Column`s (the
 * supported pattern for third-party expression libraries; the public
 * constructor was removed in Spark 4's Column unification).
 */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
