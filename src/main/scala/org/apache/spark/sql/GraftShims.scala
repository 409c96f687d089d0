/* Shim into Spark's private[sql] surface: Column <-> Expression
 * bridging for custom Catalyst expressions. Kept to the two minimal
 * conversions; everything else in graft uses only public API. */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
