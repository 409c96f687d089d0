/* Shim into Spark's private[sql] surface: Column <-> Expression
 * bridging for custom Catalyst expressions. Kept to the two minimal
 * conversions; everything else in graft uses only public API. */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a custom Expression as a SQL function on an EXISTING
    * session (SparkSessionExtensions only applies at session build —
    * this reaches the live FunctionRegistry instead, so `spark.sql`
    * can call codegen'd expressions like dot_fold). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
