package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column <-> Expression converters — the only
  * supported way to hand a custom Catalyst Expression (graft.functions.*)
  * to the public DataFrame API in Spark 4 (classic.ExpressionUtils is
  * private[sql]; SparkSessionExtensions registration would be the
  * alternative for SQL-name exposure, unnecessary for library-internal
  * expressions). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
