package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column <-> catalyst Expression converters
  * (Spark 4 moved Column onto ColumnNode; plain `new Column(expr)` is gone).
  * Lives in the spark.sql package solely to cross the access boundary —
  * the only Spark-internal surface this library touches.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
