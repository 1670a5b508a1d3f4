package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 moved `Column` to a ColumnNode representation and made the
  * Expression constructor `private[sql]`; extensions that define native
  * expressions conventionally re-export the conversion from inside the
  * `org.apache.spark.sql` package namespace.
  */
object bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
