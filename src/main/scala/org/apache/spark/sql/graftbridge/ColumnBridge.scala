package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 moved the conversion behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`; third-party extensions that define native Catalyst
  * expressions conventionally reach it through an `org.apache.spark.sql`
  * sub-package like this one. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
