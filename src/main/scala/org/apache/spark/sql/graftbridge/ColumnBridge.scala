package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`, columnNodeSupport
  * .scala). Spark 4 removed the public `Column.expr`/`new Column(expr)`
  * surface in the Connect unification; third-party Catalyst expressions
  * use this package-placement pattern to keep a Column API. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
