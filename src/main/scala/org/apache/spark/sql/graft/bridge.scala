package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. In Spark 4 the public `Column` carries a
  * ColumnNode rather than a Catalyst Expression; the converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is private[sql] —
  * so this one-file shim is compiled into the sql package namespace (the
  * conventional pattern for Catalyst-extending libraries).
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
