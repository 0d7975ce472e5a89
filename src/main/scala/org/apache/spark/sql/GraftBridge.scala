package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column <-> Expression conversions that
  * Spark 4's classic module hides (columnNodeSupport.scala). Custom
  * Catalyst expressions (graft.functions) need both directions to be
  * exposed as user-facing Columns. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
