package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to `private[sql]` Column <-> Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils). Lives in the sql
  * package solely to re-export the two converters graft's Column-level
  * API needs; no Spark internals are modified. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
