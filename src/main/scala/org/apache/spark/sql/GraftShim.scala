package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column ↔ Expression conversion —
  * the standard extension-library pattern for registering custom
  * Catalyst expressions (graft.functions.Md5Lower64) as user-facing
  * Columns under Spark 4's Column-node API. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
