package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column ↔ Expression
  * converters, so custom Catalyst expressions (streamline.expr) can be
  * exposed through the public Column API. This is the standard pattern
  * third-party Spark extensions use; nothing else from the internal
  * surface is touched.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
