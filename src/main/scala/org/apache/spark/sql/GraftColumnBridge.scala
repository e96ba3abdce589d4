package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge. Spark 4 hides Column construction from
  * raw Catalyst expressions behind `private[sql] classic.ExpressionUtils`;
  * extension libraries conventionally expose it via a shim in the
  * org.apache.spark.sql package (same approach as spark packages that
  * add custom expressions).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
