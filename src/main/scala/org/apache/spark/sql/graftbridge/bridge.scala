package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's `private[sql]` Column ↔ catalyst Expression
  * conversion (classic.ExpressionUtils) for our custom expressions.
  * Lives under org.apache.spark.sql to satisfy the package-private
  * accessor — the only place we step outside the public API, and only to
  * wrap our own Catalyst expressions as Columns.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
