package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Column↔Expression converters. Lives under
  * org.apache.spark.sql purely for access; no Spark internals are modified.
  * (Same pattern as public libraries that extend Catalyst — see the
  * session-extension ecosystem; Spark offers no public constructor from a
  * Catalyst Expression to a Column in 4.x.) */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
