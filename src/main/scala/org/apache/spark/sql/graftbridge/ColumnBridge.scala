package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column API-agnostic (ColumnNode) and gated the
  * Column↔Expression conversions behind `private[sql]`. This bridge —
  * compiled into an `org.apache.spark.sql` subpackage — is the single
  * sanctioned crossing point for graft's custom Catalyst expressions.
  * Public Spark API everywhere else. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
