package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 made the `Column` ⇄ catalyst `Expression` conversions
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * third-party native expressions need a one-file adapter inside the
  * `org.apache.spark.sql` namespace — the same pattern Spark-ecosystem
  * extensions use. Nothing else of the engine lives outside `graft.*`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
