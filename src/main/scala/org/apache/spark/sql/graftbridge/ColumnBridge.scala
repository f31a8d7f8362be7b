package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}
import org.apache.spark.sql.internal.ColumnNode

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

  /** [[expression]] plus COLUMN-NODE lowering: a Column built by the
    * public DSL (`$"id" === 5L`) arrives not as catalyst `EqualTo` but
    * as a [[ColumnNodeExpression]] wrapping the Spark-Connect-unified
    * `ColumnNode` tree, which analysis lowers lazily. Static predicate
    * ANALYSIS (file-stats pruning bounds) pattern-matches catalyst
    * shapes, so it needs the lowering done eagerly — this converts
    * every wrapped node through Spark's own converter (the exact
    * lowering the analyzer would apply). SQL-parsed predicates pass
    * through untouched. */
  def loweredExpression(c: Column): Expression =
    expression(c).transformUp {
      // ColumnNodeExpression itself is private[classic]; match by name
      // and pull the wrapped node reflectively (one call per predicate
      // ANALYSIS, never per row — this is driver-side planning only)
      case e if e.getClass.getName ==
        "org.apache.spark.sql.classic.ColumnNodeExpression" =>
        val node = e.getClass.getMethod("node").invoke(e)
          .asInstanceOf[ColumnNode]
        ColumnNodeToExpressionConverter(node)
    }
}
