package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan ⇄ DataFrame bridge.
  *
  * Spark 4 split the public `Dataset` API from the `classic`
  * implementation and made `Dataset.ofRows` / `queryExecution`-based
  * plan access `private[sql]`. The lake's SQL surface (a resolution
  * rule that rewrites `MERGE INTO` / `DELETE FROM` / `VERSION AS OF`
  * over manifest tables into runnable commands) needs both directions:
  * wrap an analyzer-resolved source plan as a DataFrame for the lake
  * API, and splice a DataFrame's analyzed plan back into the tree being
  * resolved. Same one-file-adapter pattern as [[ColumnBridge]]. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
}
