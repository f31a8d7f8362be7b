package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType

/** Batch-plan → streaming-plan bridge for DSv1 micro-batch sources.
  *
  * A v1 `Source.getBatch` must hand the engine a DataFrame whose leaf
  * relations carry `isStreaming = true` (MicroBatchExecution asserts
  * it), but the frame we WANT to return is a plain parquet scan of the
  * micro-batch's files — the built-in vectorized reader with column
  * pruning and pushdown intact, exactly how `FileStreamSource` builds
  * its batches. Flipping the flag on the analyzed `LogicalRelation` is
  * `private[sql]` territory, hence this one-file adapter (same pattern
  * as [[PlanBridge]]). */
object StreamBridge {

  /** `df` with every leaf file relation re-marked as streaming — the
    * shape `MicroBatchExecution` requires of a v1 source batch.
    * `keepStatic` exempts leaves that must stay BATCH sides of the
    * plan: a deletion-vector sidecar scan anti-joined against the data
    * is a legal stream-STATIC join, but flipping it too would make the
    * join stream-stream, which rejects LeftAnti. */
  def asStreaming(df: DataFrame,
                  keepStatic: LogicalRelation => Boolean = _ => false)
      : DataFrame = {
    val plan = PlanBridge.analyzedPlan(df).transform {
      case lr: LogicalRelation if !keepStatic(lr) =>
        lr.copy(isStreaming = true)
    }
    PlanBridge.ofRows(df.sparkSession, plan)
  }

  /** `keepStatic` predicate matching file relations rooted under the
    * exact directory `parent/child` (e.g. the lake table's `_dv`
    * sidecar dir) — anchored, so a TABLE whose own path happens to
    * contain a same-named segment never matches. */
  def underDir(parent: String, child: String): LogicalRelation => Boolean = {
    val prefix = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(parent), child).toUri.getPath + "/"
    lr => lr.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.rootPaths.exists(_.toUri.getPath.startsWith(prefix))
      case _ => false
    }
  }

  /** An empty streaming frame of `schema`, for a version range that
    * added no files. */
  def emptyStreaming(spark: SparkSession, schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        spark.sparkContext.emptyRDD[InternalRow], schema, isStreaming = true)
}
