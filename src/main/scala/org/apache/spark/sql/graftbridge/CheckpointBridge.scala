package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Releases the storage behind an eagerly `localCheckpoint`ed Dataset.
  *
  * `Dataset.localCheckpoint(true)` persists the physical RDD via
  * `RDD.localCheckpoint()` and wraps it in a `LogicalRDD` — it never
  * registers anything with the `CacheManager`. `Dataset.unpersist`, in
  * turn, ONLY talks to the CacheManager (`uncacheQuery`), so calling it
  * on a checkpointed frame is a silent no-op (verified against the
  * Spark 4.1.2 bytecode): the persisted RDD lives in
  * `sc.getPersistentRDDs` until the ContextCleaner happens to reap it.
  * Freeing it deterministically requires unpersisting the underlying
  * RDD itself, which is reachable only through the `private[sql]`
  * `LogicalRDD` node — hence this one-method bridge in the
  * `org.apache.spark.sql` namespace, beside [[ColumnBridge]].
  */
object CheckpointBridge {
  /** Unpersist the checkpoint RDD(s) backing `df` (no-op for frames
    * that are not localCheckpoint results). Non-blocking. */
  def unpersistCheckpointed(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))
}
