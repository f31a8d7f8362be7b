package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Thread-scoped registry of short-lived persisted intermediates.
  *
  * The LSH/dedup chains persist an intermediate (minhash buckets, simhash
  * bands, hyperplane sketches) that both sides of a bucket self-join
  * read — without the persist the hot sketch kernel is computed twice,
  * and ReuseExchange cannot be relied on to dedup the join sides (a
  * broadcast-picked side canonicalizes differently from the probe side,
  * verified on Spark 4.1). But a bare `.persist` with no unpersist leaks
  * cache for the life of the session. Operators register their
  * intermediates here instead; the consumer calls [[drain]] once the
  * result has been materialized.
  *
  * Thread-scoped (not global) so concurrently running queries — e.g. the
  * Verify harness's 4-way pool — cannot release each other's in-flight
  * intermediates.
  */
object TransientCache {

  private val scope =
    ThreadLocal.withInitial[scala.collection.mutable.ArrayBuffer[() => Unit]](
      () => scala.collection.mutable.ArrayBuffer.empty)

  /** Persist `df` (memory-and-disk) and register it for the next [[drain]]
    * on this thread. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    scope.get += (() => p.unpersist(blocking = false))
    p
  }

  /** Register an eagerly `localCheckpoint`ed frame for the next
    * [[drain]] — same lifetime contract as [[persist]], but released
    * through the RDD (a checkpointed frame's `Dataset.unpersist` is a
    * CacheManager no-op; see
    * [[org.apache.spark.sql.graftbridge.CheckpointBridge]]). */
  def registerCheckpointed(df: DataFrame): DataFrame = {
    scope.get += (() =>
      org.apache.spark.sql.graftbridge.CheckpointBridge
        .unpersistCheckpointed(df))
    df
  }

  /** Unpersist every intermediate registered on this thread since the
    * last drain. Call after the consuming action; blocks free async. */
  def drain(): Unit = {
    val s = scope.get
    s.foreach(_.apply())
    s.clear()
  }
}
