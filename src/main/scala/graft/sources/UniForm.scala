package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** UniForm-style AUTO-MIRROR: a Delta table that keeps a CURRENT
  * Iceberg mirror of itself, composed entirely from the existing
  * zero-copy legs ([[CrossFormat.deltaToIceberg]] =
  * `importToManifest` → `exportFromManifest`) — what Delta's UniForm
  * is, minus nothing the legs don't already refuse by name.
  *
  * [[enableAutoMirror]] publishes the initial mirror (validating
  * eligibility through the legs' own named refusals: no deletion
  * vectors, no column mapping, path-reproducible partitioning) and
  * registers the table; from then on EVERY DATA COMMIT the Delta
  * writer publishes (append, overwrite, DELETE/UPDATE/MERGE,
  * OPTIMIZE — anything carrying add/remove/cdc actions) re-syncs the
  * mirror as part of the commit call. Maintenance publications
  * (property-only commits, CHECKPOINTs — which never pass through
  * the commit log) skip: the mirror only moves when the data does.
  *
  * Scale shape: each sync is O(live files) metadata — one full
  * manifest snapshot plus one Iceberg overwrite publication; zero
  * data bytes move, the mirror references the Delta files in place.
  * Retention stays manifest-owned (the [[CrossFormat]] rule): vacuum
  * through the manifest with a horizon covering both mirrors. */
object UniForm {

  private val mirrored =
    new java.util.concurrent.ConcurrentHashMap[String, SparkSession]()

  private def key(table: String): String = new Path(table).toString

  /** Publish the initial Iceberg mirror and keep it current across
    * future data commits. Returns the mirror's snapshot id.
    * Ineligible tables (vectored, column-mapped, non-path
    * partitioning) refuse through the conversion legs' own named
    * errors and nothing registers. */
  def enableAutoMirror(spark: SparkSession, table: String): Long = {
    val snap = CrossFormat.deltaToIceberg(spark, table)
    mirrored.put(key(table), spark)
    snap
  }

  /** Stop mirroring; the existing mirror stays on disk, frozen. */
  def disableAutoMirror(table: String): Unit =
    mirrored.remove(key(table)): Unit

  private[sources] def isMirrored(table: String): Boolean =
    mirrored.containsKey(key(table))

  private val syncing = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** The post-commit hook [[DeltaInterop]]'s `publishCommit` fires:
    * re-sync when the committed actions MOVE DATA; skip maintenance
    * (property/protocol-only commits). A DV-writing commit (the MOR
    * DELETE) PURGES the vectors first — the Iceberg mirror cannot
    * represent Delta deletion vectors, and Delta's own UniForm
    * forbids them for the same reason; the purge is a lossless
    * dataChange=false rewrite of only the vectored files. The purge's
    * own commit re-enters this hook, so a thread-local guard keeps
    * the sync single. A sync failure propagates — a mirror silently
    * falling behind is the one outcome this feature exists to
    * prevent. */
  private[sources] def afterDeltaCommit(table: String,
                                        dataCommit: Boolean): Unit =
    if (dataCommit && !syncing.get)
      Option(mirrored.get(key(table))).foreach { spark =>
        syncing.set(true)
        try {
          if (DeltaInterop.state(spark, table, None)
            .files.exists(_.dv.nonEmpty))
            DeltaInterop.purgeDeletionVectors(spark, table): Unit
          CrossFormat.deltaToIceberg(spark, table): Unit
        } catch {
          case scala.util.control.NonFatal(e) =>
            // the failure mode must name what ACTUALLY happened: the
            // Delta commit LANDED; only the mirror is stale — a
            // caller that re-ran the write on this error would
            // double-append
            throw new IllegalStateException(
              s"Delta commit on $table LANDED but the UniForm mirror " +
                "re-sync failed — the MIRROR is stale, the table is " +
                "not; do NOT retry the write. Re-sync with " +
                "CrossFormat.deltaToIceberg once the cause is fixed: " +
                e.getMessage, e)
        } finally syncing.set(false)
      }
}
