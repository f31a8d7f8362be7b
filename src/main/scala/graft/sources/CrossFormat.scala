package graft.sources

import org.apache.spark.sql.SparkSession

/** ZERO-COPY conversion between the two open table formats, composed
  * from the per-format metadata-only migrations through the manifest
  * lake: `Delta → manifest → Iceberg` and `Iceberg → manifest →
  * Delta`. No data file moves or rewrites in either direction — at
  * 100 TB that is the whole point: the conversion cost is O(files)
  * metadata, not O(bytes) data.
  *
  * After a conversion the SAME root serves all three surfaces (the
  * source format's log, the manifest lake, and the target format's
  * metadata), each replaying its own metadata over the shared files.
  * Identity-partitioned Delta layouts carry through: the Hive path
  * segments become manifest partition semantics and then Iceberg
  * identity tuples, so the converted table PRUNES in the target
  * format. Each leg keeps its own refusals (deletion vectors /
  * delete files must be purged or compacted first; column-mapped
  * Delta and non-path-reproducible Iceberg tuples refuse by name) —
  * nothing is converted that would read back wrong.
  *
  * Retention discipline after converting: the files are owned by the
  * MANIFEST from then on — use the manifest VACUUM, whose reader
  * horizon must cover both mirrors (the per-format vacuums refuse on
  * shared roots by the existing ownership guards). */
object CrossFormat {

  /** Delta table → Iceberg table in place, zero data movement.
    * Returns the published Iceberg snapshot id. */
  def deltaToIceberg(spark: SparkSession, table: String): Long = {
    DeltaInterop.importToManifest(spark, table)
    IcebergInterop.exportFromManifest(spark, table)
  }

  /** Iceberg table → Delta table in place, zero data movement.
    * Returns the published Delta version. */
  def icebergToDelta(spark: SparkSession, table: String): Long = {
    IcebergInterop.importToManifest(spark, table)
    DeltaInterop.exportFromManifest(spark, table)
  }

  /** Vectored Delta → Iceberg WITHOUT purging: deletion vectors and
    * v2 position deletes are the same per-file kill sets, so the
    * merge-on-read debt converts directly ([[IcebergInterop
    * .importFromDeltaMor]]) — O(deleted rows) sidecar writes, data
    * files shared. Unpartitioned tables; the converted root serves
    * the Delta log and the Iceberg metadata (no manifest layer). */
  def deltaToIcebergMor(spark: SparkSession, table: String): Long =
    IcebergInterop.importFromDeltaMor(spark, table)

  /** Merge-on-read Iceberg → Delta WITHOUT compacting: position
    * deletes re-serialize as deletion-vector sidecars metadata-only;
    * EQUALITY deletes resolve to per-file positions with one
    * provenance scan at conversion time
    * ([[DeltaInterop.importFromIcebergMor]]). Partitioned specs
    * refuse by name. */
  def icebergToDeltaMor(spark: SparkSession, table: String): Long =
    DeltaInterop.importFromIcebergMor(spark, table)
}
