package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** UniForm-style AUTO-MIRROR: a Delta table that keeps a CURRENT
  * Iceberg mirror of itself, composed from the zero-copy legs
  * ([[CrossFormat.deltaToIceberg]] for the full publication and an
  * incremental manifest+Iceberg commit for the steady state) — what
  * Delta's UniForm is, minus nothing the legs don't refuse by name.
  *
  * ENABLEMENT IS A TABLE PROPERTY, not session state:
  * [[enableAutoMirror]] validates eligibility (through the full
  * conversion's own named refusals: no deletion vectors, no column
  * mapping, path-reproducible partitioning), publishes the initial
  * mirror, and records `delta.universalFormat.enabledFormats=iceberg`
  * in the table configuration — so EVERY writer session's commit path
  * (Delta's `publishCommit` hook reads the committed configuration)
  * keeps the mirror current, including sessions and JVMs that never
  * called enable. A JVM-local [[disableAutoMirror]] exists only as a
  * this-process override (test/emergency freeze); the durable off
  * switch is [[disableAutoMirror(spark*,table*)]], which clears the
  * property.
  *
  * Scale shape: the steady-state sync is O(changed files) — an append
  * publishes ONE incremental manifest-lake version (A-lines only) and
  * ONE Iceberg append snapshot whose manifest list carries every
  * prior manifest verbatim; a rewrite (OPTIMIZE, CoW DML) drops the
  * removed paths via [[IcebergInterop]]'s rewrite publication, which
  * rewrites only manifests that lost a file. The full O(live files)
  * re-export runs only when it must: initial enable, a schema or
  * partitioning change, a DV-writing commit (vectors purge first —
  * the mirror cannot represent them, same as Delta's UniForm), or a
  * sync-marker mismatch (out-of-band mutation, crashed sync).
  * Retention stays manifest-owned (the [[CrossFormat]] rule): vacuum
  * through the manifest with a horizon covering both mirrors. */
object UniForm {

  /** The Delta table property that turns the mirror on — the same key
    * Delta's UniForm records (`delta-io` PROTOCOL.md, Universal
    * Format). Any writer session seeing `iceberg` in the committed
    * configuration maintains the mirror. */
  val EnabledFormatsProp = "delta.universalFormat.enabledFormats"

  /** JVM-local disable OVERRIDE (not durable): suppresses the sync in
    * this process only. The durable switch is the table property. */
  private val localDisabled =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def key(table: String): String = new Path(table).toString

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** One committed Delta transaction, summarized for the mirror hook:
    * decoded relative paths, sizes, stats row counts, whether any add
    * carries a deletion vector, and the metaData action's schema /
    * partitioning when the commit republishes it. */
  final case class CommitAdd(path: String, size: Long,
                             rows: Option[Long], dv: Boolean)
  final case class CommitSummary(version: Long, adds: Seq[CommitAdd],
                                 removes: Seq[String],
                                 metaSchemaJson: Option[String],
                                 metaPartCols: Option[Seq[String]]) {
    def dataCommit: Boolean = adds.nonEmpty || removes.nonEmpty
  }

  /** The sync marker: which Delta version the mirror reflects, plus
    * the mirror heads and the schema identity it was synced under —
    * the incremental path's precondition. Lives in the Iceberg
    * metadata dir (never referenced by a snapshot, so expiry ignores
    * it); a missing or mismatched marker just means the next data
    * commit pays one full re-export. */
  private final case class SyncMarker(deltaVersion: Long,
                                      icebergSnapshot: Long,
                                      manifestVersion: Long,
                                      schemaHash: String,
                                      partCols: Seq[String])

  private def markerPath(root: Path): Path =
    new Path(new Path(root, "metadata"), "uniform-sync.json")

  private def readMarker(fs: FileSystem, root: Path): Option[SyncMarker] =
    scala.util.Try {
      import org.json4s._
      val in = fs.open(markerPath(root))
      val text = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        new String(out.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
      val j = org.json4s.jackson.JsonMethods.parse(text)
      def l(f: String): Long = (j \ f) match {
        case JInt(i) => i.toLong
        case JLong(v) => v
        case _ => -1L
      }
      def s(f: String): String = (j \ f) match {
        case JString(v) => v
        case _ => ""
      }
      SyncMarker(l("deltaVersion"), l("icebergSnapshot"),
        l("manifestVersion"), s("schemaHash"),
        s("partCols").split(',').toSeq.filter(_.nonEmpty))
    }.toOption

  private def writeMarker(fs: FileSystem, root: Path,
                          m: SyncMarker): Unit = {
    val out = fs.create(markerPath(root), true)
    try out.write(
      (s"""{"deltaVersion":${m.deltaVersion},""" +
        s""""icebergSnapshot":${m.icebergSnapshot},""" +
        s""""manifestVersion":${m.manifestVersion},""" +
        s""""schemaHash":"${m.schemaHash}",""" +
        s""""partCols":"${m.partCols.mkString(",")}"}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Publish the initial Iceberg mirror, record the enablement
    * property in the table configuration, and write the sync marker.
    * Returns the mirror's snapshot id. Ineligible tables (vectored,
    * column-mapped, non-path partitioning) refuse through the
    * conversion legs' own named errors and nothing records. */
  def enableAutoMirror(spark: SparkSession, table: String): Long = {
    val snap = CrossFormat.deltaToIceberg(spark, table)
    localDisabled.remove(key(table)): Unit
    val pre = DeltaInterop.state(spark, table, None)
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // marker FIRST: the property commit below fires the hook under
    // the freshly-enabled configuration, and must find the marker
    // current (metadata-only → it just advances the version) rather
    // than paying a redundant second full export
    writeMarker(fs, root, SyncMarker(pre.version, snap,
      ManifestLake.currentVersion(spark, table).getOrElse(-1L),
      md5(pre.schema.json), pre.partitionColumns))
    if (!formatsEnableIceberg(pre.configuration))
      DeltaInterop.setProperties(spark, table,
        Map(EnabledFormatsProp -> "iceberg")): Unit
    snap
  }

  /** JVM-LOCAL freeze: stop this process syncing; other sessions (and
    * a restart) keep mirroring per the table property. The existing
    * mirror stays on disk. */
  def disableAutoMirror(table: String): Unit =
    localDisabled.add(key(table)): Unit

  /** Durable disable: clears the enablement property so NO session
    * mirrors from the next commit on; the mirror freezes at its last
    * synced state. */
  def disableAutoMirror(spark: SparkSession, table: String): Unit = {
    localDisabled.add(key(table)): Unit
    val st = DeltaInterop.state(spark, table, None)
    if (formatsEnableIceberg(st.configuration))
      DeltaInterop.setProperties(spark, table,
        Map(EnabledFormatsProp -> "")): Unit
    localDisabled.remove(key(table)): Unit
  }

  /** Test/ops hook: forget every JVM-local override, as a fresh
    * process would have it — enablement then reads PURELY from each
    * table's committed configuration. */
  def resetLocalState(): Unit = localDisabled.clear()

  private def formatsEnableIceberg(config: Map[String, String]): Boolean =
    config.get(EnabledFormatsProp)
      .exists(_.split(',').map(_.trim.toLowerCase).contains("iceberg"))

  /** Whether a commit carrying `config` on `table` must run the
    * mirror hook — the cheap pre-check [[DeltaInterop]] consults
    * before paying the action parse. */
  private[sources] def mirrorEnabled(config: Map[String, String],
                                     table: String): Boolean =
    formatsEnableIceberg(config) && !localDisabled.contains(key(table)) &&
      !syncing.get

  private val syncing = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** The post-commit hook [[DeltaInterop]]'s `publishCommit` fires on
    * every commit whose committed CONFIGURATION enables the iceberg
    * mirror. Data commits re-sync; metadata-only commits advance the
    * marker (property churn must not demote the next append to a full
    * re-export) unless they changed the schema or partitioning, which
    * re-exports. A DV-writing commit PURGES the vectors first — the
    * Iceberg mirror cannot represent Delta deletion vectors, and
    * Delta's own UniForm forbids them for the same reason; the
    * purge's own commit re-enters this hook, so a thread-local guard
    * keeps the sync single. A sync failure propagates — a mirror
    * silently falling behind is the one outcome this feature exists
    * to prevent. */
  private[sources] def afterDeltaCommit(spark0: Option[SparkSession],
                                        table: String,
                                        summary: CommitSummary): Unit = {
    if (syncing.get) return
    val spark = spark0
      .orElse(SparkSession.getActiveSession)
      .orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException(
        s"UniForm mirror sync on $table needs a SparkSession and none " +
          "is active in this thread — the Delta commit LANDED; " +
          "re-sync with CrossFormat.deltaToIceberg from a session"))
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = readMarker(fs, root)
    val schemaChanged = summary.metaSchemaJson.exists(sj =>
      !marker.exists(m => m.schemaHash == md5(sj) &&
        summary.metaPartCols.forall(_ == m.partCols)))
    if (!summary.dataCommit) {
      // metadata-only: a schema/partitioning change must move the
      // MIRROR's schema too (full re-export); anything else only
      // advances the marker so the next append stays incremental
      if (schemaChanged) { syncing.set(true)
        try fullResync(spark, fs, root, table)
        catch { case scala.util.control.NonFatal(e) => throw stale(table, e) }
        finally syncing.set(false)
      } else marker.filter(_.deltaVersion == summary.version - 1)
        .foreach(m => writeMarker(fs, root,
          m.copy(deltaVersion = summary.version)))
      return
    }
    syncing.set(true)
    try {
      if (summary.adds.exists(_.dv)) {
        // MOR delete: purge the vectors (lossless dataChange=false
        // rewrite of only the vectored files), then re-export — the
        // purge invalidates the commit's own add/remove diff
        DeltaInterop.purgeDeletionVectors(spark, table): Unit
        fullResync(spark, fs, root, table)
      } else if (schemaChanged ||
        !incrementalSync(spark, fs, root, table, summary, marker))
        fullResync(spark, fs, root, table)
    } catch {
      case scala.util.control.NonFatal(e) => throw stale(table, e)
    } finally syncing.set(false)
  }

  // the failure mode must name what ACTUALLY happened: the Delta
  // commit LANDED; only the mirror is stale — a caller that re-ran
  // the write on this error would double-append
  private def stale(table: String, e: Throwable): IllegalStateException =
    new IllegalStateException(
      s"Delta commit on $table LANDED but the UniForm mirror re-sync " +
        "failed — the MIRROR is stale, the table is not; do NOT " +
        "retry the write. Re-sync with CrossFormat.deltaToIceberg " +
        s"once the cause is fixed: ${e.getMessage}", e)

  /** O(changed files) steady-state sync: one incremental manifest
    * version + one Iceberg append/rewrite snapshot derived from the
    * commit's own actions. Applies only when the marker proves the
    * mirror reflects exactly the pre-commit table (version chain and
    * both mirror heads match); any precondition miss returns false
    * and the caller pays the full re-export instead — always correct,
    * just O(live files). */
  private def incrementalSync(spark: SparkSession, fs: FileSystem,
                              root: Path, table: String,
                              summary: CommitSummary,
                              marker: Option[SyncMarker]): Boolean = {
    val m = marker.getOrElse(return false)
    if (m.deltaVersion != summary.version - 1) return false
    if (!ManifestLake.currentVersion(spark, table)
      .contains(m.manifestVersion)) return false
    if (!IcebergInterop.currentSnapshotId(spark, table)
      .contains(m.icebergSnapshot)) return false
    // adds whose paths don't reproduce the recorded partitioning (or
    // any other shape the Iceberg leg refuses) fall back inside
    val snap = try IcebergInterop.mirrorPublish(spark, table,
      summary.adds.map(a => (a.path, a.size, a.rows)), summary.removes)
    catch {
      case _: IllegalArgumentException => return false
      case _: IcebergInterop.UnsupportedIcebergFeatureException =>
        return false
    }
    val mv = ManifestLake.commitLog(fs, root, full = false,
      adds = summary.adds.sortBy(_.path).map(a =>
        ManifestLake.FileEntry(a.path, rows = a.rows,
          bytes = Some(a.size)).line),
      removes = summary.removes.sorted,
      prev = Some(m.manifestVersion))
    writeMarker(fs, root, m.copy(deltaVersion = summary.version,
      icebergSnapshot = snap, manifestVersion = mv))
    true
  }

  private def fullResync(spark: SparkSession, fs: FileSystem,
                         root: Path, table: String): Unit = {
    val snap = CrossFormat.deltaToIceberg(spark, table)
    val st = DeltaInterop.state(spark, table, None)
    writeMarker(fs, root, SyncMarker(st.version, snap,
      ManifestLake.currentVersion(spark, table).getOrElse(-1L),
      md5(st.schema.json), st.partitionColumns))
  }
}
