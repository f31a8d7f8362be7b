package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** The manifest lake as a STRUCTURED STREAMING SOURCE: committed
  * versions become micro-batches.
  *
  * {{{
  *   spark.readStream.format("graft-lake").load(tableDir)
  * }}}
  *
  * Offsets ARE lake versions: `getOffset` is one bounded
  * [[ManifestLake.currentVersion]] probe (no listing on checkpointed
  * tables), and a batch `(v1, v2]` resolves each version's own delta
  * record via [[ManifestLake.changesBetween]] — O(new files), never a
  * snapshot resolution. The engine persists offsets in the stream
  * checkpoint, so a restarted query resumes from its committed version
  * watermark without re-emitting (pinned in LakeStreamSpec); paired
  * with [[ManifestLake.writeBatch]] on the sink side this closes the
  * lake-to-lake exactly-once loop.
  *
  * Batches are handed to the engine as plain parquet scans of the
  * versions' added files (rewrapped streaming via
  * [[StreamBridge.asStreaming]]), keeping the built-in vectorized
  * reader, column pruning, and pushdown — the same construction
  * `FileStreamSource` uses.
  *
  * ==Change semantics (the Delta source contract)==
  * Appended files stream exactly once. MAINTENANCE commits
  * (compaction, bin-packing) carry the net-zero `#maintenance` marker
  * and are skipped outright — they change layout, not rows. Other
  * commits that REWRITE data are not incrementally expressible:
  *  - a base record (overwrite) mid-stream, or a delta with removed
  *    files (MERGE / DELETE rewrites), raises a named error by
  *    default;
  *  - `ignoreChanges=true` opts into emitting such commits' added
  *    files anyway — surviving rows of rewritten files re-emit
  *    (at-least-once on rewrites, exactly Delta's `ignoreChanges`);
  *  - the table's FIRST version is its initial data, not a change, and
  *    always streams.
  * `startingVersion` — `earliest` (default: replay the retained log
  * from version 1), `latest` (only commits after stream start), or a
  * version number (commits from that version on, inclusive).
  * `maxVersionsPerTrigger` caps the versions one micro-batch drains
  * (the `maxFilesPerTrigger` analog for catch-up reads).
  * `readChangeFeed=true` streams ROW-LEVEL CHANGES instead of rows:
  * `(_change_type, _commit_version, data...)` per committed version —
  * recorded change files verbatim, appends as inserts, and rewrites
  * without recorded sidecars refused by name.
  */
final class LakeStreamProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-lake stream needs a table path: .load(dir) or .option(\"path\", dir)"))

  private def cdcMode(parameters: Map[String, String]): Boolean =
    parameters.get("readchangefeed").exists(_.toBoolean)

  /** The source schema: the table's own, or in CDC mode the change-row
    * shape (`_change_type`, `_commit_version`, data columns). */
  private def schemaFor(sqlContext: SQLContext,
                        parameters: Map[String, String]): StructType = {
    val data = ManifestLake.read(
      sqlContext.sparkSession, tablePath(parameters)).schema
    if (!cdcMode(parameters)) data
    else StructType(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false) +:
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false) +:
      data.fields)
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(schemaFor(sqlContext, parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new LakeSource(sqlContext.sparkSession, tablePath(parameters),
      schema.getOrElse(schemaFor(sqlContext, parameters)),
      parameters.getOrElse("startingversion", "earliest"),
      parameters.get("ignorechanges").exists(_.toBoolean),
      parameters.get("maxversionspertrigger").map(_.toInt)
        .getOrElse(Int.MaxValue),
      readChangeFeed = cdcMode(parameters))
}

/** See [[LakeStreamProvider]]. One instance per (re)started query; all
  * persistent state lives in the engine's offset checkpoint.
  *
  * [[SupportsTriggerAvailableNow]]: `prepareForTriggerAvailableNow`
  * pins the table's version at trigger start, and [[getOffset]] never
  * advances past the pin — the run drains exactly the commits that
  * existed when it started, across as many micro-batches as the engine
  * schedules, then terminates (no single-batch fallback). */
final class LakeSource(spark: SparkSession, table: String,
                       override val schema: StructType,
                       startingVersion: String, ignoreChanges: Boolean,
                       maxVersionsPerTrigger: Int = Int.MaxValue,
                       readChangeFeed: Boolean = false)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow
    with org.apache.spark.sql.connector.read.streaming.ReportsSourceMetrics {

  /** Version BEFORE the first streamed one (exclusive lower bound).
    * Evaluated once at source construction — for `latest` that freezes
    * "now", exactly Kafka's `startingOffsets=latest`. */
  private val boundary: Long = startingVersion match {
    case "earliest" => 0L
    case "latest" =>
      ManifestLake.currentVersion(spark, table).getOrElse(0L)
    case v => v.toLong - 1
  }

  private def versionOf(o: OffsetV1): Long = o.json.trim.toLong

  /** Version pinned by an AvailableNow trigger at run start. */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = ManifestLake.currentVersion(spark, table)

  override def getOffset: Option[OffsetV1] = {
    val cur = ManifestLake.currentVersion(spark, table)
    availableNowCap.fold(cur)(cap => cur.map(_.min(cap)))
      .filter(_ > boundary).map(new LongOffset(_))
  }

  /** Admission-control form of [[getOffset]] (the engine calls this one
    * when the trigger is AvailableNow). The version is the atomic unit
    * of consumption; `maxVersionsPerTrigger` caps how many of them one
    * micro-batch drains (the `maxFilesPerTrigger` analog — bounds a
    * resuming consumer's catch-up batch instead of replaying a week of
    * commits in one giant batch), and an AvailableNow run simply takes
    * several batches to reach its pinned end. */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val from = Option(start).map(_.json.trim.toLong).getOrElse(boundary)
    getOffset.map(versionOf)
      .map(a => math.min(a, from + maxVersionsPerTrigger))
      .filter(_ > from).map(new LongOffset(_)).orNull
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(versionOf).getOrElse(boundary)
    val to = versionOf(end)
    if (readChangeFeed) return getChangeBatch(from, to)
    val entries = ManifestLake.changesBetween(spark, table, from, to)
      .flatMap { ch =>
        // maintenance commits (compaction/bin-packing) are NET-ZERO row
        // changes by contract: skip them entirely — neither an error
        // nor a re-emission, the same rows are simply laid out better
        if (ch.maintenance) Nil
        else {
          val rewrite =
            if (ch.base) ch.version != 1 // first commit = initial data
            else ch.removed.nonEmpty
          if (rewrite && !ignoreChanges)
            throw new UnsupportedOperationException(
              s"version ${ch.version} of $table is a " +
                (if (ch.base) "base commit (overwrite)"
                 else "rewrite (merge/delete removed files)") +
                " — not incrementally streamable. Set ignoreChanges=true " +
                "to emit its added files (rows of rewritten files will " +
                "re-emit), or stream from a version past it.")
          ch.added
        }
      }
    if (entries.isEmpty) StreamBridge.emptyStreaming(spark, schema)
    else
      // entry-level read honors dv= annotations: an ignoreChanges
      // re-emission of a deletion-vectored file serves only its LIVE
      // rows, never the just-deleted ones. DV application is a
      // per-file PREDICATE (DvLive), not a plan leaf — the streaming
      // conversion sees exactly one file relation, and the filter is
      // trivially legal in a streaming plan.
      StreamBridge.asStreaming(
        ManifestLake.readEntries(spark, table, Some(schema), entries)
          .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*))
  }

  /** The CDC batch for `(from, to]`: recorded change files scan
    * verbatim, pure appends emit their added files as inserts, and a
    * rewrite WITHOUT recorded change files raises — every frame stays
    * a plain scan + projection, which is why recorded sidecars exist
    * at all (the on-demand EXCEPT ALL diff is not a legal streaming
    * plan). Metadata-only commits (ALTER) contribute nothing. */
  private def getChangeBatch(from: Long, to: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val dataFields = schema.fields.toSeq.filterNot(f =>
      f.name == "_change_type" || f.name == "_commit_version")
    val base = new org.apache.hadoop.fs.Path(table)
    def align(df: DataFrame, version: Long,
              changeType: org.apache.spark.sql.Column): DataFrame =
      df.select(changeType.as("_change_type") +:
        lit(version).as("_commit_version") +:
        dataFields.map(f =>
          if (df.columns.contains(f.name)) col(f.name)
          else lit(null).cast(f.dataType).as(f.name)): _*)
    val frames = ManifestLake.changesBetween(spark, table, from, to)
      .flatMap { ch =>
        // maintenance rewrites change no rows: no change-feed entries
        if (ch.maintenance) None
        else if (ch.changeFiles.nonEmpty)
          Some(align(spark.read.parquet(ch.changeFiles.map(f =>
              new org.apache.hadoop.fs.Path(base, f).toString): _*),
            ch.version, col("_change_type")))
        else if (ch.removed.nonEmpty || (ch.base && ch.version != 1))
          throw new UnsupportedOperationException(
            s"version ${ch.version} of $table rewrote data without a " +
              "recorded change feed — run merge/delete with " +
              "recordChangeFeed = true to stream its changes, or start " +
              "the stream past it.")
        else if (ch.added.isEmpty) None // metadata-only commit
        else Some(align(
          spark.read.option("basePath", table)
            .schema(org.apache.spark.sql.types.StructType(dataFields.toArray))
            .parquet(ch.added.map(e =>
              new org.apache.hadoop.fs.Path(base, e.path).toString): _*),
          ch.version, lit("insert")))
      }
    if (frames.isEmpty) StreamBridge.emptyStreaming(spark, schema)
    else StreamBridge.asStreaming(frames.reduce(_.unionByName(_)))
  }

  /** Consumer-lag observability in StreamingQueryProgress: how many
    * committed versions the stream has not yet drained (the Kafka
    * consumer-lag analog — the number an operator alerts on). */
  override def metrics(latestConsumedOffset: java.util.Optional[
      org.apache.spark.sql.connector.read.streaming.Offset])
      : java.util.Map[String, String] = {
    val consumed =
      if (latestConsumedOffset.isPresent)
        latestConsumedOffset.get.json.trim.toLong
      else boundary
    val latest = ManifestLake.currentVersion(spark, table).getOrElse(boundary)
    java.util.Collections.singletonMap("versionsBehind",
      math.max(0L, latest - consumed).toString)
  }

  override def stop(): Unit = ()

  override def toString: String = s"LakeSource[$table]"
}
