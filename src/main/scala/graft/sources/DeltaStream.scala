package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** A Delta-log table as a STRUCTURED STREAMING SOURCE — subscribe to a
  * table some OTHER engine's Delta writer produces, pure Spark:
  *
  * {{{
  *   spark.readStream.format("graft-delta").load(tableDir)
  * }}}
  *
  * The [[LakeStreamProvider]] design applied to the open format:
  * offsets ARE Delta versions (persisted in the engine checkpoint, so
  * a restart resumes from its committed watermark without
  * re-emitting), a batch `(v1, v2]` parses each commit's OWN JSON
  * actions ([[DeltaInterop.changesAt]] — O(new files), never a
  * snapshot replay), and batches are plain parquet scans of the added
  * files with partition values attached from the log, rewrapped
  * streaming — vectorized reads, pruning and pushdown intact.
  *
  * Change semantics are Delta's own source contract: appends stream
  * exactly once; version 0 is initial data and always streams; a
  * commit that REMOVES files (overwrite / MERGE / DELETE rewrites)
  * raises by name unless `ignoreChanges=true` opts into re-emitting
  * its added files. `startingVersion` = `earliest` (default) /
  * `latest` / a version number; `maxVersionsPerTrigger` bounds a
  * catch-up batch. The table's schema and partition columns are
  * resolved ONCE at stream start — a mid-stream metaData change does
  * not retype in-flight batches (restart the stream to pick it up,
  * Delta's own behavior). */
final class DeltaStreamProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta stream needs a table path: .load(dir) or " +
        ".option(\"path\", dir)"))

  private def cdf(parameters: Map[String, String]): Boolean =
    parameters.get("readchangefeed").exists(_.toBoolean)

  private def withCdfCols(schema: StructType): StructType =
    StructType(schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_commit_timestamp",
        org.apache.spark.sql.types.TimestampType)))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), schema.getOrElse {
      val base = DeltaInterop.state(
        sqlContext.sparkSession, tablePath(parameters), None).schema
      if (cdf(parameters)) withCdfCols(base) else base
    })

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val path = tablePath(parameters)
    val st = DeltaInterop.state(spark, path, None)
    new DeltaStreamSource(spark, path,
      schema.getOrElse(
        if (cdf(parameters)) withCdfCols(st.schema) else st.schema),
      st.partitionColumns,
      parameters.getOrElse("startingversion", "earliest"),
      parameters.get("ignorechanges").exists(_.toBoolean),
      parameters.get("maxversionspertrigger").map(_.toInt)
        .getOrElse(Int.MaxValue),
      readChangeFeed = cdf(parameters))
  }
}

/** See [[DeltaStreamProvider]]. */
final class DeltaStreamSource(spark: SparkSession, table: String,
                              override val schema: StructType,
                              partitionColumns: Seq[String],
                              startingVersion: String,
                              ignoreChanges: Boolean,
                              maxVersionsPerTrigger: Int,
                              readChangeFeed: Boolean = false)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow
    with org.apache.spark.sql.connector.read.streaming.ReportsSourceMetrics {

  /** Version BEFORE the first streamed one (exclusive lower bound) —
    * Delta versions are 0-based, so `earliest` means bound −1. */
  private val boundary: Long = startingVersion match {
    case "earliest" => -1L
    case "latest" =>
      DeltaInterop.currentVersion(spark, table).getOrElse(-1L)
    case v => v.toLong - 1
  }

  private def versionOf(o: OffsetV1): Long = o.json.trim.toLong

  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = DeltaInterop.currentVersion(spark, table)

  override def getOffset: Option[OffsetV1] = {
    val cur = DeltaInterop.currentVersion(spark, table)
    availableNowCap.fold(cur)(cap => cur.map(_.min(cap)))
      .filter(_ > boundary).map(new LongOffset(_))
  }

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
    // CHANGE-DATA-FEED mode: the batch is the row-level changes of
    // (from, to], through [[DeltaInterop.changeFeed]] — cdc actions
    // authoritative, insert/delete derivation otherwise, with its
    // refusals (feed disabled, DV derivation, mid-range schema
    // change) surfacing as stream failures rather than wrong rows.
    // ignoreChanges is not consulted: removes ARE the deletes here.
    if (readChangeFeed) {
      val cf = StreamBridge.asStreaming(
        DeltaInterop.changeFeed(spark, table, from + 1, to))
      // a range with no row-level changes (metadata-only commits)
      // yields a LOCAL empty frame asStreaming cannot re-mark — the
      // engine still asserts isStreaming on it
      return if (cf.isStreaming) cf
      else StreamBridge.emptyStreaming(spark, schema)
    }
    val added = ((from + 1) to to).flatMap { v =>
      val ch = DeltaInterop.changesAt(spark, table, v)
      if (ch.removed.nonEmpty && v != 0 && !ignoreChanges)
        throw new UnsupportedOperationException(
          s"version $v of $table removed files (overwrite/merge/delete " +
            "rewrite) — not incrementally streamable. Set " +
            "ignoreChanges=true to emit its added files (rows of " +
            "rewritten files will re-emit), or stream from a version " +
            "past it.")
      ch.added
    }
    if (added.isEmpty) StreamBridge.emptyStreaming(spark, schema)
    else StreamBridge.asStreaming(
      DeltaInterop.filesToDF(spark, table, schema, partitionColumns, added))
  }

  override def metrics(latestConsumedOffset: java.util.Optional[
      org.apache.spark.sql.connector.read.streaming.Offset])
      : java.util.Map[String, String] = {
    val consumed =
      if (latestConsumedOffset.isPresent)
        latestConsumedOffset.get.json.trim.toLong
      else boundary
    val latest = DeltaInterop.currentVersion(spark, table)
      .getOrElse(boundary)
    java.util.Collections.singletonMap("versionsBehind",
      math.max(0L, latest - consumed).toString)
  }

  override def stop(): Unit = ()

  override def toString: String = s"DeltaStreamSource[$table]"
}
