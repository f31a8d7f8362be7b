package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** An Iceberg table as a STRUCTURED STREAMING SOURCE — subscribe to a
  * table some OTHER engine's Iceberg writer produces, pure Spark:
  *
  * {{{
  *   spark.readStream.format("graft-iceberg").load(tableDir)
  * }}}
  *
  * [[DeltaStreamProvider]]'s design for the second open format, with
  * one twist: Iceberg snapshot ids are RANDOM longs, so the offset a
  * checkpoint persists is the snapshot ID and ordering comes from the
  * table's snapshot-log lineage ([[IcebergInterop.snapshotLineage]]),
  * never from id magnitude. A batch `(s1, s2]` walks the lineage
  * between the two ids and emits each snapshot's appended files from
  * its manifest-list DIFF ([[IcebergInterop.changesAt]] — only new
  * manifests are opened, O(new files) per pure append). Batches are
  * plain parquet scans through the read kernel, so identity-partition
  * fill and vectorized reads apply.
  *
  * Change semantics mirror the Delta source contract: appends stream
  * exactly once; the FIRST snapshot is initial data and always
  * streams; a snapshot that rewrites or removes manifests
  * (overwrite / compaction / expiry holes) or adds DELETE manifests
  * raises by name unless `ignoreChanges=true` opts into emitting just
  * its appended data files. `startingSnapshot` = `earliest` (default)
  * / `latest` / a snapshot id; `maxSnapshotsPerTrigger` bounds a
  * catch-up batch. Schema and specs resolve ONCE at stream start. A
  * restart whose committed snapshot has since been EXPIRED refuses by
  * name instead of silently re-streaming history. */
final class IcebergStreamProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-iceberg stream needs a table path: .load(dir) or " +
        ".option(\"path\", dir)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), schema.getOrElse(IcebergInterop.state(
      sqlContext.sparkSession, tablePath(parameters), None).schema))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val path = tablePath(parameters)
    val st = IcebergInterop.state(spark, path, None)
    new IcebergStreamSource(spark, path,
      schema.getOrElse(st.schema), st.specs,
      parameters.getOrElse("startingsnapshot", "earliest"),
      parameters.get("ignorechanges").exists(_.toBoolean),
      parameters.get("maxsnapshotspertrigger").map(_.toInt)
        .getOrElse(Int.MaxValue))
  }
}

/** See [[IcebergStreamProvider]]. */
final class IcebergStreamSource(spark: SparkSession, table: String,
    override val schema: StructType,
    specs: Map[Int, Seq[IcebergInterop.SpecField]],
    startingSnapshot: String, ignoreChanges: Boolean,
    maxSnapshotsPerTrigger: Int)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow
    with org.apache.spark.sql.connector.read.streaming.ReportsSourceMetrics {

  /** Snapshot id BEFORE the first streamed one (exclusive lower
    * bound); None = stream everything from the first snapshot. */
  private val boundary: Option[Long] = startingSnapshot match {
    case "earliest" => None
    case "latest" =>
      IcebergInterop.snapshotLineage(spark, table).lastOption
    case v => Some(v.toLong)
  }

  private def lineage: Seq[Long] =
    IcebergInterop.snapshotLineage(spark, table)

  /** Lineage strictly after `fromId` (None = all); a from-id no longer
    * in the lineage refuses by name — it was expired, and guessing
    * a restart point would re-emit or skip data. */
  private def after(l: Seq[Long], fromId: Option[Long]): Seq[Long] =
    fromId match {
      case None => l
      case Some(id) =>
        val i = l.indexOf(id)
        if (i < 0) throw new IllegalArgumentException(
          s"snapshot $id of $table is no longer in the snapshot-log — " +
            "it was expired; the stream cannot resume from it")
        l.drop(i + 1)
    }

  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = lineage.lastOption

  private def capped(l: Seq[Long]): Seq[Long] =
    availableNowCap.fold(l) { c =>
      val i = l.indexOf(c)
      if (i < 0) l else l.take(i + 1)
    }

  override def getOffset: Option[OffsetV1] =
    after(capped(lineage), boundary).lastOption.map(new LongOffset(_))

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val from = Option(start).map(_.json.trim.toLong).orElse(boundary)
    after(capped(lineage), from).take(maxSnapshotsPerTrigger)
      .lastOption.map(new LongOffset(_)).orNull
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val l = lineage
    val from = start.map(_.json.trim.toLong).orElse(boundary)
    val endId = end.json.trim.toLong
    val pending = after(l, from)
    val endIdx = pending.indexOf(endId)
    // a checkpointed batch whose end snapshot left the lineage was
    // expired out from under the stream (restart recovery re-issues
    // the last committed batch) — refuse by name, never re-guess
    require(endIdx >= 0,
      s"end snapshot $endId of $table is not ahead of $from in the " +
        "snapshot-log — it was expired, or the table history changed " +
        "under the stream; the checkpoint cannot resume against this " +
        "table state")
    val batchIds = pending.take(endIdx + 1)
    val added = batchIds.flatMap { id =>
      val idx = l.indexOf(id)
      val parent = if (idx > 0) Some(l(idx - 1)) else None
      val ch = IcebergInterop.changesAt(spark, table, id, parent)
      if ((ch.rewrites || ch.addedDeletes) && parent.nonEmpty &&
        !ignoreChanges)
        throw new UnsupportedOperationException(
          s"snapshot $id of $table rewrites manifests or adds delete " +
            "files (overwrite/compaction/merge-on-read) — not " +
            "incrementally streamable. Set ignoreChanges=true to emit " +
            "its appended data files (rows of rewritten files will " +
            "re-emit), or stream from a snapshot past it.")
      ch.added
    }
    if (added.isEmpty) StreamBridge.emptyStreaming(spark, schema)
    else {
      // schema drift: the stream's schema was locked at start, and a
      // metadata-only evolution (rename/add/drop) can land under it.
      // Refuse by name when the table's shape at the batch end no
      // longer matches — a name-based read of new-schema files would
      // serve silent nulls. When the shape DOES match, the state's
      // evolution evidence rides along so files from any intermediate
      // schema generation still resolve by field id.
      val stNow = IcebergInterop.state(spark, table, Some(endId))
      def shape(s: StructType) =
        s.fields.toSeq.map(f => (f.name, f.dataType))
      if (shape(stNow.schema) != shape(schema))
        throw new UnsupportedOperationException(
          s"the schema of $table evolved under the stream (stream " +
            s"locked ${schema.simpleString}, table now " +
            s"${stNow.schema.simpleString}) — restart the stream to " +
            "pick up the new schema")
      StreamBridge.asStreaming(IcebergInterop.toDF(spark,
        IcebergInterop.IceState(0L, endId, schema, added, specs = specs,
          evo = stNow.evo)))
    }
  }

  override def metrics(latestConsumedOffset: java.util.Optional[
      org.apache.spark.sql.connector.read.streaming.Offset])
      : java.util.Map[String, String] = {
    val l = lineage
    val consumed =
      if (latestConsumedOffset.isPresent)
        Some(latestConsumedOffset.get.json.trim.toLong)
      else boundary
    val behind = consumed match {
      case None => l.length
      case Some(id) => l.length - (l.indexOf(id) + 1)
    }
    java.util.Collections.singletonMap("snapshotsBehind",
      math.max(0, behind).toString)
  }

  override def stop(): Unit = ()

  override def toString: String = s"IcebergStreamSource[$table]"
}
