package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, expr, lit, when}
import org.apache.spark.sql.types.{StructField, StructType}

/** WRITER-OBLIGATION gate for Delta commits — the write-side twin of
  * the reader's feature check ([[DeltaInterop]] `checkProtocol`).
  *
  * The Delta protocol (delta.io PROTOCOL.md) attaches OBLIGATIONS to
  * the writer side of a table's protocol action: a writer that does
  * not implement `minWriterVersion` / every `writerFeatures` entry
  * must refuse to commit, and several features carry per-commit
  * duties even when implemented — `appendOnly` forbids data-removing
  * commits, `checkConstraints` (`delta.constraints.*`) and
  * `invariants` (field-metadata `delta.invariants`, plus
  * `nullable=false`) must hold on every row a commit adds, and
  * `generatedColumns` (`delta.generationExpression`) requires the
  * stored value to satisfy the recorded expression. Without this
  * gate a graft commit could silently corrupt a FOREIGN table's
  * invariants — delta-spark trusts landed rows and never re-checks.
  *
  * Every [[DeltaInterop]] commit path calls [[requireWritable]]
  * before touching the table and [[validateAddsOrAbort]] on the
  * files it staged, BEFORE publishing: a violation deletes the
  * staged files and aborts with the constraint named — nothing
  * lands, the log version does not move (the
  * [[ManifestLake]] `validateStagedChecks` discipline: validate what
  * actually landed on disk, not the incoming plan, because plans may
  * be non-deterministic).
  *
  * Scale shape: the protocol gate is O(1) driver-side over
  * already-replayed state; validation is one codegen'd scan bounded
  * by the COMMIT's new files (never the table), `limit(1)` on the
  * first violation.
  */
object DeltaWriteGate {
  import DeltaInterop.{DeltaAdd, DeltaState, UnsupportedDeltaFeatureException}

  /** A commit would violate a recorded CHECK constraint, column
    * invariant, NOT NULL, or generated-column expression. The data
    * never landed: staged files are deleted before this throws. */
  final class DeltaConstraintViolationException(msg: String)
    extends RuntimeException(msg)

  /** Writer features whose WRITE-side obligations this writer honors:
    *  - `appendOnly` — [[requireWritable]] refuses data-removing verbs
    *    when `delta.appendOnly=true` (dataChange=false rewrites, i.e.
    *    OPTIMIZE, stay legal, matching delta-spark);
    *  - `invariants` / `checkConstraints` — [[validateAddsOrAbort]]
    *    proves every added file against `delta.invariants` field
    *    metadata, `nullable=false`, and `delta.constraints.*`;
    *  - `generatedColumns` — stored values are validated against the
    *    recorded `delta.generationExpression` (null-safe equality) on
    *    every added file;
    *  - `identityColumns` — plain appends ALLOCATE values past the
    *    recorded `delta.identity.highWaterMark` (respecting
    *    start/step; GENERATED ALWAYS refuses explicit values,
    *    `allowExplicitInsert` accepts them) and the commit advances
    *    the mark; every OTHER data-adding verb (merge inserts) still
    *    refuses by name (`identityHandled` marks the paths that
    *    allocate);
    *  - `changeDataFeed` — DML paths stage cdc files when
    *    `delta.enableChangeDataFeed=true` (appends need none: the
    *    spec derives inserts from dataChange adds);
    *  - `columnMapping` / `deletionVectors` — native write paths;
    *  - `inCommitTimestamps` — `publishCommit` emits the monotonic
    *    ICT on enabled tables;
    *  - `v2Checkpoint` — spec-legal classic "compatibility"
    *    checkpoints are what [[DeltaInterop.checkpoint]] writes;
    *  - `timestampNtz` / `typeWidening` / `variantType` — type-level,
    *    no per-commit duty beyond writing the recorded types;
    *  - `allowColumnDefaults` — honored: an append that OMITS a
    *    column carrying `CURRENT_DEFAULT` field metadata APPLIES the
    *    recorded constant ([[DeltaInterop.write]]'s fill; declared
    *    via [[DeltaInterop.setColumnDefault]] / `ALTER COLUMN ... SET
    *    DEFAULT`), and the spec lets explicit values win;
    *  - `vacuumProtocolCheck` — its whole duty is running the
    *    protocol check before deleting files, which
    *    [[DeltaInterop.vacuum]] does (this very gate, first thing);
    *  - `checkpointProtection` — duties attach to metadata CLEANUP
    *    below `requireCheckpointProtectionBeforeVersion`;
    *    [[DeltaInterop.vacuum]] refuses by name when its log cleanup
    *    would cross that line (this writer does not produce
    *    protected checkpoints);
    *  - `domainMetadata` — data commits never touch domains, and
    *    CHECKPOINTs preserve every live domain action (state replay
    *    carries them);
    *  - `rowTracking` — plain appends ASSIGN `baseRowId` /
    *    `defaultRowCommitVersion` and advance the
    *    `delta.rowTracking` domain's high-water mark; checkpoints
    *    preserve both; every other data verb refuses by name
    *    (`rowTrackingHandled` marks the honoring paths);
    *  - `clustering` (liquid clustering) — the protocol's duty is to
    *    PRESERVE the `delta.clustering` domain metadata (data commits
    *    never touch domains, checkpoints replay every live domain)
    *    and writers may add unclustered data; graft's OPTIMIZE goes
    *    further and RE-CLUSTERS on the recorded clustering columns
    *    ([[DeltaInterop.optimize]]).
    *  - `icebergCompatV2` (UniForm) — when
    *    `delta.enableIcebergCompatV2=true`, every staged data file
    *    carries `parquet.field.id` footer metadata equal to the
    *    column's recorded `delta.columnMapping.id`
    *    ([[DeltaInterop]] `stampCompatIds` on every data staging
    *    site), so the Iceberg mirror resolves them by id; the compat
    *    requires column mapping and forbids deletion vectors —
    *    tables violating either refuse writes by name.
    * Anything else — `icebergCompatV1` (a different field-id
    * contract), unknown future features — refuses BY NAME, the same
    * courtesy the reader extends. */
  val SupportedWriterFeatures: Set[String] = Set(
    "appendOnly", "invariants", "checkConstraints", "changeDataFeed",
    "generatedColumns", "columnMapping", "identityColumns",
    "deletionVectors", "inCommitTimestamp", "inCommitTimestamps",
    "v2Checkpoint", "timestampNtz", "typeWidening", "variantType",
    "allowColumnDefaults", "vacuumProtocolCheck",
    "checkpointProtection", "domainMetadata", "clustering",
    "icebergCompatV2")

  /** Refuse the commit unless this writer can honor every obligation
    * the table's protocol attaches to it. `removesData` = the verb
    * emits `remove` actions (or deletion vectors) with
    * `dataChange=true` — DELETE / UPDATE / MERGE with matched or
    * not-matched-by-source clauses / overwrite / RESTORE; plain
    * appends and dataChange=false rewrites (OPTIMIZE) pass an
    * append-only table. `addsData` = the verb lands new rows —
    * drives the identity-column refusal (this writer cannot allocate
    * identity values). */
  def requireWritable(st: DeltaState, table: String, op: String,
                      removesData: Boolean,
                      addsData: Boolean,
                      identityHandled: Boolean = false,
                      rowTrackingHandled: Boolean = false): Unit = {
    if (st.minWriterVersion > 7)
      throw new UnsupportedDeltaFeatureException(
        s"$op on $table requires minWriterVersion=" +
          s"${st.minWriterVersion} — versions 1-7 (table features) " +
          "are the supported writer surface")
    val unsupported = st.writerFeatures.filterNot(SupportedWriterFeatures)
      // rowTracking is honored by the paths that ASSIGN base row ids
      // (plain appends and the checkpoint, which preserves them);
      // everything else keeps refusing it by name — a rewrite that
      // dropped assigned row ids would corrupt the tracking
      .filterNot(f => rowTrackingHandled && f == "rowTracking")
    if (unsupported.nonEmpty)
      throw new UnsupportedDeltaFeatureException(
        s"$op on $table requires writer features " +
          s"${unsupported.mkString("[", ", ", "]")} — not supported " +
          "by this writer; committing anyway could corrupt the " +
          "table's invariants")
    // icebergCompatV2's PRECONDITIONS (delta.io PROTOCOL.md / UniForm):
    // column mapping must be on (field ids come from its assigned
    // ids) and deletion vectors must be off (the V2 compat has no DV
    // mirror story) — a foreign table violating either cannot be
    // written compatibly, so refuse by name rather than break its
    // Iceberg mirror
    if (st.writerFeatures.contains("icebergCompatV2") &&
      st.configuration.get("delta.enableIcebergCompatV2")
        .contains("true")) {
      if (st.columnMappingMode == "none")
        throw new UnsupportedDeltaFeatureException(
          s"$op on $table: delta.enableIcebergCompatV2=true requires " +
            "column mapping (field ids are the mapping's ids), but " +
            "the table's mode is 'none' — malformed compat table, " +
            "refusing to write")
      if (st.configuration.get("delta.enableDeletionVectors")
        .contains("true"))
        throw new UnsupportedDeltaFeatureException(
          s"$op on $table: delta.enableIcebergCompatV2=true forbids " +
            "deletion vectors, but the table enables them — " +
            "malformed compat table, refusing to write")
    }
    if (removesData &&
      st.configuration.get("delta.appendOnly").contains("true"))
      throw new UnsupportedDeltaFeatureException(
        s"$op on $table would remove data, but the table declares " +
          "delta.appendOnly=true — only appends (and " +
          "dataChange=false rewrites) are legal commits")
    if (addsData) {
      if (!identityHandled) {
        val identity = st.schema.fields.filter(f =>
          f.metadata.contains("delta.identity.start") ||
            f.metadata.contains("delta.identity.step"))
        if (identity.nonEmpty)
          throw new UnsupportedDeltaFeatureException(
            s"$op on $table: column(s) " +
              s"${identity.map(_.name).mkString("[", ", ", "]")} are " +
              "IDENTITY columns — this path does not allocate identity " +
              "values or advance their high-water mark (plain appends " +
              "do)")
      }
      // NESTED obligations refuse on EVERY data-adding verb —
      // identityHandled marks paths that allocate identity values, it
      // says nothing about nested invariants, so the refusal must not
      // hide behind it (a plain append to a table whose struct fields
      // carry invariants would otherwise land unvalidated rows)
      val nested = nestedObligations(st.schema)
      if (nested.nonEmpty)
        throw new UnsupportedDeltaFeatureException(
          s"$op on $table: nested field(s) " +
            s"${nested.mkString("[", ", ", "]")} carry invariants / " +
            "generation expressions — this writer validates " +
            "top-level obligations only and refuses rather than " +
            "skip one")
    }
  }

  /** [[DeltaInterop.checkpoint]]'s gate: a checkpoint this writer
    * produces reconstructs protocol + metaData + file actions but NOT
    * `domainMetadata` actions — on a table whose protocol carries
    * that feature, a graft checkpoint would silently drop recorded
    * domains (e.g. row-tracking high-water marks) for any reader that
    * starts from it. Refuse that one verb by name. */
  def requireCheckpointable(st: DeltaState, table: String): Unit =
    requireWritable(st, table, "CHECKPOINT", removesData = false,
      addsData = false, rowTrackingHandled = true)

  /** Nested struct fields carrying write obligations this gate only
    * enforces at the top level — returned as dotted paths so
    * [[requireWritable]] can refuse them by name. */
  private def nestedObligations(schema: StructType): Seq[String] = {
    def walk(prefix: String, f: StructField): Seq[String] = {
      val here =
        if (prefix.nonEmpty && (f.metadata.contains("delta.invariants") ||
          f.metadata.contains("delta.generationExpression")))
          Seq(s"$prefix${f.name}")
        else Nil
      f.dataType match {
        case s: StructType =>
          here ++ s.fields.toSeq.flatMap(walk(s"$prefix${f.name}.", _))
        case _ => here
      }
    }
    schema.fields.toSeq.flatMap(f => f.dataType match {
      case s: StructType => s.fields.toSeq.flatMap(walk(s"${f.name}.", _))
      case _ => Nil
    })
  }

  /** The table's recorded per-row write obligations as
    * `(name, violated-when-true)` columns over LOGICAL names:
    *  - `delta.constraints.<name>` configuration entries — SQL CHECK
    *    semantics (NULL passes);
    *  - `delta.invariants` field metadata (the spec's
    *    `{"expression":{"expression":<sql>}}` wrapper) — CHECK
    *    semantics, matching delta-spark's enforcement;
    *  - `nullable=false` fields — the spec's NOT NULL invariant;
    *  - `delta.generationExpression` field metadata — the stored
    *    value must null-safe-equal the expression over its row.
    * An expression that does not parse refuses by name up front —
    * never a silently skipped obligation. */
  private[sources] def rowObligations(st: DeltaState,
                                      table: String): Seq[(String, Column)] = {
    def checkViolated(sql: String): Column =
      !coalesce(expr(sql), lit(true))
    val constraints = st.configuration.toSeq.collect {
      case (k, sql) if k.startsWith("delta.constraints.") =>
        s"CHECK ${k.stripPrefix("delta.constraints.")} ($sql)" ->
          checkViolated(sql)
    }
    val fieldObligations = st.schema.fields.toSeq.flatMap { f =>
      val inv = if (f.metadata.contains("delta.invariants")) {
        val sql = parseInvariant(
          f.metadata.getString("delta.invariants"), f.name, table)
        Seq(s"invariant on ${f.name} ($sql)" -> checkViolated(sql))
      } else Nil
      val notNull =
        if (!f.nullable) Seq(s"${f.name} NOT NULL" -> col(f.name).isNull)
        else Nil
      val gen = if (f.metadata.contains("delta.generationExpression")) {
        val sql = f.metadata.getString("delta.generationExpression")
        Seq(s"generated column ${f.name} AS ($sql)" ->
          !(col(f.name) <=> tryExpr(sql, s"generated column ${f.name}",
            table)))
      } else Nil
      inv ++ notNull ++ gen
    }
    constraints ++ fieldObligations
  }

  private def tryExpr(sql: String, what: String, table: String): Column =
    try expr(sql)
    catch {
      case scala.util.control.NonFatal(e) =>
        throw new UnsupportedDeltaFeatureException(
          s"$what on $table does not parse as Spark SQL ($sql): " +
            s"${e.getMessage} — refusing to write rather than skip " +
            "the obligation")
    }

  /** `delta.invariants` metadata value →  the wrapped SQL. The spec's
    * shape is `{"expression":{"expression":"<sql>"}}`; a bare SQL
    * string (some writers record that) passes through. */
  private def parseInvariant(raw: String, field: String,
                             table: String): String = {
    val trimmed = raw.trim
    if (!trimmed.startsWith("{")) return trimmed
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(trimmed) \ "expression" \ "expression" match {
      case JString(sql) => sql
      case _ =>
        throw new UnsupportedDeltaFeatureException(
          s"invariant on $field of $table has an unrecognized " +
            s"delta.invariants shape ($raw) — refusing to write " +
            "rather than skip the obligation")
    }
  }

  /** Validate freshly STAGED files (already moved under the table
    * root, commit NOT yet published) against the table's row
    * obligations. One scan bounded by the commit's new files; first
    * violation deletes every staged file and aborts — nothing landed,
    * the log version does not move. `schema`/`partitionColumns`
    * describe the state the commit will RECORD (they differ from
    * `st` only on schema-changing overwrites). */
  private[sources] def validateAddsOrAbort(spark: SparkSession,
      table: String, st: DeltaState, schema: StructType,
      partitionColumns: Seq[String], adds: Seq[DeltaAdd], op: String,
      fs: FileSystem, root: Path): Unit = {
    val checks = rowObligations(st.copy(schema = schema), table)
    if (checks.isEmpty || adds.isEmpty) return
    def abort(e: Throwable): Nothing = {
      adds.foreach(a => scala.util.Try(
        fs.delete(new Path(root, a.path), false)): Unit)
      throw e
    }
    try {
      val marker = coalesce(checks.map { case (name, violated) =>
        when(violated, lit(name))
      }: _*)
      val bad = DeltaInterop.filesToDF(spark, table, schema,
        partitionColumns, adds, st.columnMappingMode)
        .withColumn("__violated", marker)
        .filter(col("__violated").isNotNull).limit(1).collect()
      bad.headOption.foreach { row =>
        abort(new DeltaConstraintViolationException(
          s"$op on $table violates ${row.getAs[String]("__violated")} " +
            s"— e.g. $row. The commit was aborted; nothing landed."))
      }
    } catch {
      case e: DeltaConstraintViolationException => throw e
      case e: UnsupportedDeltaFeatureException => abort(e)
      case e: org.apache.spark.sql.AnalysisException =>
        // a recorded obligation that no longer ANALYZES against the
        // schema this commit records (e.g. a schema-changing
        // overwrite dropping a constrained column): the write would
        // orphan the obligation — refuse by name, files cleaned up
        abort(new UnsupportedDeltaFeatureException(
          s"$op on $table: a recorded constraint/invariant no longer " +
            s"analyzes against the written schema — ${e.getMessage}"))
    }
  }
}
