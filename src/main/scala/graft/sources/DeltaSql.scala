package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}

/** SQL surface over [[DeltaInterop]] tables:
  * `SELECT ... FROM graft_delta.<name> [VERSION AS OF n]` — the same
  * resolution-rule approach as [[LakeSql]] (rewrite to the exact
  * parquet scan the API read plans, keeping vectorized reads, pushdown
  * and codegen) for tables whose source of truth is a Delta log — plus
  * row-level DML: `DELETE FROM graft_delta.t WHERE ...` executes
  * [[DeltaInterop.delete]]'s merge-on-read deletion-vector commit and
  * `UPDATE graft_delta.t SET ... [WHERE ...]` executes
  * [[DeltaInterop.update]]'s copy-on-write touched-file rewrite, and
  * the plain-upsert `MERGE INTO` shape executes [[DeltaInterop.merge]].
  * Bulk writes go through [[DeltaInterop.write]] or, better,
  * [[DeltaInterop.importToManifest]] and the full `graft_lake`
  * surface. */
object DeltaSql {

  val Namespace = "graft_delta"

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Register `name` so SQL can address the Delta table at `path` as
    * `graft_delta.name`. Process-scoped, like a catalog namespace. */
  def register(name: String, path: String): Unit =
    tables.put(name.toLowerCase(java.util.Locale.ROOT), path): Unit

  def pathOf(name: String): Option[String] =
    Option(tables.get(name.toLowerCase(java.util.Locale.ROOT)))

  def unregister(name: String): Unit =
    tables.remove(name.toLowerCase(java.util.Locale.ROOT)): Unit

  // the $-suffix inspection tables
  private val metaTables
      : Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "$history" -> ((s, t) => DeltaInterop.history(s, t)),
    "$files" -> ((s, t) => DeltaInterop.filesTable(s, t)),
    "$detail" -> ((s, t) => DeltaInterop.detail(s, t)))

  private def metaSuffixOf(ident: String)
      : Option[(String, (SparkSession, String) => DataFrame)] =
    metaTables.find { case (suffix, _) =>
      ident.endsWith(suffix) &&
        pathOf(ident.stripSuffix(suffix)).isDefined
    }

  /** The registry listing (name → path) — `SHOW TABLES IN
    * graft_delta`'s source. */
  def registered: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    tables.asScala.toMap
  }

  private def deltaTarget(u: UnresolvedRelation): Option[String] =
    if (u.multipartIdentifier.length == 2 &&
      u.multipartIdentifier.head.equalsIgnoreCase(Namespace))
      pathOf(u.multipartIdentifier(1))
    else None

  /** An ALTER statement's target path (UnresolvedTable shape). */
  private def alterTarget(plan: LogicalPlan): Option[String] = plan match {
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
      if t.multipartIdentifier.length == 2 &&
        t.multipartIdentifier.head.equalsIgnoreCase(Namespace) =>
      pathOf(t.multipartIdentifier(1))
    case _ => None
  }

  /** A DML statement's target path, through an optional alias. */
  private def dmlTarget(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => dmlTarget(child)
    case u: UnresolvedRelation => deltaTarget(u)
    case _ => None
  }

  /** The names a DML target's columns may legally be qualified by. */
  private def targetQualifiers(plan: LogicalPlan): Set[String] = {
    val root = java.util.Locale.ROOT
    plan match {
      case SubqueryAlias(id, child) =>
        targetQualifiers(child) + id.name.toLowerCase(root)
      case u: UnresolvedRelation if u.multipartIdentifier.length == 2 =>
        val t = u.multipartIdentifier(1).toLowerCase(root)
        Set(t, s"${Namespace.toLowerCase(root)}.$t")
      case _ => Set.empty
    }
  }

  /** Strip relation qualifiers from a DML expression's attributes: the
    * command evaluates it against the bare table read, where `t.id`
    * would not resolve but `id` does. */
  private def unqualify(cond: Expression): Expression = cond.transform {
    case UnresolvedAttribute(parts) if parts.length > 1 =>
      UnresolvedAttribute(Seq(parts.last))
  }

  /** `DELETE FROM graft_delta.t` — [[DeltaInterop.delete]]'s
    * merge-on-read deletion-vector commit when the command runs. */
  final case class GraftDeltaDeleteCommand(table: String,
      @transient predicate: org.apache.spark.sql.Column)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      DeltaInterop.delete(spark, table, predicate): Unit
      Seq.empty
    }
  }

  /** Session conf choosing how SQL `UPDATE` executes: `cow` (default
    * — [[DeltaInterop.update]]'s touched-file rewrite) or `mor`
    * ([[DeltaInterop.updateMor]]'s deletion-vector + append commit,
    * the small-update-on-big-files shape). The `graft_lake` analog of
    * [[LakeSql.DmlModeConf]]. */
  val DmlModeConf = "spark.graft.delta.dmlMode"

  /** `UPDATE graft_delta.t SET ...` — [[DeltaInterop.update]]'s
    * copy-on-write touched-file rewrite, or
    * [[DeltaInterop.updateMor]]'s deletion-vector commit under
    * [[DmlModeConf]] `mor`; assignments evaluate against the
    * pre-update row, SQL-style. */
  final case class GraftDeltaUpdateCommand(table: String,
      @transient assignments: Seq[(String, org.apache.spark.sql.Column)],
      @transient predicate: org.apache.spark.sql.Column)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      spark.conf.getOption(DmlModeConf) match {
        case Some("mor") =>
          DeltaInterop.updateMor(spark, table, predicate, assignments): Unit
        case None | Some("cow") =>
          DeltaInterop.update(spark, table, predicate, assignments): Unit
        case Some(other) => throw new IllegalArgumentException(
          s"$DmlModeConf must be 'cow' or 'mor', got '$other'")
      }
      Seq.empty
    }
  }

  /** `INSERT INTO` / `INSERT OVERWRITE` graft_delta.t —
    * [[DeltaInterop.write]]'s append/overwrite commit when the command
    * runs, under the table's recorded partitioning. Without a column
    * list: positional semantics over the full schema (SQL's INSERT
    * contract). With a column list (`INSERT INTO t (a, c) ...`): the
    * query's columns land on the NAMED columns positionally, and each
    * omitted column fills with its recorded `CURRENT_DEFAULT` (the
    * allowColumnDefaults duty — [[DeltaInterop.write]] applies it),
    * derives (generated), allocates (identity), or null-fills when
    * nullable; an omitted NOT NULL column with no default refuses by
    * name. INSERT OVERWRITE with a partial column list refuses —
    * overwrite is a schema-replacement verb, so the list may only
    * reorder the full schema. */
  final case class GraftDeltaInsertCommand(table: String, overwrite: Boolean,
      userCols: Seq[String],
      @transient source: org.apache.spark.sql.DataFrame)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      val st = DeltaInterop.state(spark, table, None)
      // SQL's store-assignment contract: provided values CAST to the
      // recorded column types (an INT literal lands in a BIGINT column)
      def storeCast(df: org.apache.spark.sql.DataFrame)
          : org.apache.spark.sql.DataFrame =
        df.select(df.columns.toIndexedSeq.map { c =>
          val rec = st.schema(c).dataType
          val cur = df.schema(c).dataType
          if (cur == rec) org.apache.spark.sql.functions.col(c)
          else org.apache.spark.sql.functions.col(c).cast(rec).as(c)
        }: _*)
      val positioned = if (userCols.isEmpty) {
        require(source.columns.length == st.schema.length,
          s"INSERT arity ${source.columns.length} does not match table " +
            s"$table (${st.schema.length} columns)")
        // positional semantics, SQL's INSERT contract: the query's
        // columns land in schema order regardless of their names
        storeCast(source.toDF(st.schema.fieldNames.toIndexedSeq: _*))
      } else {
        val root = java.util.Locale.ROOT
        val byLower = st.schema.fields
          .map(f => f.name.toLowerCase(root) -> f.name).toMap
        val named = userCols.map(c => byLower.getOrElse(
          c.toLowerCase(root), throw new IllegalArgumentException(
            s"INSERT column list names '$c' — not a column of $table")))
        require(named.distinct.length == named.length,
          s"INSERT column list repeats a column of $table")
        require(source.columns.length == named.length,
          s"INSERT arity ${source.columns.length} does not match its " +
            s"column list (${named.length} columns)")
        val omitted = st.schema.fields.filterNot(f => named.contains(f.name))
        if (overwrite && omitted.nonEmpty)
          throw new UnsupportedOperationException(
            s"INSERT OVERWRITE $table omits [${
              omitted.map(_.name).mkString(", ")}] — overwrite replaces " +
              "the table, so the column list may only reorder the full " +
              "schema; defaults apply to appends")
        // write() itself fills defaulted / generated / identity
        // columns; null-fill the plainly-omitted nullable rest here
        val filled = omitted.filter(f =>
          !f.metadata.contains(DeltaInterop.CurrentDefaultKey) &&
            !f.metadata.contains("delta.generationExpression") &&
            !f.metadata.contains("delta.identity.start"))
        filled.find(!_.nullable).foreach(f =>
          throw new IllegalArgumentException(
            s"INSERT into $table omits NOT NULL column '${f.name}', " +
              "which has no DEFAULT"))
        filled.foldLeft(storeCast(source.toDF(named.toIndexedSeq: _*)))(
          (acc, f) => acc.withColumn(f.name,
            org.apache.spark.sql.functions.lit(null).cast(f.dataType)))
      }
      DeltaInterop.write(positioned, table, st.partitionColumns,
        overwrite): Unit
      Seq.empty
    }
  }

  /** `ALTER TABLE graft_delta.t ALTER COLUMN c SET DEFAULT <expr> |
    * DROP DEFAULT` — [[DeltaInterop.setColumnDefault]] /
    * [[DeltaInterop.dropColumnDefault]]'s metadata-only commits. */
  final case class GraftDeltaColumnDefaultCommand(table: String,
      items: Seq[(String, Option[String])])
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      items.foreach {
        case (name, Some(sql)) =>
          DeltaInterop.setColumnDefault(spark, table, name, sql): Unit
        case (name, None) =>
          DeltaInterop.dropColumnDefault(spark, table, name): Unit
      }
      Seq.empty
    }
  }

  /** `MERGE INTO graft_delta.t USING src ON ... WHEN MATCHED THEN
    * UPDATE SET * WHEN NOT MATCHED THEN INSERT *` —
    * [[DeltaInterop.merge]]'s copy-on-write upsert when the command
    * runs. */
  final case class GraftDeltaMergeCommand(table: String, keyCols: Seq[String],
      @transient source: org.apache.spark.sql.DataFrame)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      DeltaInterop.merge(source, table, keyCols): Unit
      Seq.empty
    }
  }

  /** General-clause `MERGE INTO` — executes
    * [[DeltaInterop.mergeApply]] (conditional matched update/delete,
    * conditional insert, NOT-MATCHED-BY-SOURCE sync under the scoped
    * cost contract, first-match-wins) when the command runs.
    * [[LakeSql.FullTableMergeConf]] is read at execution — the one
    * whole-table opt-in serves all three dialects. */
  final case class GraftDeltaMergeApplyCommand(table: String,
      keyCols: Seq[String],
      matched: Seq[ManifestLake.MergeMatched],
      notMatched: Seq[ManifestLake.MergeInsert],
      notMatchedBySource: Seq[ManifestLake.MergeMatched],
      @transient scope: Option[org.apache.spark.sql.Column],
      @transient source: org.apache.spark.sql.DataFrame)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      DeltaInterop.mergeApply(source, table, keyCols, matched,
        notMatched, notMatchedBySource = notMatchedBySource,
        scope = scope,
        fullTableMerge = spark.conf
          .getOption(LakeSql.FullTableMergeConf).exists(_.toBoolean)): Unit
      Seq.empty
    }
  }

  /** `ALTER TABLE graft_delta.t ADD COLUMNS (...)` — [[DeltaInterop.addColumns]]'s
    * metadata-only widening when the command runs. */
  final case class GraftDeltaAddColumnsCommand(table: String,
      cols: Seq[org.apache.spark.sql.types.StructField])
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      DeltaInterop.addColumns(spark, table, cols): Unit
      Seq.empty
    }
  }

  /** `ALTER TABLE graft_delta.t ALTER COLUMN c TYPE <wider>` —
    * [[DeltaInterop.widenColumnType]]'s metadata-only type widening
    * (the `typeWidening` table feature) when the command runs. */
  final case class GraftDeltaWidenColumnCommand(table: String,
      items: Seq[(String, org.apache.spark.sql.types.DataType)])
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      items.foreach { case (name, to) =>
        DeltaInterop.widenColumnType(spark, table, name, to): Unit
      }
      Seq.empty
    }
  }

  /** `ALTER TABLE graft_delta.t RENAME COLUMN a TO b` —
    * [[DeltaInterop.renameColumn]]'s metadata-only rename. */
  final case class GraftDeltaRenameColumnCommand(table: String,
      from: String, to: String) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      DeltaInterop.renameColumn(spark, table, from, to): Unit
      Seq.empty
    }
  }

  /** `ALTER TABLE graft_delta.t DROP COLUMN ...` —
    * [[DeltaInterop.dropColumns]]'s metadata-only drop. */
  final case class GraftDeltaDropColumnsCommand(table: String,
      names: Seq[String]) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      DeltaInterop.dropColumns(spark, table, names): Unit
      Seq.empty
    }
  }

  final class DeltaSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

    private def readPlan(path: String, version: Option[Long]): LogicalPlan =
      PlanBridge.analyzedPlan(version match {
        case Some(v) => DeltaInterop.readVersion(spark, path, v)
        case None => DeltaInterop.read(spark, path)
      })

    private def versionOf(v: String): Long =
      scala.util.Try(java.lang.Long.parseLong(v)).getOrElse(
        throw new UnsupportedOperationException(
          s"graft_delta VERSION AS OF expects an integer version, got $v"))

    /** PARTITION pruning for SQL predicates — literal equality/range
      * conjuncts in a `WHERE` directly over a graft_delta relation swap
      * it for [[DeltaInterop.readPruned]]'s file set before resolution;
      * the ORIGINAL filter stays in the plan, so extraction misses cost
      * pruning, never rows. Top-down, before the relation rewrite. */
    private def filterPrune(plan: LogicalPlan): LogicalPlan = {
      import org.apache.spark.sql.catalyst.plans.logical.Filter
      plan.resolveOperatorsDown {
        case f @ Filter(cond, u: UnresolvedRelation)
          if deltaTarget(u).isDefined =>
          val preds = ScanPredicates.fromSqlCondition(cond)
          if (preds.isEmpty) f
          else f.copy(child = PlanBridge.analyzedPlan(
            DeltaInterop.readPruned(spark, deltaTarget(u).get, preds)))
        case f @ Filter(cond,
          RelationTimeTravel(u: UnresolvedRelation, None, Some(v)))
          if deltaTarget(u).isDefined =>
          val preds = ScanPredicates.fromSqlCondition(cond)
          if (preds.isEmpty) f
          else f.copy(child = PlanBridge.analyzedPlan(
            DeltaInterop.readPruned(spark, deltaTarget(u).get, preds,
              Some(versionOf(v)))))
      }
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      // DML matches at the ROOT (where SQL grammar puts it) so the
      // target relation is never rewritten into a bare read
      case m: MergeIntoTable if dmlTarget(m.targetTable).isDefined =>
        val src = applyReads(m.sourceTable)
        if (!src.resolved) m.copy(sourceTable = src) // wait for analyzer
        else {
          val path = dmlTarget(m.targetTable).get
          val tr = MergeSqlSupport.translate(m, src, "graft_delta",
            targetQualifiers(m.targetTable),
            () => DeltaInterop.state(spark, path, None).schema
              .fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
          if (tr.simple)
            GraftDeltaMergeCommand(path, tr.keys,
              PlanBridge.ofRows(spark, src))
          else
            GraftDeltaMergeApplyCommand(path, tr.keys, tr.matched,
              tr.inserts, tr.nmbs, tr.scope,
              PlanBridge.ofRows(spark, src))
        }
      case a: org.apache.spark.sql.catalyst.plans.logical.AddColumns
        if alterTarget(a.table).isDefined =>
        val cols = a.columnsToAdd.map { c =>
          if (c.default.nonEmpty)
            throw new UnsupportedOperationException(
              "graft_delta ADD COLUMNS with a DEFAULT: PROTOCOL.md " +
                "§Column Default Values forbids adding a column with a " +
                "default (Delta has no initial-default for existing " +
                "rows, unlike Iceberg v3) — ADD the column, then ALTER " +
                "COLUMN ... SET DEFAULT for future inserts")
          if (c.path.nonEmpty || c.position.nonEmpty)
            throw new UnsupportedOperationException(
              "graft_delta ALTER TABLE ADD COLUMNS supports plain top-level " +
                "columns only (no nested paths or FIRST/AFTER positions)")
          org.apache.spark.sql.types.StructField(c.colName, c.dataType,
            nullable = true)
        }
        GraftDeltaAddColumnsCommand(alterTarget(a.table).get, cols)
      case r: org.apache.spark.sql.catalyst.plans.logical.RenameColumn
        if alterTarget(r.table).isDefined =>
        if (r.column.name.length != 1)
          throw new UnsupportedOperationException(
            "graft_delta RENAME COLUMN supports top-level columns only")
        GraftDeltaRenameColumnCommand(alterTarget(r.table).get,
          r.column.name.head, r.newName)
      case ac: org.apache.spark.sql.catalyst.plans.logical.AlterColumns
        if alterTarget(ac.table).isDefined &&
          ac.specs.forall(s => s.newDefaultExpression.nonEmpty ||
            s.dropDefault) =>
        // `ALTER COLUMN c SET DEFAULT <expr> | DROP DEFAULT` —
        // [[DeltaInterop.setColumnDefault]]'s metadata-only commit
        // under the allowColumnDefaults writer feature
        val items = ac.specs.map { s =>
          if (s.newDataType.nonEmpty || s.newNullability.nonEmpty ||
            s.newComment.nonEmpty || s.newPosition.nonEmpty)
            throw new UnsupportedOperationException(
              "graft_delta ALTER COLUMN: SET/DROP DEFAULT cannot be " +
                "combined with other column changes in one statement")
          if (s.column.name.length != 1)
            throw new UnsupportedOperationException(
              "graft_delta ALTER COLUMN supports top-level columns only")
          s.column.name.head -> s.newDefaultExpression.map(_.originalSQL)
        }
        GraftDeltaColumnDefaultCommand(alterTarget(ac.table).get, items)
      case ac: org.apache.spark.sql.catalyst.plans.logical.AlterColumns
        if alterTarget(ac.table).isDefined =>
        val items = ac.specs.map { s =>
          if (s.newDataType.isEmpty || s.newNullability.nonEmpty ||
            s.newComment.nonEmpty || s.newPosition.nonEmpty ||
            s.newDefaultExpression.nonEmpty || s.dropDefault)
            throw new UnsupportedOperationException(
              "graft_delta ALTER COLUMN supports TYPE widening and " +
                "SET/DROP DEFAULT only (no nullability, comment, or " +
                "position changes)")
          if (s.column.name.length != 1)
            throw new UnsupportedOperationException(
              "graft_delta ALTER COLUMN supports top-level columns only")
          s.column.name.head -> s.newDataType.get
        }
        GraftDeltaWidenColumnCommand(alterTarget(ac.table).get, items)
      case d: org.apache.spark.sql.catalyst.plans.logical.DropColumns
        if alterTarget(d.table).isDefined =>
        if (d.ifExists)
          throw new UnsupportedOperationException(
            "graft_delta DROP COLUMN IF EXISTS is unsupported — drop by exact name")
        val names = d.columnsToDrop.map { c =>
          if (c.name.length != 1)
            throw new UnsupportedOperationException(
              "graft_delta DROP COLUMN supports top-level columns only")
          c.name.head
        }
        GraftDeltaDropColumnsCommand(alterTarget(d.table).get, names)
      case i: InsertIntoStatement if dmlTarget(i.table).isDefined =>
        if (i.partitionSpec.nonEmpty)
          throw new UnsupportedOperationException(
            "graft_delta INSERT supports no PARTITION spec")
        val q = applyReads(i.query)
        if (!q.resolved) i.copy(query = q) // wait for the analyzer
        else GraftDeltaInsertCommand(dmlTarget(i.table).get, i.overwrite,
          i.userSpecifiedCols, PlanBridge.ofRows(spark, q))
      case d: DeleteFromTable if dmlTarget(d.table).isDefined =>
        GraftDeltaDeleteCommand(dmlTarget(d.table).get,
          ColumnBridge.column(unqualify(d.condition)))
      case u: UpdateTable if dmlTarget(u.table).isDefined =>
        val quals = targetQualifiers(u.table)
        val assigns = u.assignments.map {
          case Assignment(k: UnresolvedAttribute, v) =>
            val parts = k.nameParts
            if (parts.length > 1 && !quals.contains(parts.init
                .map(_.toLowerCase(java.util.Locale.ROOT)).mkString(".")))
              throw new UnsupportedOperationException(
                s"graft_delta UPDATE target '${parts.mkString(".")}' is " +
                  "not a plain column of the target table — " +
                  "nested-field assignment is unsupported")
            parts.last -> ColumnBridge.column(unqualify(v))
          case a => throw new UnsupportedOperationException(
            s"graft_delta UPDATE: unsupported assignment ${a.sql}")
        }
        GraftDeltaUpdateCommand(dmlTarget(u.table).get, assigns,
          ColumnBridge.column(u.condition.fold[Expression](
            Literal.TrueLiteral)(unqualify)))
      case _ => applyReads(plan)
    }

    private def applyReads(plan: LogicalPlan): LogicalPlan =
      filterPrune(plan).resolveOperatorsUp {
        // `` graft_delta.`name$<meta>` `` — the inspection tables
        // (the lake's $-suffix idiom): $history, $files (live surface
        // incl. DV debt and row-tracking assignment), $detail
        // (DESCRIBE DETAIL) — all metadata-only reads
        case u: UnresolvedRelation
          if u.multipartIdentifier.length == 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase(Namespace) &&
            metaSuffixOf(u.multipartIdentifier(1)).isDefined =>
          val (suffix, fn) = metaSuffixOf(u.multipartIdentifier(1)).get
          PlanBridge.analyzedPlan(fn(spark,
            pathOf(u.multipartIdentifier(1).stripSuffix(suffix)).get))
        case RelationTimeTravel(u: UnresolvedRelation, None, Some(v))
          if deltaTarget(u).isDefined =>
          readPlan(deltaTarget(u).get, Some(versionOf(v)))
        // TIMESTAMP AS OF: delta's rule — the latest commit whose
        // monotonically-adjusted wall-clock timestamp is at or before
        // the asked instant (DeltaInterop.versionAt)
        case RelationTimeTravel(u: UnresolvedRelation, Some(ts), None)
          if deltaTarget(u).isDefined =>
          readPlan(deltaTarget(u).get,
            Some(DeltaInterop.versionAt(spark, deltaTarget(u).get,
              SqlTimeTravel.tsMillisOf(spark, ts))))
        case u: UnresolvedRelation if deltaTarget(u).isDefined =>
          readPlan(deltaTarget(u).get, None)
      }
  }
}
