package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}

/** SQL read surface over [[IcebergInterop]] tables:
  * `SELECT ... FROM graft_iceberg.<name> [VERSION AS OF <snapshot-id>]`
  * — the same resolution-rule approach as [[DeltaSql]] (rewrite to the
  * exact parquet scan the API read plans, keeping vectorized reads,
  * pushdown and codegen) for tables whose source of truth is Iceberg
  * metadata. `VERSION AS OF` takes a SNAPSHOT ID — Iceberg's stable
  * address — not an ordinal (metadata version numbers shift under
  * expiry; snapshot ids never do) — plus row-level DML:
  * `DELETE FROM graft_iceberg.t WHERE ...` and
  * `UPDATE graft_iceberg.t SET ... [WHERE ...]` execute
  * [[IcebergInterop.delete]]/[[IcebergInterop.update]]'s
  * copy-on-write touched-file rewrites (untouched manifests carry
  * verbatim), and the plain-upsert `MERGE INTO` shape executes
  * [[IcebergInterop.merge]]. Bulk writes go through [[IcebergInterop.write]] or,
  * better, [[IcebergInterop.importToManifest]] and the full
  * `graft_lake` surface. */
object IcebergSql {

  val Namespace = "graft_iceberg"

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Register `name` so SQL can address the Iceberg table at `path` as
    * `graft_iceberg.name`. Process-scoped, like a catalog namespace. */
  def register(name: String, path: String): Unit =
    tables.put(name.toLowerCase(java.util.Locale.ROOT), path): Unit

  def pathOf(name: String): Option[String] =
    Option(tables.get(name.toLowerCase(java.util.Locale.ROOT)))

  def unregister(name: String): Unit =
    tables.remove(name.toLowerCase(java.util.Locale.ROOT)): Unit

  /** The registry listing (name → path) — `SHOW TABLES IN
    * graft_iceberg`'s source. */
  def registered: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    tables.asScala.toMap
  }

  // ----------------------------------------------------------- views
  // Iceberg VIEWS (view spec v1) have their own registry — a name is
  // a view or a table, never both (create checks the other registry)
  private val views =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def registerView(name: String, path: String): Unit = {
    require(pathOf(name).isEmpty,
      s"graft_iceberg.$name is already a TABLE — views and tables " +
        "share the namespace")
    views.put(name.toLowerCase(java.util.Locale.ROOT), path): Unit
  }

  def viewPathOf(name: String): Option[String] =
    Option(views.get(name.toLowerCase(java.util.Locale.ROOT)))

  def unregisterView(name: String): Unit =
    views.remove(name.toLowerCase(java.util.Locale.ROOT)): Unit

  def registeredViews: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    views.asScala.toMap
  }

  // the $-suffix inspection tables, longest suffix first so a table
  // literally named `x$files$history` resolves deterministically
  private val metaTables
      : Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "$history" -> ((s, t) => IcebergInterop.history(s, t)),
    "$refs" -> ((s, t) => IcebergInterop.refsTable(s, t)),
    "$snapshots" -> ((s, t) => IcebergInterop.snapshotsTable(s, t)),
    "$manifests" -> ((s, t) => IcebergInterop.manifestsTable(s, t)),
    "$files" -> ((s, t) => IcebergInterop.filesTable(s, t)),
    "$partitions" -> ((s, t) => IcebergInterop.partitionsTable(s, t)),
    "$stats" -> ((s, t) => IcebergInterop.statsTable(s, t)))

  private def metaSuffixOf(ident: String)
      : Option[(String, (SparkSession, String) => DataFrame)] =
    metaTables.find { case (suffix, _) =>
      ident.endsWith(suffix) &&
        pathOf(ident.stripSuffix(suffix)).isDefined
    }

  private def iceTarget(u: UnresolvedRelation): Option[String] =
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
    case u: UnresolvedRelation => iceTarget(u)
    case _ => None
  }

  /** A DML statement's REST-catalog alias, when the target is a
    * registered `graft_iceberg_rest.<alias>`. */
  private def restTarget(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => restTarget(child)
    case u: UnresolvedRelation
      if u.multipartIdentifier.length == 2 &&
        u.multipartIdentifier.head.equalsIgnoreCase(
          IcebergRestCatalog.Namespace) &&
        IcebergRestCatalog.sqlEntry(u.multipartIdentifier(1)).isDefined =>
      Some(u.multipartIdentifier(1))
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

  /** Session conf choosing how SQL `DELETE FROM` and `UPDATE`
    * execute: `cow` (default — the touched-file rewrites) or `mor`
    * ([[IcebergInterop.deleteMor]]/[[IcebergInterop.updateMor]]'s
    * v2 position-delete commits, the small-DML-on-big-files shape). */
  val DmlModeConf = "spark.graft.iceberg.dmlMode"

  private def morDml(spark: SparkSession): Boolean =
    spark.conf.getOption(DmlModeConf) match {
      case None | Some("cow") => false
      case Some("mor") => true
      case Some(other) => throw new IllegalArgumentException(
        s"$DmlModeConf must be 'cow' or 'mor', got '$other'")
    }

  /** `DELETE FROM graft_iceberg.t` — [[IcebergInterop.delete]]'s
    * copy-on-write snapshot, or [[IcebergInterop.deleteMor]]'s
    * position-delete commit under [[DmlModeConf]] `mor`. */
  final case class GraftIcebergDeleteCommand(table: String,
      @transient predicate: org.apache.spark.sql.Column)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      if (morDml(spark))
        IcebergInterop.deleteMor(spark, table, predicate): Unit
      else IcebergInterop.delete(spark, table, predicate): Unit
      Seq.empty
    }
  }

  /** `UPDATE graft_iceberg.t SET ...` — [[IcebergInterop.update]]'s
    * copy-on-write touched-file rewrite ([[IcebergInterop.updateMor]]
    * under [[DmlModeConf]] `mor`); assignments evaluate against
    * the pre-update row, SQL-style. */
  final case class GraftIcebergUpdateCommand(table: String,
      @transient assignments: Seq[(String, org.apache.spark.sql.Column)],
      @transient predicate: org.apache.spark.sql.Column)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      if (morDml(spark))
        IcebergInterop.updateMor(spark, table, predicate, assignments): Unit
      else
        IcebergInterop.update(spark, table, predicate, assignments): Unit
      Seq.empty
    }
  }

  /** `INSERT INTO` / `INSERT OVERWRITE` graft_iceberg.t —
    * [[IcebergInterop.write]]'s append/overwrite commit when the command
    * runs, under the table's recorded partitioning. Positional
    * column semantics (SQL's INSERT contract). */
  final case class GraftIcebergInsertCommand(table: String, overwrite: Boolean,
      @transient source: org.apache.spark.sql.DataFrame)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      val st = IcebergInterop.state(spark, table, None)
      require(source.columns.length == st.schema.length,
        s"INSERT arity ${source.columns.length} does not match table " +
          s"$table (${st.schema.length} columns)")
      // positional semantics, SQL's INSERT contract: the query's
      // columns land in schema order regardless of their names
      val positioned = source.toDF(st.schema.fieldNames.toIndexedSeq: _*)
      IcebergInterop.write(positioned, table, overwrite,
        st.specs.getOrElse(st.defaultSpecId, Nil)): Unit
      Seq.empty
    }
  }

  /** `MERGE INTO graft_iceberg_rest.<alias> … UPDATE SET * / INSERT *`
    * — the kernel's copy-on-write upsert on a fresh staged mirror,
    * published through the catalog with bounded 409 re-load +
    * re-run. */
  final case class GraftIcebergRestMergeCommand(alias: String,
      keyCols: Seq[String],
      @transient source: org.apache.spark.sql.DataFrame)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      IcebergRestCatalog.sqlMutate(spark, alias)(dir =>
        IcebergInterop.merge(source, dir, keyCols): Unit)
      Seq.empty
    }
  }

  /** General-clause catalog `MERGE INTO` — [[IcebergInterop
    * .mergeApply]] on the staged mirror, published through the
    * catalog. */
  final case class GraftIcebergRestMergeApplyCommand(alias: String,
      keyCols: Seq[String],
      matched: Seq[ManifestLake.MergeMatched],
      notMatched: Seq[ManifestLake.MergeInsert],
      notMatchedBySource: Seq[ManifestLake.MergeMatched],
      @transient scope: Option[org.apache.spark.sql.Column],
      @transient source: org.apache.spark.sql.DataFrame)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      IcebergRestCatalog.sqlMutate(spark, alias)(dir =>
        IcebergInterop.mergeApply(source, dir, keyCols, matched,
          notMatched, notMatchedBySource = notMatchedBySource,
          scope = scope,
          fullTableMerge = spark.conf
            .getOption(LakeSql.FullTableMergeConf)
            .exists(_.toBoolean)): Unit)
      Seq.empty
    }
  }

  /** `DELETE FROM graft_iceberg_rest.<alias> WHERE …` — the kernel's
    * copy-on-write delete on a fresh staged mirror, published through
    * the catalog with bounded 409 re-load + re-run. */
  final case class GraftIcebergRestDeleteCommand(alias: String,
      @transient predicate: org.apache.spark.sql.Column)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      IcebergRestCatalog.sqlMutate(spark, alias)(dir =>
        IcebergInterop.delete(spark, dir, predicate): Unit)
      Seq.empty
    }
  }

  /** `UPDATE graft_iceberg_rest.<alias> SET … [WHERE …]` — the
    * kernel's copy-on-write update, published through the catalog. */
  final case class GraftIcebergRestUpdateCommand(alias: String,
      @transient assignments: Seq[(String, org.apache.spark.sql.Column)],
      @transient predicate: org.apache.spark.sql.Column)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      IcebergRestCatalog.sqlMutate(spark, alias)(dir =>
        IcebergInterop.update(spark, dir, predicate, assignments): Unit)
      Seq.empty
    }
  }

  /** `INSERT INTO graft_iceberg_rest.<alias>` — the catalog write
    * door: positional columns, landed through the client's
    * load → local append → commit with bounded 409 replay. */
  final case class GraftIcebergRestInsertCommand(alias: String,
      @transient source: org.apache.spark.sql.DataFrame)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      IcebergRestCatalog.sqlInsert(spark, alias, source)
      Seq.empty
    }
  }

  /** `MERGE INTO graft_iceberg.t USING src ON ... WHEN MATCHED THEN
    * UPDATE SET * WHEN NOT MATCHED THEN INSERT *` —
    * [[IcebergInterop.merge]]'s copy-on-write upsert when the command
    * runs. */
  final case class GraftIcebergMergeCommand(table: String, keyCols: Seq[String],
      @transient source: org.apache.spark.sql.DataFrame)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      IcebergInterop.merge(source, table, keyCols): Unit
      Seq.empty
    }
  }

  /** General-clause `MERGE INTO` — executes
    * [[IcebergInterop.mergeApply]] (conditional matched update/delete,
    * conditional insert, NOT-MATCHED-BY-SOURCE sync under the scoped
    * cost contract, first-match-wins) when the command runs.
    * [[LakeSql.FullTableMergeConf]] is read at execution — the one
    * whole-table opt-in serves all three dialects. */
  final case class GraftIcebergMergeApplyCommand(table: String,
      keyCols: Seq[String],
      matched: Seq[ManifestLake.MergeMatched],
      notMatched: Seq[ManifestLake.MergeInsert],
      notMatchedBySource: Seq[ManifestLake.MergeMatched],
      @transient scope: Option[org.apache.spark.sql.Column],
      @transient source: org.apache.spark.sql.DataFrame)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      IcebergInterop.mergeApply(source, table, keyCols, matched,
        notMatched, notMatchedBySource = notMatchedBySource,
        scope = scope,
        fullTableMerge = spark.conf
          .getOption(LakeSql.FullTableMergeConf).exists(_.toBoolean)): Unit
      Seq.empty
    }
  }

  /** `ALTER TABLE graft_iceberg.t ADD COLUMNS (...)` — [[IcebergInterop.addColumns]]'s
    * metadata-only widening when the command runs. */
  final case class GraftIcebergAddColumnsCommand(table: String,
      cols: Seq[org.apache.spark.sql.types.StructField])
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      IcebergInterop.addColumns(spark, table, cols): Unit
      Seq.empty
    }
  }

  /** `ALTER TABLE graft_iceberg.t RENAME COLUMN a TO b` —
    * [[IcebergInterop.renameColumn]]'s metadata-only rename. */
  final case class GraftIcebergRenameColumnCommand(table: String,
      from: String, to: String) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      IcebergInterop.renameColumn(spark, table, from, to): Unit
      Seq.empty
    }
  }

  /** `ALTER TABLE graft_iceberg.t DROP COLUMN ...` —
    * [[IcebergInterop.dropColumns]]'s metadata-only drop. */
  final case class GraftIcebergDropColumnsCommand(table: String,
      names: Seq[String]) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      IcebergInterop.dropColumns(spark, table, names): Unit
      Seq.empty
    }
  }

  final class IcebergSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

    private def readPlan(path: String,
                         snapshotId: Option[Long]): LogicalPlan =
      PlanBridge.analyzedPlan(snapshotId match {
        case Some(id) => IcebergInterop.readSnapshot(spark, path, id)
        case None => IcebergInterop.read(spark, path)
      })

    /** `VERSION AS OF` accepts a snapshot id OR a branch/tag name —
      * non-numeric versions resolve through the table's refs (the
      * `main` branch implicitly included). */
    private def snapshotOf(path: String, v: String): Long =
      scala.util.Try(java.lang.Long.parseLong(v)).getOrElse(
        IcebergInterop.resolveRef(spark, path, v))

    /** PARTITION pruning for SQL predicates — the rule-based analog of
      * the lake's derived-window pruning: a `WHERE` whose top-level
      * conjuncts carry literal equality/range predicates swaps the
      * relation for [[IcebergInterop.readPruned]]'s file set BEFORE
      * resolution erases the evidence the child was an Iceberg table.
      * The ORIGINAL filter stays in the plan (and pushes into the
      * surviving scan), so a shape the extractor cannot read costs
      * pruning, never rows. Runs TOP-DOWN before the relation
      * rewrite. */
    private def filterPrune(plan: LogicalPlan): LogicalPlan = {
      import org.apache.spark.sql.catalyst.plans.logical.Filter
      plan.resolveOperatorsDown {
        case f @ Filter(cond, u: UnresolvedRelation)
          if iceTarget(u).isDefined =>
          val preds = ScanPredicates.fromSqlCondition(cond)
          if (preds.isEmpty) f
          else f.copy(child = PlanBridge.analyzedPlan(
            IcebergInterop.readPruned(spark, iceTarget(u).get, preds)))
        case f @ Filter(cond,
          RelationTimeTravel(u: UnresolvedRelation, None, Some(v)))
          if iceTarget(u).isDefined =>
          val preds = ScanPredicates.fromSqlCondition(cond)
          if (preds.isEmpty) f
          else f.copy(child = PlanBridge.analyzedPlan(
            IcebergInterop.readPruned(spark, iceTarget(u).get, preds,
              Some(snapshotOf(iceTarget(u).get, v)))))
      }
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      // DML matches at the ROOT (where SQL grammar puts it) so the
      // target relation is never rewritten into a bare read
      case m: MergeIntoTable if restTarget(m.targetTable).isDefined =>
        val src = applyReads(m.sourceTable)
        if (!src.resolved) m.copy(sourceTable = src) // wait for analyzer
        else {
          val alias = restTarget(m.targetTable).get
          val tr = MergeSqlSupport.translate(m, src, "graft_iceberg_rest",
            targetQualifiers(m.targetTable),
            () => IcebergRestCatalog.sqlSchemaNames(spark, alias))
          if (tr.simple)
            GraftIcebergRestMergeCommand(alias, tr.keys,
              PlanBridge.ofRows(spark, src))
          else
            GraftIcebergRestMergeApplyCommand(alias, tr.keys, tr.matched,
              tr.inserts, tr.nmbs, tr.scope,
              PlanBridge.ofRows(spark, src))
        }
      case m: MergeIntoTable if dmlTarget(m.targetTable).isDefined =>
        val src = applyReads(m.sourceTable)
        if (!src.resolved) m.copy(sourceTable = src) // wait for analyzer
        else {
          val path = dmlTarget(m.targetTable).get
          val tr = MergeSqlSupport.translate(m, src, "graft_iceberg",
            targetQualifiers(m.targetTable),
            () => IcebergInterop.state(spark, path, None).schema
              .fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
          if (tr.simple)
            GraftIcebergMergeCommand(path, tr.keys,
              PlanBridge.ofRows(spark, src))
          else
            GraftIcebergMergeApplyCommand(path, tr.keys, tr.matched,
              tr.inserts, tr.nmbs, tr.scope,
              PlanBridge.ofRows(spark, src))
        }
      case a: org.apache.spark.sql.catalyst.plans.logical.AddColumns
        if alterTarget(a.table).isDefined =>
        val cols = a.columnsToAdd.map { c =>
          if (c.path.nonEmpty || c.position.nonEmpty || c.default.nonEmpty)
            throw new UnsupportedOperationException(
              "graft_iceberg ALTER TABLE ADD COLUMNS supports plain top-level " +
                "columns only (no nested paths, FIRST/AFTER positions, " +
                "or DEFAULT values)")
          org.apache.spark.sql.types.StructField(c.colName, c.dataType,
            nullable = true)
        }
        GraftIcebergAddColumnsCommand(alterTarget(a.table).get, cols)
      case r: org.apache.spark.sql.catalyst.plans.logical.RenameColumn
        if alterTarget(r.table).isDefined =>
        if (r.column.name.length != 1)
          throw new UnsupportedOperationException(
            "graft_iceberg RENAME COLUMN supports top-level columns only")
        GraftIcebergRenameColumnCommand(alterTarget(r.table).get,
          r.column.name.head, r.newName)
      case d: org.apache.spark.sql.catalyst.plans.logical.DropColumns
        if alterTarget(d.table).isDefined =>
        if (d.ifExists)
          throw new UnsupportedOperationException(
            "graft_iceberg DROP COLUMN IF EXISTS is unsupported — drop by exact name")
        val names = d.columnsToDrop.map { c =>
          if (c.name.length != 1)
            throw new UnsupportedOperationException(
              "graft_iceberg DROP COLUMN supports top-level columns only")
          c.name.head
        }
        GraftIcebergDropColumnsCommand(alterTarget(d.table).get, names)
      // INSERT INTO graft_iceberg_rest.<alias> — the catalog WRITE
      // door: the rows land through Client.appendWithRetry, so a 409
      // race re-loads and replays
      case i: InsertIntoStatement if restTarget(i.table).isDefined =>
        if (i.partitionSpec.nonEmpty || i.userSpecifiedCols.nonEmpty)
          throw new UnsupportedOperationException(
            "graft_iceberg_rest INSERT supports no PARTITION spec or " +
              "column list")
        if (i.overwrite)
          throw new UnsupportedOperationException(
            "graft_iceberg_rest INSERT OVERWRITE is unsupported — the " +
              "catalog door APPENDS (appendWithRetry); overwrite " +
              "through the Client API")
        val qr = applyReads(i.query)
        if (!qr.resolved) i.copy(query = qr) // wait for the analyzer
        else GraftIcebergRestInsertCommand(restTarget(i.table).get,
          PlanBridge.ofRows(spark, qr))
      case i: InsertIntoStatement if dmlTarget(i.table).isDefined =>
        if (i.partitionSpec.nonEmpty || i.userSpecifiedCols.nonEmpty)
          throw new UnsupportedOperationException(
            "graft_iceberg INSERT supports no PARTITION spec or column list")
        val q = applyReads(i.query)
        if (!q.resolved) i.copy(query = q) // wait for the analyzer
        else GraftIcebergInsertCommand(dmlTarget(i.table).get, i.overwrite,
          PlanBridge.ofRows(spark, q))
      // DELETE/UPDATE on graft_iceberg_rest.<alias>: the kernel DML
      // runs on a fresh staged mirror, the commit publishes through
      // the catalog, and a 409 re-loads and RE-RUNS the predicate
      // against the winner's state (bounded)
      case d: DeleteFromTable if restTarget(d.table).isDefined =>
        GraftIcebergRestDeleteCommand(restTarget(d.table).get,
          ColumnBridge.column(unqualify(d.condition)))
      case d: DeleteFromTable if dmlTarget(d.table).isDefined =>
        GraftIcebergDeleteCommand(dmlTarget(d.table).get,
          ColumnBridge.column(unqualify(d.condition)))
      case u: UpdateTable
        if restTarget(u.table).isDefined || dmlTarget(u.table).isDefined =>
        val quals = targetQualifiers(u.table)
        val assigns = u.assignments.map {
          case Assignment(k: UnresolvedAttribute, v) =>
            val parts = k.nameParts
            if (parts.length > 1 && !quals.contains(parts.init
                .map(_.toLowerCase(java.util.Locale.ROOT)).mkString(".")))
              throw new UnsupportedOperationException(
                s"graft_iceberg UPDATE target '${parts.mkString(".")}' " +
                  "is not a plain column of the target table — " +
                  "nested-field assignment is unsupported")
            parts.last -> ColumnBridge.column(unqualify(v))
          case a => throw new UnsupportedOperationException(
            s"graft_iceberg UPDATE: unsupported assignment ${a.sql}")
        }
        val cond = ColumnBridge.column(u.condition.fold[Expression](
          Literal.TrueLiteral)(unqualify))
        restTarget(u.table) match {
          case Some(alias) =>
            GraftIcebergRestUpdateCommand(alias, assigns, cond)
          case None =>
            GraftIcebergUpdateCommand(dmlTarget(u.table).get, assigns,
              cond)
        }
      case _ => applyReads(plan)
    }

    private def applyReads(plan: LogicalPlan): LogicalPlan =
      filterPrune(plan).resolveOperatorsUp {
        // `` graft_iceberg.`name$<meta>` `` — the inspection tables
        // (the lake's $-suffix idiom): $history, $refs, $snapshots,
        // $manifests, $files, $partitions — all metadata-only reads
        case u: UnresolvedRelation
          if u.multipartIdentifier.length == 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase(Namespace) &&
            metaSuffixOf(u.multipartIdentifier(1)).isDefined =>
          val (suffix, fn) = metaSuffixOf(u.multipartIdentifier(1)).get
          PlanBridge.analyzedPlan(fn(spark,
            pathOf(u.multipartIdentifier(1).stripSuffix(suffix)).get))
        // `graft_iceberg.<view>` — an Iceberg VIEW (view spec v1):
        // the current version's Spark-dialect SQL plans in-session
        case u: UnresolvedRelation
          if u.multipartIdentifier.length == 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase(Namespace) &&
            viewPathOf(u.multipartIdentifier(1)).isDefined =>
          PlanBridge.analyzedPlan(IcebergViews.read(spark,
            viewPathOf(u.multipartIdentifier(1)).get))
        case RelationTimeTravel(u: UnresolvedRelation, None, Some(v))
          if iceTarget(u).isDefined =>
          readPlan(iceTarget(u).get, Some(snapshotOf(iceTarget(u).get, v)))
        // TIMESTAMP AS OF: the snapshot that was CURRENT at the
        // instant, resolved through the snapshot-log
        // (IcebergInterop.snapshotAt)
        case RelationTimeTravel(u: UnresolvedRelation, Some(ts), None)
          if iceTarget(u).isDefined =>
          readPlan(iceTarget(u).get,
            Some(IcebergInterop.snapshotAt(spark, iceTarget(u).get,
              SqlTimeTravel.tsMillisOf(spark, ts))))
        case u: UnresolvedRelation if iceTarget(u).isDefined =>
          readPlan(iceTarget(u).get, None)
        // graft_iceberg_rest.<alias> — a catalog-current read: ONE
        // loadTable GET stages the pointer's metadata, then the
        // ordinary path-based read plans over it (unregistered
        // aliases fall through to the analyzer's own error)
        case u: UnresolvedRelation
          if u.multipartIdentifier.length == 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase(
              IcebergRestCatalog.Namespace) =>
          IcebergRestCatalog.sqlDirOf(spark, u.multipartIdentifier(1))
            .map(dir => readPlan(dir, None)).getOrElse(u)
      }
  }
}
