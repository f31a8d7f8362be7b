package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}

/** SQL surface for lake MAINTENANCE — the statements Spark's grammar
  * does not know, intercepted by a delegating parser (the public
  * Delta-connector idiom: try the extension grammar, fall through to
  * the session parser for everything else):
  * {{{
  *   OPTIMIZE graft_lake.t                       -- bin-packing compaction + DV purge
  *   OPTIMIZE graft_lake.t ZORDER BY (c1, c2)    -- re-cluster (1 col = range, ≥2 = z-order)
  *   REORG TABLE graft_lake.t APPLY (PURGE)      -- materialize every deletion vector
  *   OPTIMIZE graft_lake.t WHERE p_day = '2024-01-10' -- partition-scoped pack
  *   VACUUM graft_lake.t RETAIN <n> VERSIONS     -- retention cleanup
  *   VACUUM graft_lake.t RETAIN <n> VERSIONS DRY RUN -- would-delete preview
  *   DESCRIBE HISTORY graft_lake.t               -- the $history table, discoverably
  * }}}
  * Each statement returns its report as rows (files before/after +
  * committed version; files deleted; the version history), matching
  * what the API calls return. Table names resolve through
  * [[LakeSql.register]]'s process-scoped registry at PARSE time, so an
  * unregistered name fails fast by name rather than mid-execution.
  * Everything else — including every statement the session parser can
  * already handle on `graft_lake` tables — is delegated verbatim, so
  * the parser composes with [[LakeSql.LakeSqlRule]] rather than
  * replacing it. */
object LakeMaintenanceSql {

  private val Name = "graft_lake\\.`?([A-Za-z0-9_]+)`?"
  private val OptimizeRe =
    ("(?is)^\\s*OPTIMIZE\\s+" + Name +
      "(?:\\s+WHERE\\s+(.+?))?" +
      "(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?\\s*;?\\s*$").r

  /** The only OPTIMIZE scope shape: AND-ed equality predicates on
    * partition columns (`p_day = '2024-01-10' AND region = 'eu'`) —
    * Delta's contract, and the only one a manifest can serve without
    * scanning. Anything else is a named parse error. */
  private def parseOptimizeScope(where: String): Map[String, String] = {
    val EqRe = "^`?([A-Za-z0-9_]+)`?\\s*=\\s*(?:'([^']*)'|([0-9.+-]+))$".r
    where.split("(?i)\\s+AND\\s+").map(_.trim).map {
      case EqRe(c, s, n) => c -> (if (s != null) s else n)
      case other => throw new IllegalArgumentException(
        s"OPTIMIZE ... WHERE supports only AND-ed partition equality " +
          s"predicates (col = 'value'); cannot parse '$other'")
    }.toMap
  }
  private val VacuumRe =
    ("(?is)^\\s*VACUUM\\s+" + Name +
      "\\s+RETAIN\\s+(\\d+)\\s+VERSIONS(\\s+DRY\\s+RUN)?\\s*;?\\s*$").r
  private val HistoryRe =
    ("(?is)^\\s*DESCRIBE\\s+HISTORY\\s+" + Name + "\\s*;?\\s*$").r
  private val RestoreRe =
    ("(?is)^\\s*RESTORE\\s+TABLE\\s+" + Name +
      "\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$").r
  private val CreateRe =
    ("(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?TABLE\\s+" + Name +
      "(?:\\s+PARTITIONED\\s+BY\\s*\\(([^)]+)\\))?\\s+AS\\s+(.+?)\\s*;?\\s*$").r
  private val CloneRe =
    ("(?is)^\\s*CREATE\\s+TABLE\\s+" + Name +
      "\\s+SHALLOW\\s+CLONE\\s+" + Name +
      "(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*$").r
  private val DropRe =
    ("(?is)^\\s*DROP\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?" + Name +
      "\\s*;?\\s*$").r
  private val ShowRe =
    "(?is)^\\s*SHOW\\s+TABLES\\s+IN\\s+graft_lake\\s*;?\\s*$".r
  private val ReorgRe =
    ("(?is)^\\s*REORG\\s+TABLE\\s+" + Name +
      "\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*;?\\s*$").r

  private def resolve(name: String): String =
    LakeSql.pathOf(name).getOrElse(throw new IllegalArgumentException(
      s"graft_lake.$name is not registered — call LakeSql.register " +
        "(or check the name) before maintenance SQL can address it"))

  /** The maintenance plan for `sqlText`, if it is a maintenance
    * statement. */
  def maintenancePlan(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case OptimizeRe(name, where, zcols) =>
        val cols = Option(zcols).toSeq.flatMap(_.split(',').toSeq)
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
        val scope = Option(where).map(parseOptimizeScope)
          .getOrElse(Map.empty[String, String])
        require(scope.isEmpty || cols.isEmpty,
          "OPTIMIZE ... WHERE cannot combine with ZORDER BY — " +
            "re-clustering is whole-table by definition")
        Some(GraftOptimizeCommand(resolve(name), cols, scope))
      case VacuumRe(name, n, dry) =>
        if (dry != null) Some(GraftVacuumDryRunCommand(resolve(name), n.toInt))
        else Some(GraftVacuumCommand(resolve(name), n.toInt))
      case HistoryRe(name) =>
        Some(GraftDescribeHistoryCommand(resolve(name)))
      case RestoreRe(name, v) =>
        Some(GraftRestoreCommand(resolve(name), v.toLong))
      case CloneRe(target, source, v) =>
        Some(GraftShallowCloneCommand(target, resolve(source),
          Option(v).map(_.toLong)))
      case CreateRe(replace, name, partCols, query) =>
        val parts = Option(partCols).toSeq.flatMap(_.split(',').toSeq)
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
        Some(GraftCreateTableCommand(name, replace != null, parts, query))
      case DropRe(ifExists, name) =>
        Some(GraftDropTableCommand(name, ifExists != null))
      case ShowRe() => Some(GraftShowTablesCommand())
      case ReorgRe(name) => Some(GraftReorgPurgeCommand(resolve(name)))
      case _ => None
    }

  /** `OPTIMIZE` — plain = bin-packing (rewrites only the small-file
    * tail); one ZORDER column = range re-cluster via
    * [[ManifestLake.compact]]; ≥2 = [[ZOrder.optimize]]. All are
    * net-zero maintenance commits streams skip. */
  final case class GraftOptimizeCommand(table: String, zCols: Seq[String],
      scope: Map[String, String] = Map.empty)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("files_before", LongType, nullable = false)(),
      AttributeReference("files_after", LongType, nullable = false)(),
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = zCols match {
      case Nil =>
        val r = ManifestLake.binPack(spark, table,
          partitionFilter = scope)
        Seq(Row(r.filesBefore.toLong, r.filesAfter.toLong, r.newVersion))
      case Seq(c) =>
        val r = ManifestLake.compact(spark, table, clusterCol = Some(c))
        Seq(Row(r.filesBefore.toLong, r.filesAfter.toLong, r.newVersion))
      case cs =>
        val before = ManifestLake.snapshot(spark, table).entries.size.toLong
        val v = ZOrder.optimize(spark, table, cs)
        val after =
          ManifestLake.snapshot(spark, table, Some(v)).entries.size.toLong
        Seq(Row(before, after, v))
    }
  }

  /** `REORG TABLE … APPLY (PURGE)` — [[ManifestLake.purgeDv]]: rewrite
    * every deletion-vectored file, materializing the vectors (the Delta
    * statement of the same shape, public docs). */
  final case class GraftReorgPurgeCommand(table: String)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("files_before", LongType, nullable = false)(),
      AttributeReference("files_after", LongType, nullable = false)(),
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val r = ManifestLake.purgeDv(spark, table)
      Seq(Row(r.filesBefore.toLong, r.filesAfter.toLong, r.newVersion))
    }
  }

  /** `VACUUM ... RETAIN n VERSIONS` — [[ManifestLake.vacuum]]. */
  final case class GraftVacuumCommand(table: String, keepLast: Int)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("files_deleted", IntegerType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(ManifestLake.vacuum(spark, table, keepLast)))
  }

  /** `VACUUM ... RETAIN n VERSIONS DRY RUN` — the preview every
    * operator wants before an irreversible retention cut:
    * [[ManifestLake.vacuumPlan]]'s would-delete inventory as (kind,
    * path) rows, one per data file / bloom sidecar / DV sidecar /
    * change file / staging dir / dropped version. Read-only by
    * construction (the SAME planning pass vacuum executes, so the
    * preview cannot drift from the deletion logic). */
  final case class GraftVacuumDryRunCommand(table: String, keepLast: Int)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("kind", StringType, nullable = false)(),
      AttributeReference("path", StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val plan = ManifestLake.vacuumPlan(spark, table, keepLast)
      plan.deadData.map(Row("data", _)) ++
        plan.deadBlooms.map(Row("bloom", _)) ++
        plan.deadDv.map(Row("dv", _)) ++
        plan.deadChangeFiles.map(Row("changes", _)) ++
        plan.deadStagingDirs.map(Row("staging", _)) ++
        plan.dropVersions.map(v => Row("version", v.toString))
    }
  }

  /** `DESCRIBE HISTORY` — [[ManifestLake.history]]'s frame as command
    * output (one row per retained version, O(versions) log reads). */
  final case class GraftDescribeHistoryCommand(table: String)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("n_files", LongType, nullable = false)(),
      AttributeReference("batch_id", LongType, nullable = true)(),
      AttributeReference("app_id", StringType, nullable = true)(),
      AttributeReference("commit_ts_ms", LongType, nullable = true)())
    override def run(spark: SparkSession): Seq[Row] =
      ManifestLake.history(spark, table).collect().toSeq
  }

  /** `RESTORE TABLE ... TO VERSION AS OF n` —
    * [[ManifestLake.restore]]'s metadata-only rollback commit. */
  final case class GraftRestoreCommand(table: String, version: Long)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("restored_to_version", LongType,
        nullable = false)(),
      AttributeReference("new_version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(version, ManifestLake.restore(spark, table, version)))
  }

  /** Where CTAS-created (managed) tables live:
    * `<warehouse>/<table name>`. CTAS without it is a named error —
    * there is no sane default path to silently invent. */
  val WarehouseConf = "spark.graft.lake.warehouse"

  /** `CREATE [OR REPLACE] TABLE graft_lake.x [PARTITIONED BY (...)]
    * AS <query>` — the SQL-only way to MAKE a lake table: runs the
    * query, commits it under the session warehouse (or, for OR REPLACE
    * of a registered name, as an overwrite at its EXISTING path — the
    * replacement is a new version, so time travel reaches through it),
    * and registers the name. The query text is re-parsed by the
    * session at run time, so any SELECT the engine supports works
    * (including over other lake tables). Plain CREATE on an existing
    * name raises by name. */
  final case class GraftCreateTableCommand(name: String, replace: Boolean,
      partitionBy: Seq[String], query: String)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("table", StringType, nullable = false)(),
      AttributeReference("path", StringType, nullable = false)(),
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val existing = LakeSql.pathOf(name)
      if (existing.nonEmpty && !replace)
        throw new IllegalArgumentException(
          s"graft_lake.$name already exists — use CREATE OR REPLACE " +
            "TABLE to overwrite it (the replacement commits as a new " +
            "version; history stays time-travelable).")
      val path = existing.getOrElse {
        val wh = spark.conf.getOption(WarehouseConf).getOrElse(
          throw new IllegalArgumentException(
            s"CREATE TABLE graft_lake.$name needs $WarehouseConf set — " +
              "managed lake tables land under the warehouse directory."))
        s"${wh.stripSuffix("/")}/$name"
      }
      val v = ManifestLake.write(spark.sql(query), path, append = false,
        partitionBy = partitionBy)
      LakeSql.register(name, path)
      Seq(Row(name, path, v))
    }
  }

  /** `CREATE TABLE graft_lake.t SHALLOW CLONE graft_lake.s
    * [VERSION AS OF n]` — [[ManifestLake.shallowClone]]: the target
    * lands under the session warehouse (the managed-table convention
    * CTAS uses) and registers; the clone is a metadata commit
    * referencing the source's live files in place. */
  final case class GraftShallowCloneCommand(name: String, sourcePath: String,
      version: Option[Long]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("table", StringType, nullable = false)(),
      AttributeReference("path", StringType, nullable = false)(),
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      if (LakeSql.pathOf(name).nonEmpty)
        throw new IllegalArgumentException(
          s"graft_lake.$name already exists — SHALLOW CLONE creates a " +
            "new table; DROP TABLE it first to re-clone")
      val wh = spark.conf.getOption(WarehouseConf).getOrElse(
        throw new IllegalArgumentException(
          s"CREATE TABLE graft_lake.$name SHALLOW CLONE needs " +
            s"$WarehouseConf set — managed lake tables land under the " +
            "warehouse directory."))
      val path = s"${wh.stripSuffix("/")}/$name"
      val v = ManifestLake.shallowClone(spark, sourcePath, path, version)
      LakeSql.register(name, path)
      Seq(Row(name, path, v))
    }
  }

  /** `DROP TABLE [IF EXISTS] graft_lake.x` — unregisters the name;
    * managed tables (under the session warehouse) are deleted from
    * disk, externally registered paths are left untouched (the
    * external-table contract). */
  final case class GraftDropTableCommand(name: String, ifExists: Boolean)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("dropped", StringType, nullable = false)(),
      AttributeReference("deleted_data", org.apache.spark.sql.types
        .BooleanType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      LakeSql.pathOf(name) match {
        case None if ifExists => Seq.empty
        case None => throw new IllegalArgumentException(
          s"graft_lake.$name is not registered — nothing to drop")
        case Some(path) =>
          LakeSql.unregister(name)
          val managed = spark.conf.getOption(WarehouseConf).exists(wh =>
            path.startsWith(wh.stripSuffix("/") + "/"))
          if (managed) {
            val p = new org.apache.hadoop.fs.Path(path)
            p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(p, true): Unit
          }
          Seq(Row(name, managed))
      }
  }

  /** `SHOW TABLES IN graft_lake` — the registry listing (name + path),
    * sorted by name. */
  final case class GraftShowTablesCommand()
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("table", StringType, nullable = false)(),
      AttributeReference("path", StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      LakeSql.registered.toSeq.sortBy(_._1)
        .map { case (n, p) => Row(n, p) }
  }

  /** The delegating parser ([[graft.plans.GraftExtensions]] injects it):
    * maintenance grammar first, session parser for everything else. */
  final class Parser(delegate: ParserInterface) extends ParserInterface {
    override def parsePlan(sqlText: String): LogicalPlan =
      maintenancePlan(sqlText)
        .orElse(InteropMaintenanceSql.maintenancePlan(sqlText))
        .getOrElse(delegate.parsePlan(sqlText))
    override def parseExpression(sqlText: String): Expression =
      delegate.parseExpression(sqlText)
    override def parseTableIdentifier(sqlText: String): TableIdentifier =
      delegate.parseTableIdentifier(sqlText)
    override def parseFunctionIdentifier(
        sqlText: String): FunctionIdentifier =
      delegate.parseFunctionIdentifier(sqlText)
    override def parseMultipartIdentifier(sqlText: String): Seq[String] =
      delegate.parseMultipartIdentifier(sqlText)
    override def parseQuery(sqlText: String): LogicalPlan =
      delegate.parseQuery(sqlText)
    override def parseRoutineParam(sqlText: String): StructType =
      delegate.parseRoutineParam(sqlText)
    override def parseTableSchema(sqlText: String): StructType =
      delegate.parseTableSchema(sqlText)
    override def parseDataType(
        sqlText: String): org.apache.spark.sql.types.DataType =
      delegate.parseDataType(sqlText)
  }
}
