package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType}

/** Maintenance SQL for the OPEN-FORMAT interop tables — the same
  * statements [[LakeMaintenanceSql]] serves on `graft_lake`, addressed
  * at `graft_delta.*` / `graft_iceberg.*` and executed by the
  * interops' own maintenance ops. Hooked through the SAME delegating
  * parser (tried after the lake's grammar, before the session
  * parser):
  *
  *   OPTIMIZE graft_delta.t [ZORDER BY (c1, c2)]
  *   OPTIMIZE graft_iceberg.t [ZORDER BY (c1, c2)]
  *   VACUUM graft_delta.t RETAIN <n> VERSIONS
  *   VACUUM graft_iceberg.t RETAIN <n> SNAPSHOTS   -- expireSnapshots
  *   DESCRIBE HISTORY graft_delta.t | graft_iceberg.t
  *   RESTORE TABLE graft_delta.t TO VERSION AS OF <v>
  *   RESTORE TABLE graft_iceberg.t TO SNAPSHOT AS OF <id>  -- rollback
  *   REORG TABLE graft_delta.t APPLY (PURGE)       -- DV purge
  *
  * plus the TABLE-LIFECYCLE statements ([[LakeMaintenanceSql]]'s CTAS
  * surface on the open formats — how real users create Delta/Iceberg
  * tables):
  *
  *   CREATE [OR REPLACE] TABLE graft_delta.t
  *     [PARTITIONED BY (c1, ...)] [CLUSTER BY (c1, ...)] AS <query>
  *   CREATE [OR REPLACE] TABLE graft_iceberg.t
  *     [PARTITIONED BY (c1, days(ts), bucket(16, id), ...)] AS <query>
  *   DROP TABLE [IF EXISTS] graft_delta.t | graft_iceberg.t
  *   SHOW TABLES IN graft_delta | graft_iceberg
  *   ALTER TABLE graft_delta.t | graft_iceberg.t
  *     SET TBLPROPERTIES ('k' = 'v', ...)
  *   ALTER TABLE graft_delta.t ADD CONSTRAINT n CHECK (expr)
  *   ALTER TABLE graft_delta.t DROP CONSTRAINT n
  *   ALTER TABLE graft_delta.t CLUSTER BY (c1, ...)   -- liquid clustering
  *
  * Managed tables land under `spark.graft.delta.warehouse` /
  * `spark.graft.iceberg.warehouse` (CTAS without the conf is a named
  * error); DROP deletes managed tables from disk and leaves
  * externally registered paths untouched — the external-table
  * contract. OR REPLACE of a registered name overwrites at its
  * EXISTING path as a new version/snapshot, so time travel reaches
  * through the replacement.
  */
object InteropMaintenanceSql {

  /** Where CTAS-created (managed) interop tables live:
    * `<warehouse>/<table name>`. */
  val DeltaWarehouseConf = "spark.graft.delta.warehouse"
  val IcebergWarehouseConf = "spark.graft.iceberg.warehouse"

  private val DName = "graft_delta\\.`?([A-Za-z0-9_$]+)`?"
  private val IName = "graft_iceberg\\.`?([A-Za-z0-9_$]+)`?"

  private val DOptimizeRe =
    ("(?is)^\\s*OPTIMIZE\\s+" + DName +
      "(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?\\s*;?\\s*$").r
  private val IOptimizeRe =
    ("(?is)^\\s*OPTIMIZE\\s+" + IName +
      "(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?\\s*;?\\s*$").r
  private val IRewriteManifestsRe =
    ("(?is)^\\s*OPTIMIZE\\s+" + IName +
      "\\s+REWRITE\\s+MANIFESTS\\s*;?\\s*$").r
  private val DVacuumRe =
    ("(?is)^\\s*VACUUM\\s+" + DName +
      "\\s+RETAIN\\s+(\\d+)\\s+VERSIONS\\s*;?\\s*$").r
  private val IVacuumRe =
    ("(?is)^\\s*VACUUM\\s+" + IName +
      "\\s+RETAIN\\s+(\\d+)\\s+SNAPSHOTS\\s*;?\\s*$").r
  private val ConvertRe =
    ("(?is)^\\s*CONVERT\\s+TO\\s+(DELTA|ICEBERG)\\s+'([^']+)'" +
      "(?:\\s+AS\\s+`?([A-Za-z0-9_$]+)`?)?\\s*;?\\s*$").r
  private val IOrphanRe =
    ("(?is)^\\s*VACUUM\\s+" + IName +
      "\\s+REMOVE\\s+ORPHANS(?:\\s+OLDER\\s+THAN\\s+(\\d+)\\s+HOURS)?" +
      "(\\s+DRY\\s+RUN)?\\s*;?\\s*$").r
  private val DHistoryRe =
    ("(?is)^\\s*DESCRIBE\\s+HISTORY\\s+" + DName + "\\s*;?\\s*$").r
  private val IHistoryRe =
    ("(?is)^\\s*DESCRIBE\\s+HISTORY\\s+" + IName + "\\s*;?\\s*$").r
  private val DRestoreRe =
    ("(?is)^\\s*RESTORE\\s+TABLE\\s+" + DName +
      "\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$").r
  private val IRollbackRe =
    ("(?is)^\\s*RESTORE\\s+TABLE\\s+" + IName +
      "\\s+TO\\s+SNAPSHOT\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$").r
  private val DReorgRe =
    ("(?is)^\\s*REORG\\s+TABLE\\s+" + DName +
      "\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*;?\\s*$").r
  // PARTITIONED BY items may themselves be calls — bucket(4, id) —
  // so the list matches one level of nested parentheses
  private val PartList = "((?:[^()]|\\([^()]*\\))+)"
  private val DCreateRe =
    ("(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?TABLE\\s+" + DName +
      "(?:\\s+PARTITIONED\\s+BY\\s*\\(" + PartList +
      "\\))?(?:\\s+CLUSTER\\s+BY\\s*\\(" + PartList +
      "\\))?\\s+AS\\s+(.+?)\\s*;?\\s*$").r
  private val ICreateRe =
    ("(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?TABLE\\s+" + IName +
      "(?:\\s+PARTITIONED\\s+BY\\s*\\(" + PartList +
      "\\))?\\s+AS\\s+(.+?)\\s*;?\\s*$").r
  private val DCloneRe =
    ("(?is)^\\s*CREATE\\s+TABLE\\s+" + DName +
      "\\s+SHALLOW\\s+CLONE\\s+" + DName +
      "(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*$").r
  private val DDropRe =
    ("(?is)^\\s*DROP\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?" + DName +
      "\\s*;?\\s*$").r
  private val IDropRe =
    ("(?is)^\\s*DROP\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?" + IName +
      "\\s*;?\\s*$").r
  private val DShowRe =
    "(?is)^\\s*SHOW\\s+TABLES\\s+IN\\s+graft_delta\\s*;?\\s*$".r
  private val IShowRe =
    "(?is)^\\s*SHOW\\s+TABLES\\s+IN\\s+graft_iceberg\\s*;?\\s*$".r
  private val IShowViewsRe =
    "(?is)^\\s*SHOW\\s+VIEWS\\s+IN\\s+graft_iceberg\\s*;?\\s*$".r
  private val DPropsRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + DName +
      "\\s+SET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*;?\\s*$").r
  private val IPropsRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + IName +
      "\\s+SET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*;?\\s*$").r
  private val DAddCkRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + DName +
      "\\s+ADD\\s+CONSTRAINT\\s+([A-Za-z0-9_-]+)\\s+CHECK\\s*" +
      "\\((.+)\\)\\s*;?\\s*$").r
  private val DDropCkRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + DName +
      "\\s+DROP\\s+CONSTRAINT\\s+([A-Za-z0-9_-]+)\\s*;?\\s*$").r
  private val DClusterRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + DName +
      "\\s+CLUSTER\\s+BY\\s*\\(([^)]+)\\)\\s*;?\\s*$").r
  private val IWriteOrderRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + IName +
      "\\s+WRITE\\s+ORDERED\\s+BY\\s*\\(([^)]+)\\)\\s*;?\\s*$").r
  private val IWriteUnorderedRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + IName +
      "\\s+WRITE\\s+UNORDERED\\s*;?\\s*$").r
  private val IAddPartFieldRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + IName +
      "\\s+ADD\\s+PARTITION\\s+FIELD\\s+(.+?)\\s*;?\\s*$").r
  private val IDropPartFieldRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + IName +
      "\\s+DROP\\s+PARTITION\\s+FIELD\\s+(.+?)\\s*;?\\s*$").r
  private val IAnalyzeRe =
    ("(?is)^\\s*ANALYZE\\s+TABLE\\s+" + IName +
      "\\s+COMPUTE\\s+STATISTICS" +
      "(?:\\s+FOR\\s+COLUMNS\\s+([^;]+?))?\\s*;?\\s*$").r
  private val ICreateRefRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + IName +
      "\\s+CREATE\\s+(BRANCH|TAG)\\s+([A-Za-z0-9_-]+)" +
      "(?:\\s+AS\\s+OF\\s+VERSION\\s+(\\d+))?\\s*;?\\s*$").r
  private val IDropRefRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + IName +
      "\\s+DROP\\s+(?:BRANCH|TAG)\\s+([A-Za-z0-9_-]+)\\s*;?\\s*$").r
  private val IFastForwardRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + IName +
      "\\s+FAST\\s+FORWARD\\s+TO\\s+([A-Za-z0-9_-]+)\\s*;?\\s*$").r
  private val ICreateViewRe =
    ("(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?VIEW\\s+" + IName +
      "\\s+AS\\s+(.+?)\\s*;?\\s*$").r
  private val IDropViewRe =
    ("(?is)^\\s*DROP\\s+VIEW\\s+(IF\\s+EXISTS\\s+)?" + IName +
      "\\s*;?\\s*$").r

  /** `'k' = 'v', 'k2' = 'v2'` → pairs (commas INSIDE quotes stay in
    * their value); non-quoted or malformed items refuse by name. */
  private def parseProps(raw: String): Map[String, String] = {
    val items = Seq.newBuilder[String]
    var inQ = false
    val cur = new StringBuilder
    raw.foreach {
      case '\'' => inQ = !inQ; cur += '\'': Unit
      case ',' if !inQ => items += cur.result(); cur.clear()
      case c => cur += c: Unit
    }
    if (cur.nonEmpty) items += cur.result()
    val ItemRe = "(?s)^\\s*'([^']*)'\\s*=\\s*'([^']*)'\\s*$".r
    items.result().map(_.trim).filter(_.nonEmpty).map {
      case ItemRe(k, v) => k -> v
      case item => throw new IllegalArgumentException(
        s"TBLPROPERTIES item $item — expected 'key' = 'value'")
    }.toMap
  }
  // one PARTITIONED BY item on the Iceberg side: a bare identity
  // column or one of the spec's transforms
  private val TransformRe =
    "(?i)^(years?|months?|days?|hours?)\\s*\\(\\s*`?([A-Za-z0-9_$]+)`?\\s*\\)$".r
  private val ArgTransformRe =
    "(?i)^(bucket|truncate)\\s*\\(\\s*(\\d+)\\s*,\\s*`?([A-Za-z0-9_$]+)`?\\s*\\)$".r

  /** One Iceberg PARTITIONED BY item → the spec field it declares.
    * Unrecognized shapes refuse by name — never a silently-identity
    * transform. */
  private def iceSpecField(raw: String): IcebergInterop.SpecField =
    raw.trim match {
      case TransformRe(t, src) =>
        val unit = t.toLowerCase.stripSuffix("s")
        IcebergInterop.SpecField(s"${src}_$unit", unit, src)
      case ArgTransformRe(t, n, src) =>
        val tf = s"${t.toLowerCase}[$n]"
        val nm =
          if (t.equalsIgnoreCase("bucket")) s"${src}_bucket"
          else s"${src}_trunc"
        IcebergInterop.SpecField(nm, tf, src)
      case bare if bare.matches("`?[A-Za-z0-9_$]+`?") =>
        val c = bare.stripPrefix("`").stripSuffix("`")
        IcebergInterop.SpecField(c, "identity", c)
      case other => throw new IllegalArgumentException(
        s"PARTITIONED BY item '$other' is not a column or a supported " +
          "transform (years/months/days/hours(col), bucket(n, col), " +
          "truncate(n, col))")
    }

  private def deltaPath(name: String): String =
    DeltaSql.pathOf(name).getOrElse(throw new IllegalArgumentException(
      s"graft_delta.$name is not registered — call DeltaSql.register " +
        "before maintenance SQL can address it"))

  private def icePath(name: String): String =
    IcebergSql.pathOf(name).getOrElse(throw new IllegalArgumentException(
      s"graft_iceberg.$name is not registered — call " +
        "IcebergSql.register before maintenance SQL can address it"))

  private def zcols(raw: String): Seq[String] =
    Option(raw).toSeq.flatMap(_.split(',').toSeq)
      .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)

  /** The maintenance plan for `sqlText`, if it is an interop
    * maintenance statement. */
  def maintenancePlan(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case DOptimizeRe(name, z) =>
        Some(DeltaOptimizeCommand(deltaPath(name), zcols(z)))
      case IRewriteManifestsRe(name) =>
        Some(IcebergRewriteManifestsCommand(icePath(name)))
      case IOptimizeRe(name, z) =>
        Some(IcebergOptimizeCommand(icePath(name), zcols(z)))
      case DVacuumRe(name, n) =>
        Some(DeltaVacuumCommand(deltaPath(name), n.toInt))
      case ConvertRe(kind, path, alias) =>
        Some(ConvertParquetCommand(path,
          delta = kind.equalsIgnoreCase("delta"), Option(alias)))
      case IOrphanRe(name, hours, dry) =>
        Some(IcebergRemoveOrphansCommand(icePath(name),
          Option(hours).map(_.toLong * 3600 * 1000)
            .getOrElse(3L * 24 * 3600 * 1000), dry != null))
      case IVacuumRe(name, n) =>
        Some(IcebergExpireCommand(icePath(name), n.toInt))
      case DHistoryRe(name) =>
        Some(DeltaHistoryCommand(deltaPath(name)))
      case IHistoryRe(name) =>
        Some(IcebergHistoryCommand(icePath(name)))
      case DRestoreRe(name, v) =>
        Some(DeltaRestoreCommand(deltaPath(name), v.toLong))
      case IRollbackRe(name, id) =>
        Some(IcebergRollbackCommand(icePath(name), id.toLong))
      case DReorgRe(name) =>
        Some(DeltaPurgeCommand(deltaPath(name)))
      case DCloneRe(target, source, v) =>
        Some(DeltaShallowCloneCommand(target, deltaPath(source),
          Option(v).map(_.toLong)))
      case DCreateRe(replace, name, partCols, clusterCols, query) =>
        Some(DeltaCreateTableCommand(name, replace != null,
          splitCols(partCols), query, splitCols(clusterCols)))
      case ICreateRe(replace, name, partCols, query) =>
        Some(IcebergCreateTableCommand(name, replace != null,
          splitCols(partCols), query))
      case DDropRe(ifExists, name) =>
        Some(InteropDropTableCommand(name, ifExists != null,
          delta = true))
      case IDropRe(ifExists, name) =>
        Some(InteropDropTableCommand(name, ifExists != null,
          delta = false))
      case DShowRe() => Some(InteropShowTablesCommand(delta = true))
      case IShowRe() => Some(InteropShowTablesCommand(delta = false))
      case IShowViewsRe() => Some(IcebergShowViewsCommand())
      case DPropsRe(name, props) =>
        Some(DeltaSetPropertiesCommand(deltaPath(name),
          parseProps(props)))
      case IPropsRe(name, props) =>
        Some(IcebergSetPropertiesCommand(icePath(name),
          parseProps(props)))
      case DAddCkRe(name, ck, sql) =>
        Some(DeltaAddConstraintCommand(deltaPath(name), ck, sql))
      case DDropCkRe(name, ck) =>
        Some(DeltaDropConstraintCommand(deltaPath(name), ck))
      case DClusterRe(name, cols) =>
        Some(DeltaClusterByCommand(deltaPath(name), splitCols(cols)))
      case IWriteOrderRe(name, items) =>
        Some(IcebergWriteOrderCommand(icePath(name),
          splitCols(items).map(sortOrderItem)))
      case IWriteUnorderedRe(name) =>
        Some(IcebergWriteOrderCommand(icePath(name), Nil))
      case IAddPartFieldRe(name, item) =>
        Some(IcebergEvolveSpecCommand(icePath(name),
          iceSpecField(item), add = true))
      case IDropPartFieldRe(name, item) =>
        Some(IcebergEvolveSpecCommand(icePath(name),
          iceSpecField(item), add = false))
      case IAnalyzeRe(name, cols) =>
        Some(IcebergAnalyzeCommand(icePath(name), zcols(cols)))
      case ICreateRefRe(name, kind, ref, snap) =>
        Some(IcebergCreateRefCommand(icePath(name), ref,
          kind.toLowerCase(java.util.Locale.ROOT),
          Option(snap).map(_.toLong)))
      case IDropRefRe(name, ref) =>
        Some(IcebergDropRefCommand(icePath(name), ref))
      case IFastForwardRe(name, ref) =>
        Some(IcebergFastForwardCommand(icePath(name), ref))
      case ICreateViewRe(replace, name, query) =>
        Some(IcebergCreateViewCommand(name, replace != null, query))
      case IDropViewRe(ifExists, name) =>
        Some(IcebergDropViewCommand(name, ifExists != null))
      case _ => None
    }

  // one WRITE ORDERED BY item: col [ASC|DESC] [NULLS FIRST|NULLS LAST]
  // (spec defaults: asc → nulls-first, desc → nulls-last)
  private val SortItemRe =
    ("(?i)^`?([A-Za-z0-9_$]+)`?(?:\\s+(ASC|DESC))?" +
      "(?:\\s+NULLS\\s+(FIRST|LAST))?$").r

  private def sortOrderItem(raw: String): IcebergInterop.IceSortField =
    raw.trim match {
      case SortItemRe(c, dir, nulls) =>
        val asc = dir == null || dir.equalsIgnoreCase("asc")
        val nullsFirst = Option(nulls)
          .map(_.equalsIgnoreCase("first")).getOrElse(asc)
        IcebergInterop.IceSortField(c, asc, nullsFirst)
      case other => throw new IllegalArgumentException(
        s"WRITE ORDERED BY item '$other' — expected " +
          "`col [ASC|DESC] [NULLS FIRST|NULLS LAST]`")
    }

  private def splitCols(raw: String): Seq[String] = {
    // split on TOP-LEVEL commas only — `bucket(16, id)` keeps its own
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    Option(raw).getOrElse("").foreach {
      case '(' => depth += 1; cur += '(': Unit
      case ')' => depth -= 1; cur += ')': Unit
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c: Unit
    }
    if (cur.nonEmpty) out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  final case class DeltaOptimizeCommand(table: String, z: Seq[String])
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaInterop.optimize(spark, table, zorderBy = z)))
  }

  final case class IcebergOptimizeCommand(table: String, z: Seq[String])
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("snapshot_id", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(IcebergInterop.optimize(spark, table, zorderBy = z)))
  }

  /** `CONVERT TO DELTA|ICEBERG '<path>' [AS name]` — adopt a RAW
    * (optionally Hive-partitioned) parquet directory in place,
    * metadata-only ([[DeltaInterop.convertParquet]] /
    * [[IcebergInterop.migrateParquet]]); `AS name` registers the
    * converted table in the dialect's namespace. */
  final case class ConvertParquetCommand(path: String, delta: Boolean,
      alias: Option[String]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val v =
        if (delta) DeltaInterop.convertParquet(spark, path)
        else IcebergInterop.migrateParquet(spark, path)
      alias.foreach(a =>
        if (delta) DeltaSql.register(a, path)
        else IcebergSql.register(a, path))
      Seq(Row(v))
    }
  }

  /** `VACUUM graft_iceberg.t REMOVE ORPHANS [OLDER THAN n HOURS]
    * [DRY RUN]` — [[IcebergInterop.removeOrphanFiles]]: deletes (or,
    * DRY RUN, lists) files no retained snapshot references, older
    * than the grace interval. */
  final case class IcebergRemoveOrphansCommand(table: String,
      olderThanMs: Long, dryRun: Boolean) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("path", StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      IcebergInterop.removeOrphanFiles(spark, table, olderThanMs,
        dryRun).map(Row(_))
  }

  /** `OPTIMIZE graft_iceberg.t REWRITE MANIFESTS` — metadata
    * compaction ([[IcebergInterop.rewriteManifests]]): consolidates
    * the manifest list without reading or moving a data byte. */
  final case class IcebergRewriteManifestsCommand(table: String)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("snapshot_id", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(IcebergInterop.rewriteManifests(spark, table)))
  }

  /** `ALTER TABLE graft_iceberg.t WRITE ORDERED BY (c1 [ASC|DESC]
    * [NULLS FIRST|LAST][, …])` / `WRITE UNORDERED` —
    * [[IcebergInterop.replaceSortOrder]]'s SQL door: declares the
    * default sort order (empty = unsorted); later appends and
    * `OPTIMIZE graft_iceberg.t` range-sort by it and stamp
    * `sort_order_id`. */
  final case class IcebergWriteOrderCommand(table: String,
      fields: Seq[IcebergInterop.IceSortField])
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("order_id", IntegerType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(IcebergInterop.replaceSortOrder(spark, table, fields)))
  }

  /** `ALTER TABLE graft_iceberg.t ADD|DROP PARTITION FIELD <item>` —
    * partition SPEC EVOLUTION, metadata-only
    * ([[IcebergInterop.addPartitionField]] /
    * [[IcebergInterop.dropPartitionField]]): already-written files
    * stay under their spec; future INSERTs land under the new
    * default. Items speak the PARTITIONED BY vocabulary (bare
    * column, `years/months/days/hours(col)`, `bucket(n, col)`,
    * `truncate(w, col)`). */
  final case class IcebergEvolveSpecCommand(table: String,
      field: IcebergInterop.SpecField, add: Boolean)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("spec_id", IntegerType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(
        if (add) IcebergInterop.addPartitionField(spark, table, field)
        else IcebergInterop.dropPartitionField(spark, table, field)))
  }

  /** `ALTER TABLE graft_iceberg.t CREATE BRANCH|TAG name
    * [AS OF VERSION snap]` / `DROP BRANCH|TAG name` / `FAST FORWARD
    * TO branch` — the refs + write-audit-publish SQL doors
    * ([[IcebergInterop.createRef]]/[[IcebergInterop.dropRef]]/
    * [[IcebergInterop.fastForward]]); branch WRITES ride
    * `spark.wap.branch` through the ordinary INSERT door. */
  final case class IcebergCreateRefCommand(table: String, ref: String,
      kind: String, snap: Option[Long]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      IcebergInterop.createRef(spark, table, ref, kind, snap)
      Nil
    }
  }

  final case class IcebergDropRefCommand(table: String, ref: String)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      IcebergInterop.dropRef(spark, table, ref)
      Nil
    }
  }

  final case class IcebergFastForwardCommand(table: String, ref: String)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("snapshot_id", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(IcebergInterop.fastForward(spark, table, ref)))
  }

  /** `ANALYZE TABLE graft_iceberg.t COMPUTE STATISTICS
    * [FOR COLUMNS c1, …]` — [[IcebergInterop.computeStats]]'s SQL
    * door: one distributed NDV pass, a Puffin statistics file, the
    * metadata `statistics` entry for the current snapshot. */
  final case class IcebergAnalyzeCommand(table: String,
                                         cols: Seq[String])
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("snapshot_id", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(IcebergInterop.computeStats(spark, table, cols)))
  }

  /** `ALTER TABLE graft_delta.t CLUSTER BY (c1[, c2…])` —
    * [[DeltaInterop.enableClustering]]'s SQL door: publishes the
    * delta.clustering domain under the writer-7 upgrade; later
    * `OPTIMIZE graft_delta.t` re-clusters on the recorded columns. */
  final case class DeltaClusterByCommand(table: String,
                                         cols: Seq[String])
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaInterop.enableClustering(spark, table, cols)))
  }

  final case class DeltaVacuumCommand(table: String, keepLast: Int)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("deleted_files", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaInterop.vacuum(spark, table, keepLast).toLong))
  }

  final case class IcebergExpireCommand(table: String, keepLast: Int)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("deleted_files", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(IcebergInterop.expireSnapshots(spark, table, keepLast)
        .toLong))
  }

  final case class DeltaHistoryCommand(table: String)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("timestamp_ms", LongType, nullable = false)(),
      AttributeReference("operation", StringType, nullable = true)(),
      AttributeReference("n_adds", LongType, nullable = false)(),
      AttributeReference("n_removes", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      DeltaInterop.history(spark, table).collect().toSeq
  }

  final case class IcebergHistoryCommand(table: String)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("snapshot_id", LongType, nullable = false)(),
      AttributeReference("sequence_number", LongType, nullable = false)(),
      AttributeReference("timestamp_ms", LongType, nullable = false)(),
      AttributeReference("operation", StringType, nullable = true)(),
      AttributeReference("is_current", BooleanType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      IcebergInterop.history(spark, table).collect().toSeq
  }

  final case class DeltaRestoreCommand(table: String, version: Long)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("restored_to_version", LongType,
        nullable = false)(),
      AttributeReference("new_version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(version, DeltaInterop.restore(spark, table, version)))
  }

  final case class IcebergRollbackCommand(table: String, snapshotId: Long)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("rolled_back_to", LongType, nullable = false)(),
      AttributeReference("metadata_version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(snapshotId,
        IcebergInterop.rollbackTo(spark, table, snapshotId)))
  }

  final case class DeltaPurgeCommand(table: String)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaInterop.purgeDeletionVectors(spark, table)))
  }

  private def warehousePath(spark: SparkSession, conf: String,
                            name: String): String = {
    val wh = spark.conf.getOption(conf).getOrElse(
      throw new IllegalArgumentException(
        s"CREATE TABLE needs $conf set — managed tables land under " +
          "the warehouse directory; register an existing path " +
          "instead for external tables"))
    s"${wh.stripSuffix("/")}/$name"
  }

  /** `CREATE [OR REPLACE] TABLE graft_delta.x [PARTITIONED BY (...)]
    * AS <query>` — the SQL-only way to MAKE a Delta table: runs the
    * query, commits under the session warehouse (or, for OR REPLACE
    * of a registered name, as an overwrite at its EXISTING path — a
    * new log version, so time travel reaches through it), registers
    * the name. Plain CREATE on an existing name raises by name. The
    * commit inherits every [[DeltaWriteGate]] obligation. */
  final case class DeltaCreateTableCommand(name: String, replace: Boolean,
      partitionBy: Seq[String], query: String,
      clusterBy: Seq[String] = Nil)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("table", StringType, nullable = false)(),
      AttributeReference("path", StringType, nullable = false)(),
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val existing = DeltaSql.pathOf(name)
      if (existing.nonEmpty && !replace)
        throw new IllegalArgumentException(
          s"graft_delta.$name already exists — use CREATE OR REPLACE " +
            "TABLE to overwrite it (the replacement commits as a new " +
            "version; history stays time-travelable).")
      val path = existing.getOrElse(
        warehousePath(spark, DeltaWarehouseConf, name))
      val parts = partitionBy
        .map(_.stripPrefix("`").stripSuffix("`"))
      val v0 = DeltaInterop.write(spark.sql(query), path,
        partitionBy = parts, overwrite = existing.nonEmpty)
      // CLUSTER BY at CREATE: the clustering declaration commits
      // right behind the data (OPTIMIZE then re-clusters on it)
      val v =
        if (clusterBy.isEmpty) v0
        else DeltaInterop.enableClustering(spark, path, clusterBy
          .map(_.stripPrefix("`").stripSuffix("`")))
      DeltaSql.register(name, path)
      Seq(Row(name, path, v))
    }
  }

  /** `CREATE [OR REPLACE] TABLE graft_iceberg.x [PARTITIONED BY
    * (c, days(ts), bucket(16, id), ...)] AS <query>` — identity
    * columns and the spec's transforms land as a real partition spec
    * (tuples in the manifests, field-id-stamped data files); the
    * replacement snapshot of OR REPLACE keeps history reachable. */
  final case class IcebergCreateTableCommand(name: String,
      replace: Boolean, partitionBy: Seq[String], query: String)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("table", StringType, nullable = false)(),
      AttributeReference("path", StringType, nullable = false)(),
      AttributeReference("snapshot_id", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val existing = IcebergSql.pathOf(name)
      if (existing.nonEmpty && !replace)
        throw new IllegalArgumentException(
          s"graft_iceberg.$name already exists — use CREATE OR " +
            "REPLACE TABLE to overwrite it (the replacement is a new " +
            "snapshot; history stays time-travelable).")
      val path = existing.getOrElse(
        warehousePath(spark, IcebergWarehouseConf, name))
      val spec = partitionBy.map(iceSpecField)
      val snap = IcebergInterop.write(spark.sql(query), path,
        overwrite = existing.nonEmpty, partitionBy = spec)
      IcebergSql.register(name, path)
      Seq(Row(name, path, snap))
    }
  }

  /** `CREATE [OR REPLACE] VIEW graft_iceberg.v AS <query>` /
    * `DROP VIEW [IF EXISTS] graft_iceberg.v` —
    * [[IcebergViews]]' SQL doors: spec-v1 view metadata lands under
    * the session warehouse and registers; REPLACE appends a new
    * VERSION (prior versions stay readable through
    * [[IcebergViews.readVersion]]). */
  final case class IcebergCreateViewCommand(name: String,
      replace: Boolean, query: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("view", StringType, nullable = false)(),
      AttributeReference("path", StringType, nullable = false)(),
      AttributeReference("version_id", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val existing = IcebergSql.viewPathOf(name)
      if (existing.nonEmpty && !replace)
        throw new IllegalArgumentException(
          s"graft_iceberg.$name already exists — use CREATE OR " +
            "REPLACE VIEW to version it")
      require(IcebergSql.pathOf(name).isEmpty,
        s"graft_iceberg.$name is already a TABLE — views and tables " +
          "share the namespace")
      val path = existing.getOrElse(
        warehousePath(spark, IcebergWarehouseConf, name))
      val vid = IcebergViews.create(spark, path, query,
        replace = existing.nonEmpty)
      IcebergSql.registerView(name, path)
      Seq(Row(name, path, vid))
    }
  }

  final case class IcebergDropViewCommand(name: String,
      ifExists: Boolean) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      IcebergSql.viewPathOf(name) match {
        case Some(_) => IcebergSql.unregisterView(name)
        case None if ifExists => ()
        case None => throw new IllegalArgumentException(
          s"graft_iceberg.$name is not a registered view")
      }
      Nil
    }
  }

  /** `CREATE TABLE graft_delta.t SHALLOW CLONE graft_delta.s
    * [VERSION AS OF n]` — [[DeltaInterop.shallowClone]]: the target
    * lands under the session warehouse (the managed-table convention
    * CTAS uses) and registers; the clone is one metadata commit
    * referencing the source's live files in place. */
  final case class DeltaShallowCloneCommand(name: String,
      sourcePath: String, version: Option[Long])
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("table", StringType, nullable = false)(),
      AttributeReference("path", StringType, nullable = false)(),
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      if (DeltaSql.pathOf(name).nonEmpty)
        throw new IllegalArgumentException(
          s"graft_delta.$name already exists — SHALLOW CLONE creates " +
            "a new table; DROP TABLE it first to re-clone")
      val path = warehousePath(spark, DeltaWarehouseConf, name)
      val v = DeltaInterop.shallowClone(spark, sourcePath, path, version)
      DeltaSql.register(name, path)
      Seq(Row(name, path, v))
    }
  }

  /** `DROP TABLE [IF EXISTS] graft_delta.x | graft_iceberg.x` —
    * unregisters the name; managed tables (under the respective
    * session warehouse) are deleted from disk, externally registered
    * paths are left untouched — the external-table contract. */
  final case class InteropDropTableCommand(name: String,
      ifExists: Boolean, delta: Boolean) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("dropped", StringType, nullable = false)(),
      AttributeReference("deleted_data", BooleanType,
        nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val (ns, conf) =
        if (delta) (DeltaSql.Namespace, DeltaWarehouseConf)
        else (IcebergSql.Namespace, IcebergWarehouseConf)
      val path = if (delta) DeltaSql.pathOf(name)
        else IcebergSql.pathOf(name)
      path match {
        case None if ifExists => Seq.empty
        case None => throw new IllegalArgumentException(
          s"$ns.$name is not registered — nothing to drop")
        case Some(p) =>
          if (delta) DeltaSql.unregister(name)
          else IcebergSql.unregister(name)
          val managed = spark.conf.getOption(conf).exists(wh =>
            p.startsWith(wh.stripSuffix("/") + "/"))
          if (managed) {
            val hp = new org.apache.hadoop.fs.Path(p)
            hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(hp, true): Unit
          }
          Seq(Row(name, managed))
      }
    }
  }

  /** `ALTER TABLE graft_delta.t SET TBLPROPERTIES ('k'='v', …)` —
    * [[DeltaInterop.setProperties]]: the metadata republish (with its
    * appendOnly protocol handling) from SQL. */
  final case class DeltaSetPropertiesCommand(table: String,
      props: Map[String, String]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaInterop.setProperties(spark, table, props)))
  }

  /** `ALTER TABLE graft_iceberg.t SET TBLPROPERTIES ('k'='v', …)` —
    * [[IcebergInterop.setProperties]]' metadata-only republish. */
  final case class IcebergSetPropertiesCommand(table: String,
      props: Map[String, String]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("metadata_version", LongType,
        nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(IcebergInterop.setProperties(spark, table, props)))
  }

  /** `ALTER TABLE graft_delta.t ADD CONSTRAINT n CHECK (expr)` —
    * [[DeltaInterop.addCheckConstraint]]: existing data validates
    * first; every later write validates against it. */
  final case class DeltaAddConstraintCommand(table: String,
      name: String, sql: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaInterop.addCheckConstraint(spark, table, name, sql)))
  }

  /** `ALTER TABLE graft_delta.t DROP CONSTRAINT n`. */
  final case class DeltaDropConstraintCommand(table: String,
      name: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaInterop.dropCheckConstraint(spark, table, name)))
  }

  /** `SHOW TABLES IN graft_delta | graft_iceberg` — the registry
    * listing (name + path), sorted by name. */
  final case class IcebergShowViewsCommand()
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("view", StringType, nullable = false)(),
      AttributeReference("path", StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      IcebergSql.registeredViews.toSeq.sortBy(_._1)
        .map { case (n, p) => Row(n, p) }
  }

  final case class InteropShowTablesCommand(delta: Boolean)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("table", StringType, nullable = false)(),
      AttributeReference("path", StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      (if (delta) DeltaSql.registered else IcebergSql.registered)
        .toSeq.sortBy(_._1).map { case (n, p) => Row(n, p) }
  }
}
