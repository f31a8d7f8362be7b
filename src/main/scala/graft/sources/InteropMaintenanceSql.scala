package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, LongType, StringType}

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
  */
object InteropMaintenanceSql {

  private val DName = "graft_delta\\.`?([A-Za-z0-9_$]+)`?"
  private val IName = "graft_iceberg\\.`?([A-Za-z0-9_$]+)`?"

  private val DOptimizeRe =
    ("(?is)^\\s*OPTIMIZE\\s+" + DName +
      "(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?\\s*;?\\s*$").r
  private val IOptimizeRe =
    ("(?is)^\\s*OPTIMIZE\\s+" + IName +
      "(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?\\s*;?\\s*$").r
  private val DVacuumRe =
    ("(?is)^\\s*VACUUM\\s+" + DName +
      "\\s+RETAIN\\s+(\\d+)\\s+VERSIONS\\s*;?\\s*$").r
  private val IVacuumRe =
    ("(?is)^\\s*VACUUM\\s+" + IName +
      "\\s+RETAIN\\s+(\\d+)\\s+SNAPSHOTS\\s*;?\\s*$").r
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
      case IOptimizeRe(name, z) =>
        Some(IcebergOptimizeCommand(icePath(name), zcols(z)))
      case DVacuumRe(name, n) =>
        Some(DeltaVacuumCommand(deltaPath(name), n.toInt))
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
      case _ => None
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
}
