package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.PlanBridge

/** SQL read surface over [[IcebergInterop]] tables:
  * `SELECT ... FROM graft_iceberg.<name> [VERSION AS OF <snapshot-id>]`
  * — the same resolution-rule approach as [[DeltaSql]] (rewrite to the
  * exact parquet scan the API read plans, keeping vectorized reads,
  * pushdown and codegen) for tables whose source of truth is Iceberg
  * metadata. `VERSION AS OF` takes a SNAPSHOT ID — Iceberg's stable
  * address — not an ordinal (metadata version numbers shift under
  * expiry; snapshot ids never do). Reads only: writes go through
  * [[IcebergInterop.write]] or, better,
  * [[IcebergInterop.importToManifest]] and the full `graft_lake` DML
  * surface. */
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

  private def iceTarget(u: UnresolvedRelation): Option[String] =
    if (u.multipartIdentifier.length == 2 &&
      u.multipartIdentifier.head.equalsIgnoreCase(Namespace))
      pathOf(u.multipartIdentifier(1))
    else None

  final class IcebergSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

    private def readPlan(path: String,
                         snapshotId: Option[Long]): LogicalPlan =
      PlanBridge.analyzedPlan(snapshotId match {
        case Some(id) => IcebergInterop.readSnapshot(spark, path, id)
        case None => IcebergInterop.read(spark, path)
      })

    private def snapshotOf(v: String): Long =
      scala.util.Try(java.lang.Long.parseLong(v)).getOrElse(
        throw new UnsupportedOperationException(
          s"graft_iceberg VERSION AS OF expects an integer snapshot id, " +
            s"got $v"))

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
              Some(snapshotOf(v)))))
      }
    }

    override def apply(plan: LogicalPlan): LogicalPlan =
      filterPrune(plan).resolveOperatorsUp {
        case RelationTimeTravel(u: UnresolvedRelation, None, Some(v))
          if iceTarget(u).isDefined =>
          readPlan(iceTarget(u).get, Some(snapshotOf(v)))
        case RelationTimeTravel(u: UnresolvedRelation, Some(_), None)
          if iceTarget(u).isDefined =>
          throw new UnsupportedOperationException(
            "graft_iceberg supports VERSION AS OF <snapshot-id> only — " +
              "the snapshot timestamps this writer records are wall " +
              "clocks; use an explicit snapshot id")
        case u: UnresolvedRelation if iceTarget(u).isDefined =>
          readPlan(iceTarget(u).get, None)
      }
  }
}
