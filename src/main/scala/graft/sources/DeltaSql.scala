package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.PlanBridge

/** SQL read surface over [[DeltaInterop]] tables:
  * `SELECT ... FROM graft_delta.<name> [VERSION AS OF n]` — the same
  * resolution-rule approach as [[LakeSql]] (rewrite to the exact
  * parquet scan the API read plans, keeping vectorized reads, pushdown
  * and codegen) for tables whose source of truth is a Delta log. Reads
  * only: writes to a Delta table go through [[DeltaInterop.write]] or,
  * better, [[DeltaInterop.importToManifest]] and the full
  * `graft_lake` DML surface. */
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

  private def deltaTarget(u: UnresolvedRelation): Option[String] =
    if (u.multipartIdentifier.length == 2 &&
      u.multipartIdentifier.head.equalsIgnoreCase(Namespace))
      pathOf(u.multipartIdentifier(1))
    else None

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

    override def apply(plan: LogicalPlan): LogicalPlan =
      filterPrune(plan).resolveOperatorsUp {
        case RelationTimeTravel(u: UnresolvedRelation, None, Some(v))
          if deltaTarget(u).isDefined =>
          readPlan(deltaTarget(u).get, Some(versionOf(v)))
        case RelationTimeTravel(u: UnresolvedRelation, Some(_), None)
          if deltaTarget(u).isDefined =>
          throw new UnsupportedOperationException(
            "graft_delta supports VERSION AS OF only — the Delta commit " +
              "timestamps this log records are writer wall clocks; use " +
              "an explicit version")
        case u: UnresolvedRelation if deltaTarget(u).isDefined =>
          readPlan(deltaTarget(u).get, None)
      }
  }
}
