package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}

/** SQL entry into the manifest lake: `MERGE INTO` / `DELETE FROM` /
  * `INSERT INTO` / `SELECT ... VERSION AS OF` against
  * `graft_lake.<name>` tables, resolved by a Catalyst rule instead of a
  * DSv2 catalog — deliberately. A DSv2 `TableCatalog` would route reads
  * through a custom `PartitionReaderFactory`, losing the built-in
  * vectorized parquet reader; rewriting the relation at RESOLUTION time
  * into the exact parquet scan [[ManifestLake.read]] plans keeps the
  * native read path (columnar batches, pushdown, whole-stage codegen)
  * while still giving SQL users the full DML + time-travel surface.
  * This completes the dbt-replacement story: the reference drives its
  * analytical layer from SQL models (`dags/dag_bike.py:122-135`), and
  * with this rule a SQL-only user can run the lake end-to-end.
  *
  * Tables are registered by name ([[LakeSql.register]]) on the driver —
  * the analog of a catalog's namespace, scoped to the process like the
  * lake's commit primitive.
  *
  * Supported statements (all hash-verified through the oracle gate):
  * {{{
  *   SELECT ... FROM graft_lake.t [VERSION AS OF n]
  *   INSERT INTO graft_lake.t SELECT ...          -- append
  *   INSERT OVERWRITE graft_lake.t SELECT ...     -- replace
  *   DELETE FROM graft_lake.t WHERE <predicate>
  *   UPDATE graft_lake.t SET c = <expr>, ... [WHERE <predicate>]
  *   MERGE INTO graft_lake.t USING <src> s ON t.k = s.k [AND <target-only scope>]
  *     WHEN MATCHED [AND c] THEN UPDATE SET ... | UPDATE SET * | DELETE
  *     WHEN NOT MATCHED [AND c] THEN INSERT ... | INSERT *
  *     WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET ... | DELETE
  *   ALTER TABLE graft_lake.t ADD COLUMNS (c TYPE, ...)   -- metadata-only
  *   SELECT ... FROM graft_lake.`t$history`               -- version history
  * }}}
  * The plain update-all/insert-all MERGE rides
  * [[ManifestLake.merge]]'s upsert; the general clause surface rides
  * [[ManifestLake.mergeApply]]. `WHEN NOT MATCHED BY SOURCE` (the
  * full-sync CDC mirror) requires either target-only ON conjuncts (a
  * prune-able scope) or the [[FullTableMergeConf]] opt-in — see
  * [[ManifestLake.mergeApply]] for the cost contract. Unsupported
  * shapes raise a named error rather than silently approximating.
  */
object LakeSql {

  /** The SQL namespace manifest tables live under. */
  val Namespace = "graft_lake"

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Register `name` so SQL can address the manifest table at `path`
    * as `graft_lake.name`. Process-scoped, like a catalog namespace. */
  def register(name: String, path: String): Unit =
    tables.put(name.toLowerCase(java.util.Locale.ROOT), path): Unit

  def pathOf(name: String): Option[String] =
    Option(tables.get(name.toLowerCase(java.util.Locale.ROOT)))

  /** Remove `name` from the registry (SQL `DROP TABLE`'s seam). */
  def unregister(name: String): Unit =
    tables.remove(name.toLowerCase(java.util.Locale.ROOT)): Unit

  /** Snapshot of the registry (SQL `SHOW TABLES IN graft_lake`). */
  def registered: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    tables.asScala.toMap
  }

  /** The registered lake path an ALTER command's `UnresolvedTable`
    * child refers to. */
  private def lakeAlterTarget(plan: LogicalPlan): Option[String] = plan match {
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
      if t.multipartIdentifier.length == 2 &&
        t.multipartIdentifier.head.equalsIgnoreCase(Namespace) =>
      pathOf(t.multipartIdentifier(1))
    case _ => None
  }

  /** The registered lake path a (possibly aliased) relation refers to. */
  private def lakeTarget(plan: LogicalPlan): Option[String] = plan match {
    case u: UnresolvedRelation
      if u.multipartIdentifier.length == 2 &&
        u.multipartIdentifier.head.equalsIgnoreCase(Namespace) =>
      pathOf(u.multipartIdentifier(1))
    case SubqueryAlias(_, child) => lakeTarget(child)
    case _ => None
  }

  /** The registered lake path an `ADD CONSTRAINT` statement targets —
    * matched as a PATTERN so the traversal and registry lookup run
    * once. */
  private object LakeConstraintTarget {
    def unapply(plan: LogicalPlan): Option[(
        org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint,
        String)] = plan match {
      case a: org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint =>
        a.child.collectFirst { case r: UnresolvedRelation => lakeTarget(r) }
          .flatten.map(a -> _)
      case _ => None
    }
  }

  /** The names a DML target's columns may legally be qualified by: the
    * relation alias if present, the bare table name, and the
    * namespace-qualified form. */
  private def targetQualifiers(plan: LogicalPlan): Set[String] = plan match {
    case SubqueryAlias(id, child) =>
      targetQualifiers(child) + id.name.toLowerCase(java.util.Locale.ROOT)
    case u: UnresolvedRelation if u.multipartIdentifier.length == 2 =>
      val t = u.multipartIdentifier(1).toLowerCase(java.util.Locale.ROOT)
      Set(t, s"${Namespace.toLowerCase(java.util.Locale.ROOT)}.$t")
    case _ => Set.empty
  }



  /** Strip relation qualifiers from a DML predicate's attributes: the
    * command evaluates it against the bare lake read, where `t.id`
    * would not resolve but `id` does. */
  private def unqualify(cond: Expression): Expression = cond.transform {
    case UnresolvedAttribute(parts) if parts.length > 1 =>
      UnresolvedAttribute(Seq(parts.last))
  }

  /** Resolution rule rewriting `graft_lake.*` relations and DML into
    * manifest-lake plans. Injected via
    * [[graft.plans.GraftExtensions]]. DML statements are matched at the
    * ROOT (where SQL grammar puts them) so their TARGET relation is
    * never rewritten into a read — only their source/query subtrees
    * are; plain reads and time travel rewrite anywhere in the tree. */
  final class LakeSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

    private def readPlan(path: String, version: Option[Long]): LogicalPlan =
      PlanBridge.analyzedPlan(ManifestLake.read(spark, path, version))

    /** The `` `name$suffix` `` metadata tables (the Iceberg idiom):
      * version history (DESCRIBE HISTORY analog) and the one-row table
      * profile (DESCRIBE DETAIL analog) — manifests only, never data
      * files. */
    private val metaTables: Seq[(String, (SparkSession, String) => DataFrame)] =
      Seq("$history" -> (ManifestLake.history _),
        "$detail" -> (ManifestLake.detail _),
        "$files" -> (ManifestLake.files _))

    /** Extractor resolving a `graft_lake.<name$suffix>` relation to its
      * metadata frame — built ONCE per match. */
    private object MetaRelation {
      def unapply(u: UnresolvedRelation): Option[DataFrame] =
        if (u.multipartIdentifier.length != 2 ||
          !u.multipartIdentifier.head.equalsIgnoreCase(Namespace)) None
        else {
          val name = u.multipartIdentifier(1)
          metaTables.collectFirst {
            case (suffix, fn) if name.endsWith(suffix) &&
              pathOf(name.stripSuffix(suffix)).isDefined =>
              fn(spark, pathOf(name.stripSuffix(suffix)).get)
          }
        }
    }

    /** A projection/aggregation list that is exactly one bare
      * `COUNT(*)` / `COUNT(1)` — no DISTINCT, no FILTER clause — with
      * its alias if the user named one. Matched on the UNRESOLVED shape
      * (the window where the child relation is still recognizable as a
      * lake table). */
    private object CountStarOnly {
      import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedFunction}
      import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
      def unapply(exprs: Seq[NamedExpression]): Option[Option[String]] =
        exprs match {
          case Seq(one) =>
            val (inner, name) = one match {
              case UnresolvedAlias(f, _) => (f, None)
              case a @ Alias(f, n) => (f, Some(n))
              case other => (other, None)
            }
            inner match {
              case f: UnresolvedFunction
                if f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT))
                  == Seq("count") &&
                  !f.isDistinct && f.filter.isEmpty &&
                  f.arguments == Seq(Literal(1)) =>
                Some(name)
              // the analyzer may resolve COUNT(1) (it has no column
              // dependencies) before the relation resolves — match the
              // resolved shape too
              case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
                if !ae.isDistinct && ae.filter.isEmpty &&
                  ae.aggregateFunction ==
                    org.apache.spark.sql.catalyst.expressions.aggregate
                      .Count(Seq(Literal(1))) =>
                Some(name)
              case _ => None
            }
          case _ => None
        }
    }

    /** One aggregate a stats-only plan may contain: COUNT(*) / COUNT(1),
      * or MIN/MAX of a bare column. `col = None` is the count. */
    private final case class StatAgg(fn: String, col: Option[String],
                                     alias: Option[String])

    /** A projection/aggregation list made ENTIRELY of COUNT(*) /
      * MIN(col) / MAX(col) — no DISTINCT, no FILTER, bare column
      * arguments — with at least one MIN/MAX (a lone COUNT belongs to
      * [[CountStarOnly]]'s route). Unresolved shape only: MIN/MAX have
      * column dependencies, so the analyzer cannot resolve them before
      * the relation, and the lake relation is still recognizable. */
    private object StatAggsOnly {
      import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedFunction}
      import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
      private def one(e: NamedExpression): Option[StatAgg] = {
        val (inner, name) = e match {
          case UnresolvedAlias(f, _) => (f, None)
          case a @ Alias(f, n) => (f, Some(n))
          case other => (other, None)
        }
        inner match {
          case f: UnresolvedFunction
            if !f.isDistinct && f.filter.isEmpty &&
              f.nameParts.lengthCompare(1) == 0 =>
            (f.nameParts.head.toLowerCase(java.util.Locale.ROOT),
              f.arguments) match {
              case ("count", Seq(Literal(1, _))) =>
                Some(StatAgg("count", None, name))
              case (fn @ ("min" | "max"), Seq(a: UnresolvedAttribute))
                if a.nameParts.lengthCompare(1) == 0 =>
                Some(StatAgg(fn, Some(a.nameParts.head), name))
              case _ => None
            }
          // COUNT(1) has no column dependencies, so the analyzer may
          // resolve it (and convert the Project to an Aggregate) while
          // the MIN/MAX siblings are still unresolved — match the
          // resolved count too, exactly as [[CountStarOnly]] does
          case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
            if !ae.isDistinct && ae.filter.isEmpty &&
              ae.aggregateFunction ==
                org.apache.spark.sql.catalyst.expressions.aggregate
                  .Count(Seq(Literal(1))) =>
            Some(StatAgg("count", None, name))
          case _ => None
        }
      }
      def unapply(exprs: Seq[NamedExpression]): Option[Seq[StatAgg]] = {
        val parsed = exprs.map(one)
        if (parsed.nonEmpty && parsed.forall(_.isDefined) &&
          parsed.exists(_.get.col.nonEmpty)) Some(parsed.map(_.get))
        else None
      }
    }

    /** The one-row answer for a [[StatAggsOnly]] list, when the
      * manifest can PROVE it: every entry records a row count (for
      * COUNT) and an exact numeric range for each MIN/MAX column, and
      * no entry carries a deletion vector (a DV may have deleted the
      * extremal row, making recorded ranges conservative rather than
      * exact). Numeric columns only — string stats are truncated by
      * design. Returns None to fall through to the scan. */
    private def statAggsPlan(path: String, version: Option[Long],
        aggs: Seq[StatAgg]): Option[LogicalPlan] = {
      import org.apache.spark.sql.types._
      val snap = ManifestLake.snapshot(spark, path, version)
      val schema = snap.schema.getOrElse(return None)
      if (snap.entries.isEmpty) return None // empty: MIN is NULL — scan
      if (snap.entries.exists(_.dv.nonEmpty)) return None
      val caseSensitive =
        spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
      def fieldOf(c: String): Option[StructField] = schema.fields.find(f =>
        if (caseSensitive) f.name == c else f.name.equalsIgnoreCase(c))
      def typed(bd: BigDecimal, dt: DataType): Option[Any] = dt match {
        case IntegerType => Some(bd.toInt)
        case LongType => Some(bd.toLong)
        case ShortType => Some(bd.toShort)
        case ByteType => Some(bd.toByte)
        case DoubleType => Some(bd.toDouble)
        case FloatType => Some(bd.toFloat)
        case d: DecimalType =>
          // recorded decimal stats carry the column scale (footerMeta
          // decodes the logical type); anything that can't rescale
          // losslessly declines to the scan rather than throwing out
          // of an analyzer rule
          scala.util.Try(bd.bigDecimal.setScale(d.scale,
            java.math.RoundingMode.UNNECESSARY)).toOption
        case _ => None
      }
      val values = aggs.map {
        case StatAgg("count", None, _) =>
          if (snap.entries.exists(_.rows.isEmpty)) return None
          snap.entries.flatMap(_.liveRows).sum: Any
        case StatAgg(fn, Some(c), _) =>
          val f = fieldOf(c).getOrElse(return None)
          val ranges = snap.entries.map(e =>
            e.range(f.name).getOrElse(return None))
          val bd =
            if (fn == "min") ranges.map(_.min).min else ranges.map(_.max).max
          typed(bd, f.dataType).getOrElse(return None)
        case _ => return None
      }
      val fields = aggs.map {
        case StatAgg("count", None, alias) =>
          StructField(alias.getOrElse("count(1)"), LongType,
            nullable = false)
        case StatAgg(fn, Some(c), alias) =>
          val f = fieldOf(c).get
          StructField(alias.getOrElse(s"$fn($c)"), f.dataType)
      }
      Some(PlanBridge.analyzedPlan(spark.createDataFrame(
        java.util.Collections.singletonList(Row(values: _*)),
        StructType(fields))))
    }

    /** `SELECT COUNT(*) FROM graft_lake.t` (no WHERE, no grouping)
      * answers from the MANIFEST — [[ManifestLake.fastCount]] sums the
      * per-file row counts recorded at write time and scans NOTHING.
      * The interactive-BI shape: on a 100 TB table this is the
      * difference between a millisecond metadata lookup and a full
      * scan. `SELECT COUNT(*), MIN(c), MAX(c) ...` extends the route:
      * served from one snapshot resolution when the manifest PROVES
      * the answer ([[statAggsPlan]]), scan otherwise. Any other shape
      * (predicates, grouping, more columns) falls through to the
      * normal scan untouched. Runs TOP-DOWN before [[resolveReads]],
      * which would otherwise rewrite the relation bottom-up and erase
      * the evidence that it was a lake table. */
    private def metadataCounts(plan: LogicalPlan): LogicalPlan = {
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
      def fastCountPlan(path: String, name: Option[String],
          version: Option[Long]): LogicalPlan = {
        val n = ManifestLake.fastCount(spark, path, version)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            name.getOrElse("count(1)"),
            org.apache.spark.sql.types.LongType, nullable = false)))
        PlanBridge.analyzedPlan(spark.createDataFrame(
          java.util.Collections.singletonList(Row(n)), schema))
      }
      // the countable child shapes: a bare lake relation, or one pinned
      // with VERSION AS OF (time travel counts from that version's
      // manifest — still zero data IO)
      object CountableLake {
        def unapply(child: LogicalPlan): Option[(String, Option[Long])] =
          child match {
            case RelationTimeTravel(u: UnresolvedRelation, None, Some(v))
              if lakeTarget(u).isDefined =>
              scala.util.Try(java.lang.Long.parseLong(v)).toOption
                .map(ver => (lakeTarget(u).get, Some(ver)))
            case _ => lakeTarget(child).map(_ -> None)
          }
      }
      plan.resolveOperatorsDown {
        case Project(CountStarOnly(name), CountableLake(path, v)) =>
          fastCountPlan(path, name, v)
        case Aggregate(Nil, CountStarOnly(name), CountableLake(path, v), _) =>
          fastCountPlan(path, name, v)
        case p @ Project(StatAggsOnly(aggs), CountableLake(path, v)) =>
          statAggsPlan(path, v, aggs).getOrElse(p)
        case a @ Aggregate(Nil, StatAggsOnly(aggs),
            CountableLake(path, v), _) =>
          statAggsPlan(path, v, aggs).getOrElse(a)
      }
    }

    /** DERIVED-partition pruning for SQL timestamp predicates — the
      * generated-column pruning Delta ships: a `WHERE` with both
      * timestamp bounds on a column the table records a day generation
      * for (`writeTimePartitioned`'s CHECK constraint) swaps the
      * relation for the day-pruned file set BEFORE resolution, so a
      * 1.5-day SQL query on a years-deep table lists two partitions'
      * files and nothing else. The ORIGINAL filter stays in the plan
      * (and pushes into the surviving scans), so the rewrite can only
      * ever remove provably-out-of-range files; any shape it can't
      * prove — missing bound, non-literal bound, OR at the top —
      * leaves the plan untouched and the plain read serves it. Runs
      * TOP-DOWN before [[resolveReads]], which would otherwise erase
      * the evidence the child was a lake table. */
    private def derivedPartitionPrune(plan: LogicalPlan): LogicalPlan = {
      import org.apache.spark.sql.catalyst.plans.logical.Filter
      // Bounds come from ManifestLake.predicateTsBounds — the SAME
      // extractor the DML day-pruning path uses (both literal
      // orientations, strict and non-strict, typed TimestampType
      // literals only), so SQL reads and DML cannot diverge on what
      // they can prune. A STRICT bound still prunes soundly at day
      // granularity (the boundary day is kept).
      def bounds(cond: Expression): (Map[String, Long], Map[String, Long]) = {
        val lo = scala.collection.mutable.Map.empty[String, Long]
        val hi = scala.collection.mutable.Map.empty[String, Long]
        ManifestLake.predicateTsBounds(cond).foreach { case (c, l, h) =>
          val n = c.toLowerCase(java.util.Locale.ROOT)
          l.foreach(v => lo(n) = math.max(lo.getOrElse(n, v), v))
          h.foreach(v => hi(n) = math.min(hi.getOrElse(n, v), v))
        }
        (lo.toMap, hi.toMap)
      }
      plan.resolveOperatorsDown {
        case f @ Filter(cond, u: UnresolvedRelation)
            if lakeTarget(u).isDefined =>
          val path = lakeTarget(u).get
          val (lo, hi) = bounds(cond)
          // day windows AND bucket equality points COMPOSE on one
          // entry set in a single call (1 bucket × matching periods on
          // a doubly-partitioned table), resolving the snapshot only
          // when the predicate has a prunable shape at all
          val windows = (lo.keySet & hi.keySet).map { c =>
            c -> (java.time.Instant.ofEpochSecond(
              Math.floorDiv(lo(c), 1000000L)),
              java.time.Instant.ofEpochSecond(
                Math.floorDiv(hi(c), 1000000L) + 1))
          }.toMap
          ManifestLake.readDerivedPruned(spark, path, cond, windows)
            .map(df => f.copy(child = PlanBridge.analyzedPlan(df)))
            .getOrElse(f)
      }
    }

    /** Rewrite reads (bare relations + time travel) anywhere below. */
    private def resolveReads(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperatorsUp {
        case MetaRelation(df) => PlanBridge.analyzedPlan(df)
        case RelationTimeTravel(u: UnresolvedRelation, ts, version)
          if lakeTarget(u).isDefined =>
          val path = lakeTarget(u).get
          val v = (ts, version) match {
            case (Some(e), _) =>
              // evaluate the (foldable) timestamp expression in the
              // session time zone, as the engines do
              val micros = org.apache.spark.sql.catalyst.expressions.Cast(
                e, org.apache.spark.sql.types.TimestampType,
                Some(spark.conf.get("spark.sql.session.timeZone")))
                .eval(null)
              if (micros == null) throw new IllegalArgumentException(
                s"TIMESTAMP AS OF ${e.sql} does not evaluate to a timestamp")
              ManifestLake.versionAsOf(spark, path,
                Math.floorDiv(micros.asInstanceOf[Long], 1000L))
            case (None, Some(n)) => java.lang.Long.parseLong(n)
            case _ => throw new UnsupportedOperationException(
              "graft_lake time travel needs VERSION AS OF n or " +
                "TIMESTAMP AS OF ts")
          }
          readPlan(path, Some(v))
        case u: UnresolvedRelation if lakeTarget(u).isDefined =>
          readPlan(lakeTarget(u).get, None)
      }

    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      case m: MergeIntoTable if lakeTarget(m.targetTable).isDefined =>
        val src = resolveReads(m.sourceTable)
        if (!src.resolved) m.copy(sourceTable = src) // wait for the analyzer
        else {
          val path = lakeTarget(m.targetTable).get
          val tr = MergeSqlSupport.translate(m, src, "graft_lake",
            targetQualifiers(m.targetTable),
            // a thunk: resolving a legacy schema-less table's columns
            // costs a file-index listing the qualified-key MERGE
            // never needs
            () => ManifestLake.snapshot(spark, path).schema
              .getOrElse(ManifestLake.read(spark, path).schema)
              .fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet,
            // the lake's simple-upsert path (ManifestLake.merge)
            // already widens schemas from the source — WITH SCHEMA
            // EVOLUTION is simply accepted for that shape
            evolvingSimpleMerge = true)
          if (tr.simple)
            // the plain upsert rides ManifestLake.merge, which also
            // widens schemas from the source — the proven lk2/lk5 path
            GraftMergeIntoCommand(path, tr.keys,
              PlanBridge.ofRows(spark, src))
          else
            GraftMergeApplyCommand(path, tr.keys, tr.matched,
              tr.inserts, tr.nmbs, tr.scope,
              PlanBridge.ofRows(spark, src))
        }
      // `ADD CONSTRAINT ... CHECK` parses as AddCheckConstraint with a
      // Filter(NOT pred, relation) child — Spark's own existing-data
      // validation scan. Match it at the ROOT so the relation is never
      // rewritten into a bare read (ResolveSessionCatalog would choke
      // on a catalog-less LogicalRelation); ManifestLake.addConstraint
      // performs the equivalent existing-data scan itself.
      case LakeConstraintTarget(a, path) =>
        val c = a.checkConstraint
        val char = c.userProvidedCharacteristic
        // explicit ENFORCED and NORELY are the behaviors the lake
        // implements — accept them; only their opposites are refused
        if (char.enforced.contains(false))
          throw new UnsupportedOperationException(
            "graft_lake CHECK constraints are always ENFORCED; NOT " +
              "ENFORCED is unsupported — drop the characteristic or " +
              "the constraint")
        if (char.rely.contains(true))
          throw new UnsupportedOperationException(
            "graft_lake CHECK constraints are always validated; RELY " +
              "is unsupported")
        // the parser hands over the user's ORIGINAL text, line breaks
        // included, but the manifest log is line-oriented. Replacing
        // ONLY line breaks keeps string literals intact ('a  b' must
        // not become 'a b'); a line comment would swallow the rest of
        // the flattened predicate, so it is refused by name.
        val cond = c.condition
        if (cond.exists(ch => ch == '\n' || ch == '\r') &&
          cond.contains("--"))
          throw new UnsupportedOperationException(
            "graft_lake CHECK predicates are stored single-line; a " +
              "line comment (--) inside a multi-line CHECK would " +
              "swallow the rest of the predicate — remove the comment")
        GraftAddConstraintCommand(path,
          Option(c.userProvidedName).getOrElse(c.name),
          cond.replace('\n', ' ').replace('\r', ' ').trim)
      case d: org.apache.spark.sql.catalyst.plans.logical.DropConstraint
        if lakeAlterTarget(d.table).isDefined =>
        GraftDropConstraintCommand(lakeAlterTarget(d.table).get, d.name,
          d.ifExists)
      case a: org.apache.spark.sql.catalyst.plans.logical.AddColumns
        if lakeAlterTarget(a.table).isDefined =>
        val cols = a.columnsToAdd.map { c =>
          if (c.path.nonEmpty || c.position.nonEmpty || c.default.nonEmpty)
            throw new UnsupportedOperationException(
              "graft_lake ALTER TABLE ADD COLUMNS supports plain top-level " +
                "columns only (no nested paths, FIRST/AFTER positions, or " +
                "DEFAULT values)")
          org.apache.spark.sql.types.StructField(c.colName, c.dataType,
            nullable = true)
        }
        GraftAddColumnsCommand(lakeAlterTarget(a.table).get, cols)
      case d: DeleteFromTable if lakeTarget(d.table).isDefined =>
        GraftDeleteCommand(lakeTarget(d.table).get,
          ColumnBridge.column(unqualify(d.condition)))
      case u: UpdateTable if lakeTarget(u.table).isDefined =>
        // A multi-part assignment key is legal ONLY when its qualifier
        // is the target relation (alias / table / namespace.table) —
        // anything else is a nested-field target, which must raise
        // rather than fall through to the leaf name: `SET s.qty = 0`
        // with both a struct field s.qty and a top-level qty would
        // otherwise silently update the WRONG column.
        val quals = targetQualifiers(u.table)
        val assigns = u.assignments.map {
          case Assignment(k: UnresolvedAttribute, v) =>
            val parts = k.nameParts
            if (parts.length > 1 && !quals.contains(parts.init
                .map(_.toLowerCase(java.util.Locale.ROOT)).mkString(".")))
              throw new UnsupportedOperationException(
                s"graft_lake UPDATE target '${parts.mkString(".")}' is " +
                  "not a plain column of the target table — nested-field " +
                  "assignment is unsupported")
            parts.last -> ColumnBridge.column(unqualify(v))
          case other => throw new UnsupportedOperationException(
            s"graft_lake UPDATE supports only plain column assignment " +
              s"targets; got: ${other.sql}")
        }
        GraftUpdateCommand(lakeTarget(u.table).get, assigns,
          ColumnBridge.column(u.condition.fold[Expression](
            org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)(
            unqualify)))
      case i: InsertIntoStatement if lakeTarget(i.table).isDefined =>
        if (i.partitionSpec.nonEmpty || i.userSpecifiedCols.nonEmpty)
          throw new UnsupportedOperationException(
            "graft_lake INSERT supports no PARTITION spec or column list")
        val q = resolveReads(i.query)
        if (!q.resolved) i.copy(query = q)
        else GraftInsertCommand(lakeTarget(i.table).get, i.overwrite,
          PlanBridge.ofRows(spark, q))
      case other =>
        resolveReads(derivedPartitionPrune(metadataCounts(other)))
    }
  }

  /** Session conf making SQL DML record the change feed (the
    * `delta.enableChangeDataFeed` analog, session-scoped): when true,
    * `MERGE INTO` / `DELETE FROM` stage CDC sidecars so the commit is
    * streamable as changes. */
  val RecordChangeFeedConf = "spark.graft.lake.recordChangeFeed"

  private def recordCdf(spark: SparkSession): Boolean =
    spark.conf.getOption(RecordChangeFeedConf).exists(_.toBoolean)

  /** Session conf choosing how SQL `DELETE FROM` and `UPDATE` execute:
    * `cow` (default — [[ManifestLake.delete]]/[[ManifestLake.update]]'s
    * copy-on-write file rewrite) or `mor`
    * ([[ManifestLake.deleteMor]]/[[ManifestLake.updateMor]]'s
    * deletion-vector sidecar, the small-DML-on-big-files shape). */
  val DmlModeConf = "spark.graft.lake.dmlMode"

  /** Session conf opting a SQL MERGE with `WHEN NOT MATCHED BY SOURCE`
    * into the WHOLE-TABLE pass when its ON clause carries no
    * target-only scope conjuncts — the explicit acknowledgment that an
    * unscoped full sync reads every candidate file (the write still
    * stays O(affected rows) via merge-on-read tombstones). */
  val FullTableMergeConf = "spark.graft.lake.fullTableMerge"

  private def fullTableMerge(spark: SparkSession): Boolean =
    spark.conf.getOption(FullTableMergeConf).exists(_.toBoolean)

  /** Thread-confined DML-mode override. The session conf is GLOBAL to
    * every thread sharing the session — a gate/benchmark harness
    * running queries on a pool would have one row's set/unset window
    * silently flip CONCURRENT rows' DML mode (hash-identical results,
    * but the rows would no longer pin the path they claim to).
    * `withDmlMode` scopes the choice to the calling thread; SQL
    * commands execute eagerly on that thread, so the override is
    * visible exactly to the statements inside the block. The session
    * conf remains the public multi-statement surface. */
  private val dmlModeOverride = new ThreadLocal[Option[String]] {
    override def initialValue(): Option[String] = None
  }

  def withDmlMode[T](mode: String)(f: => T): T = {
    require(mode == "cow" || mode == "mor",
      s"dml mode must be 'cow' or 'mor', got '$mode'")
    val prev = dmlModeOverride.get()
    dmlModeOverride.set(Some(mode))
    try f finally dmlModeOverride.set(prev)
  }

  private def morDml(spark: SparkSession): Boolean =
    dmlModeOverride.get()
      .orElse(spark.conf.getOption(DmlModeConf)) match {
      case None | Some("cow") => false
      case Some("mor") => true
      case Some(other) => throw new IllegalArgumentException(
        s"$DmlModeConf must be 'cow' or 'mor', got '$other'")
    }

  /** `MERGE INTO` a manifest table — executes [[ManifestLake.merge]]'s
    * copy-on-write upsert (stats-pruned candidates, touched-file-only
    * rewrite) when the command runs. */
  final case class GraftMergeIntoCommand(table: String, keyCols: Seq[String],
      @transient source: DataFrame) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      ManifestLake.merge(source, table, keyCols,
        recordChangeFeed = recordCdf(spark)): Unit
      Seq.empty
    }
  }

  /** General-clause `MERGE INTO` — executes [[ManifestLake.mergeApply]]
    * (conditional matched update/delete, conditional insert,
    * NOT-MATCHED-BY-SOURCE sync, first-match-wins) when the command
    * runs. `scope` is the ON clause's target-only conjunction;
    * [[FullTableMergeConf]] is read at execution, so `SET` and `MERGE`
    * compose in one session naturally. */
  final case class GraftMergeApplyCommand(table: String,
      keyCols: Seq[String],
      matched: Seq[ManifestLake.MergeMatched],
      notMatched: Seq[ManifestLake.MergeInsert],
      notMatchedBySource: Seq[ManifestLake.MergeMatched],
      scope: Option[org.apache.spark.sql.Column],
      @transient source: DataFrame) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      ManifestLake.mergeApply(source, table, keyCols, matched, notMatched,
        notMatchedBySource = notMatchedBySource, scope = scope,
        fullTableMerge = fullTableMerge(spark),
        recordChangeFeed = recordCdf(spark)): Unit
      Seq.empty
    }
  }

  /** `ALTER TABLE ... ADD CONSTRAINT name CHECK (...)` —
    * [[ManifestLake.addConstraint]]: existing data validated, then a
    * metadata-only commit; every later write/merge/update enforces it. */
  final case class GraftAddConstraintCommand(table: String, name: String,
      conditionSql: String) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      ManifestLake.addConstraint(spark, table, name, conditionSql): Unit
      Seq.empty
    }
  }

  /** `ALTER TABLE ... DROP CONSTRAINT [IF EXISTS] name`. */
  final case class GraftDropConstraintCommand(table: String, name: String,
      ifExists: Boolean) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      try ManifestLake.dropConstraint(spark, table, name): Unit
      catch {
        case e: IllegalArgumentException
          if ifExists && e.getMessage.contains("no constraint") => ()
      }
      Seq.empty
    }
  }

  /** `ALTER TABLE ... ADD COLUMNS` — [[ManifestLake.addColumns]]'s
    * metadata-only widened-schema commit (no data IO at any size). */
  final case class GraftAddColumnsCommand(table: String,
      cols: Seq[org.apache.spark.sql.types.StructField])
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      ManifestLake.addColumns(spark, table, cols): Unit
      Seq.empty
    }
  }

  /** `DELETE FROM` a manifest table — [[ManifestLake.delete]]'s
    * copy-on-write rewrite of only the files holding a match, or
    * [[ManifestLake.deleteMor]]'s deletion-vector commit when the
    * session's [[DmlModeConf]] is `mor`. */
  final case class GraftDeleteCommand(table: String,
      @transient predicate: org.apache.spark.sql.Column)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      if (morDml(spark))
        ManifestLake.deleteMor(spark, table, predicate,
          recordChangeFeed = recordCdf(spark)): Unit
      else
        ManifestLake.delete(spark, table, predicate,
          recordChangeFeed = recordCdf(spark)): Unit
      Seq.empty
    }
  }

  /** `UPDATE ... SET ... [WHERE ...]` — [[ManifestLake.update]]'s
    * copy-on-write rewrite of only the files holding a matching row
    * ([[ManifestLake.updateMor]]'s deletion-vector + append commit
    * under [[DmlModeConf]] `mor`); assignments evaluate against the
    * pre-update row, SQL-style. */
  final case class GraftUpdateCommand(table: String,
      @transient assignments: Seq[(String, org.apache.spark.sql.Column)],
      @transient predicate: org.apache.spark.sql.Column)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      if (morDml(spark))
        ManifestLake.updateMor(spark, table, predicate, assignments,
          recordChangeFeed = recordCdf(spark)): Unit
      else
        ManifestLake.update(spark, table, predicate, assignments,
          recordChangeFeed = recordCdf(spark)): Unit
      Seq.empty
    }
  }

  /** `INSERT INTO` (append) / `INSERT OVERWRITE` (replace) a manifest
    * table as a new committed version. SQL INSERT resolves the query's
    * output against the table BY POSITION (standard SQL semantics —
    * `SELECT id + 100, ...` has auto-generated column names), so the
    * output is renamed and cast to the table's recorded schema before
    * the lake write; a column-count mismatch is a named error. A fresh
    * (never-committed) table takes the query's schema as-is. */
  final case class GraftInsertCommand(table: String, overwrite: Boolean,
      @transient query: DataFrame) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.col
      val aligned = ManifestLake.currentVersion(spark, table) match {
        case None => query
        case Some(v) =>
          val schema = ManifestLake.snapshot(spark, table, Some(v)).schema
            .getOrElse(ManifestLake.read(spark, table, Some(v)).schema)
          if (query.columns.length != schema.length)
            throw new IllegalArgumentException(
              s"INSERT into graft_lake table $table: query produces " +
                s"${query.columns.length} columns but the table has " +
                s"${schema.length} (${schema.fieldNames.mkString(", ")}) — " +
                "INSERT matches by position and needs the full width.")
          // backquoted: generated names like `round(x, 1.5)` hold dots
          query.select(query.columns.toSeq.zip(schema.fields.toSeq).map {
            case (c, f) => col(s"`$c`").cast(f.dataType).as(f.name) }: _*)
      }
      ManifestLake.write(aligned, table, append = !overwrite): Unit
      Seq.empty
    }
  }
}
