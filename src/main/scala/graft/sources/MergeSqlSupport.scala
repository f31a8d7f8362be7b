package graft.sources

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction,
  InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias,
  UpdateAction, UpdateStarAction}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL → clause-object translation for the generalized `MERGE INTO`,
  * shared by ALL THREE dialect rules (graft_lake / graft_delta /
  * graft_iceberg): ON-clause splitting into upsert keys + target-only
  * scope conjuncts, qualifier-aware attribute rewriting onto the
  * [[ManifestLake.MergeSrcPrefix]] convention, and action mapping onto
  * [[ManifestLake.MergeMatched]]/[[ManifestLake.MergeInsert]]. Error
  * messages carry the `dialect` label so refusals name the surface the
  * user actually typed. */
private[sources] object MergeSqlSupport {

  /** A translated MERGE statement. `simple` = the plain upsert shape
    * (`WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`,
    * no scope, no NMBS) — dialects route it onto their proven
    * `merge()` fast path (which, on the lake, also widens schemas). */
  final case class Translated(keys: Seq[String], scope: Option[Column],
                              matched: Seq[ManifestLake.MergeMatched],
                              inserts: Seq[ManifestLake.MergeInsert],
                              nmbs: Seq[ManifestLake.MergeMatched],
                              simple: Boolean)

  /** The names a MERGE's SOURCE columns may be qualified by: every
    * alias / relation identifier on the root path of the source plan
    * (works on the unresolved AND resolved shapes — a temp view
    * resolves to `SubqueryAlias(viewName, View(...))`, keeping its
    * name addressable). */
  def srcQualifiersOf(plan: LogicalPlan): Set[String] = {
    val root = Locale.ROOT
    plan match {
      case SubqueryAlias(id, child) =>
        srcQualifiersOf(child) + id.name.toLowerCase(root)
      case u: UnresolvedRelation =>
        val parts = u.multipartIdentifier.map(_.toLowerCase(root))
        Set(parts.mkString("."), parts.last)
      case _ => Set.empty
    }
  }

  /** Split a MERGE ON condition into its equi-join key columns
    * (`t.k = s.k`, same name both sides — the upsert-key shape) and the
    * residual TARGET-ONLY conjuncts (the scope of a
    * `WHEN NOT MATCHED BY SOURCE` sync, e.g. `AND t.ds = '2026-08-13'`
    * — prune-able bounds the cost contract rides on). A conjunct
    * referencing source columns that is not a key equality has no
    * touched-files reading — still an error. `tgtCols` is a THUNK:
    * resolving the target's columns may cost a metadata read, and the
    * common qualified-key MERGE never needs it. */
  def splitMergeOn(cond: Expression, tgtQuals: Set[String],
                   tgtCols: () => Set[String], srcCols: Set[String],
                   dialect: String): (Seq[String], Seq[Expression]) = {
    val root = Locale.ROOT
    def targetOnly(e: Expression): Boolean = !e.exists {
      case UnresolvedAttribute(parts) if parts.length > 1 =>
        !tgtQuals.contains(parts.init.map(_.toLowerCase(root)).mkString("."))
      case UnresolvedAttribute(parts) =>
        val n = parts.head.toLowerCase(root)
        !tgtCols().contains(n) || srcCols.contains(n)
      case _ => false
    }
    cond match {
      case And(l, r) =>
        val (kl, sl) = splitMergeOn(l, tgtQuals, tgtCols, srcCols, dialect)
        val (kr, sr) = splitMergeOn(r, tgtQuals, tgtCols, srcCols, dialect)
        (kl ++ kr, sl ++ sr)
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
        if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
        (Seq(a.nameParts.last), Nil)
      case other if targetOnly(other) => (Nil, Seq(other))
      case other => throw new UnsupportedOperationException(
        s"$dialect MERGE supports conjunctions of t.key = s.key " +
          "(same column name both sides) plus target-only scope " +
          s"conjuncts; got: ${other.sql}")
    }
  }

  /** Strip relation qualifiers from a predicate's attributes. */
  def unqualify(cond: Expression): Expression = cond.transform {
    case UnresolvedAttribute(parts) if parts.length > 1 =>
      UnresolvedAttribute(Seq(parts.last))
  }

  /** Translate a resolved-source MERGE statement. `tgtQuals` are the
    * legal target qualifiers, `tgtCols` the (lazily resolved) target
    * column set. */
  def translate(m: MergeIntoTable, src: LogicalPlan, dialect: String,
                tgtQuals: Set[String], tgtCols: () => Set[String],
                evolvingSimpleMerge: Boolean = false): Translated = {
    val root = Locale.ROOT
    val srcCols = src.output.map(_.name.toLowerCase(root)).toSet
    val (keys, scopeConjuncts) = splitMergeOn(m.mergeCondition,
      tgtQuals, tgtCols, srcCols, dialect)
    if (keys.isEmpty) throw new UnsupportedOperationException(
      s"$dialect MERGE needs at least one t.key = s.key " +
        "conjunct in its ON clause")
    val scopeCol = scopeConjuncts
      .reduceOption[Expression](And(_, _))
      .map(e => ColumnBridge.column(unqualify(e)))
    val simple = scopeConjuncts.isEmpty &&
      m.notMatchedBySourceActions.isEmpty &&
      m.matchedActions.size == 1 &&
      m.matchedActions.forall {
        case UpdateStarAction(None) => true; case _ => false } &&
      m.notMatchedActions.forall {
        case InsertStarAction(None) => true; case _ => false } &&
      m.notMatchedActions.size == 1
    // WITH SCHEMA EVOLUTION: only the dialect whose simple-upsert
    // path already widens schemas from the source may accept it (the
    // lake's merge()); clause shapes never change the schema here
    if (m.withSchemaEvolution && !(simple && evolvingSimpleMerge))
      throw new UnsupportedOperationException(
        s"$dialect MERGE WITH SCHEMA EVOLUTION is supported for the " +
          "plain upsert shape on graft_lake only — widen the table " +
          "first (ALTER TABLE ADD COLUMNS) for clause merges")
    if (simple) return Translated(keys, None, Nil, Nil, Nil, simple = true)
    // the general clause surface maps onto mergeApply: target columns
    // by their own names, source columns under the __src_ prefix;
    // every attribute in a condition/assignment is rewritten to that
    // convention here, by qualifier (or by unambiguous ownership when
    // bare)
    val srcQuals = srcQualifiersOf(m.sourceTable) ++ srcQualifiersOf(src)
    def rw(e: Expression): Column =
      ColumnBridge.column(e.transform {
        case UnresolvedAttribute(parts) if parts.length > 1 =>
          val qual = parts.init.map(_.toLowerCase(root)).mkString(".")
          if (tgtQuals.contains(qual))
            UnresolvedAttribute(Seq(parts.last))
          else if (srcQuals.contains(qual))
            UnresolvedAttribute(
              Seq(ManifestLake.MergeSrcPrefix + parts.last))
          else throw new UnsupportedOperationException(
            s"$dialect MERGE cannot place " +
              s"'${parts.mkString(".")}' — qualify it with the " +
              "target or source alias")
        case UnresolvedAttribute(parts) =>
          val n = parts.head.toLowerCase(root)
          if (tgtCols().contains(n) && srcCols.contains(n))
            throw new UnsupportedOperationException(
              s"$dialect MERGE reference '${parts.head}' is " +
                "ambiguous — both target and source carry it; " +
                "qualify it")
          else if (srcCols.contains(n))
            UnresolvedAttribute(
              Seq(ManifestLake.MergeSrcPrefix + parts.head))
          else UnresolvedAttribute(parts)
      })
    def assignKey(a: Assignment): String = a match {
      case Assignment(k: UnresolvedAttribute, _) =>
        val parts = k.nameParts
        if (parts.length > 1 && !tgtQuals.contains(parts.init
            .map(_.toLowerCase(root)).mkString(".")))
          throw new UnsupportedOperationException(
            s"$dialect MERGE assignment target " +
              s"'${parts.mkString(".")}' is not a plain column " +
              "of the target table")
        parts.last
      case other => throw new UnsupportedOperationException(
        s"$dialect MERGE supports only plain column " +
          s"assignment targets; got: ${other.sql}")
    }
    def assignOf(a: Assignment): (String, Column) =
      assignKey(a) -> rw(a.value)
    val matchedClauses = m.matchedActions.map {
      case UpdateStarAction(c) =>
        ManifestLake.MergeUpdate(c.map(rw), None)
      case UpdateAction(c, assigns, _) =>
        ManifestLake.MergeUpdate(c.map(rw), Some(assigns.map(assignOf)))
      case DeleteAction(c) => ManifestLake.MergeDelete(c.map(rw))
      case other => throw new UnsupportedOperationException(
        s"$dialect MERGE: unsupported WHEN MATCHED action " +
          s"${other.getClass.getSimpleName}")
    }
    val insertClauses = m.notMatchedActions.map {
      case InsertStarAction(c) =>
        ManifestLake.MergeInsert(c.map(rw), None)
      case InsertAction(c, assigns) =>
        ManifestLake.MergeInsert(c.map(rw), Some(assigns.map(assignOf)))
      case other => throw new UnsupportedOperationException(
        s"$dialect MERGE: unsupported WHEN NOT MATCHED action " +
          s"${other.getClass.getSimpleName}")
    }
    // NMBS clauses see only the target row (there is no source row) —
    // a source reference is an error, caught by checking for the
    // __src_ convention after the rewrite
    def rwTgt(e: Expression): Column = {
      val c = rw(e)
      val bad = ColumnBridge.expression(c).collectFirst {
        case UnresolvedAttribute(parts) if parts.head
          .startsWith(ManifestLake.MergeSrcPrefix) => parts.head
      }
      bad.foreach(n => throw new UnsupportedOperationException(
        s"$dialect MERGE: WHEN NOT MATCHED BY SOURCE clauses " +
          "may reference target columns only — " +
          s"'${n.stripPrefix(ManifestLake.MergeSrcPrefix)}' " +
          "resolves to the source"))
      c
    }
    val nmbsClauses = m.notMatchedBySourceActions.map {
      case DeleteAction(c) => ManifestLake.MergeDelete(c.map(rwTgt))
      case UpdateAction(c, assigns, _) =>
        ManifestLake.MergeUpdate(c.map(rwTgt),
          Some(assigns.map(a => assignKey(a) -> rwTgt(a.value))))
      case other => throw new UnsupportedOperationException(
        s"$dialect MERGE: unsupported WHEN NOT MATCHED BY " +
          s"SOURCE action ${other.getClass.getSimpleName} — " +
          "UPDATE SET with explicit assignments or DELETE")
    }
    Translated(keys, scopeCol, matchedClauses, insertClauses,
      nmbsClauses, simple = false)
  }
}
