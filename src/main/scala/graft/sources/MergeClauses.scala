package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{coalesce, col, lit, when}
import org.apache.spark.sql.types.StructType

import graft.sources.ManifestLake.{MergeDelete, MergeInsert, MergeMatched,
  MergeSrcPrefix, MergeUpdate}

/** The generalized-MERGE clause semantics shared by the open-format
  * interops — the row-level machinery of [[ManifestLake.mergeApply]]
  * (clause conditions/values over the joined row, FIRST-MATCH-WINS in
  * declaration order, TRUE-only condition gating, `SET *`/`INSERT *`
  * column resolution) factored over plain DataFrames so
  * [[DeltaInterop.mergeApply]] and [[IcebergInterop.mergeApply]] apply
  * identical semantics to their own copy-on-write staging. Target
  * columns appear under their own names, source columns under
  * [[ManifestLake.MergeSrcPrefix]] ([[ManifestLake.mergeSrcCol]]).
  *
  * Everything here is LAZY plan composition over ONE left join of the
  * rewritten files' rows against the prefixed source — no action runs
  * until the caller stages; CDC projections reuse the same join. */
private[sources] object MergeClauses {

  /** The composed clause application over the files being rewritten.
    * All members are lazily-planned projections of one join:
    *  - `survivors`: schema-ordered rewrite content — carried rows
    *    (no clause fired) plus UPDATE results; DELETE-fired rows
    *    dropped.
    *  - `inserts`: schema-ordered fired NOT MATCHED source rows.
    *  - `firedOld`: old images of every row a MATCHED or NMBS clause
    *    fired on (updates + deletes) — the rowsAffected basis.
    *  - `updatedPre` / `updatedPost`: old/new images of UPDATE-fired
    *    rows (CDF `update_preimage`/`update_postimage`).
    *  - `deletedOld`: old images of DELETE-fired rows. */
  final case class Applied(survivors: DataFrame, inserts: DataFrame,
                           firedOld: DataFrame,
                           updatedPre: DataFrame, updatedPost: DataFrame,
                           deletedOld: DataFrame)

  /** Shared structural validation — the contracts that do not need
    * table state. */
  def requireValid(keyCols: Seq[String], matched: Seq[MergeMatched],
                   notMatched: Seq[MergeInsert],
                   notMatchedBySource: Seq[MergeMatched]): Unit = {
    require(keyCols.nonEmpty, "MERGE needs at least one key column")
    require(matched.nonEmpty || notMatched.nonEmpty ||
      notMatchedBySource.nonEmpty, "MERGE needs at least one WHEN clause")
    notMatchedBySource.foreach {
      case u: MergeUpdate => require(u.assignments.nonEmpty,
        "WHEN NOT MATCHED BY SOURCE UPDATE needs explicit " +
          "assignments — there is no source row to SET * from")
      case _ => ()
    }
  }

  /** A clause condition as a fire test: absent = always, NULL = no
    * (the SQL contract's TRUE-only gating). */
  private[sources] def fires(c: Option[Column]): Column =
    coalesce(c.getOrElse(lit(true)), lit(false))

  /** Shared small-table test for the unscoped-NMBS automatic
    * whole-table pass ([[ManifestLake.NmbsSmallTableBytesConf]]):
    * `recordedBytes` is the table's total recorded size, None when any
    * file's size is unrecorded (conservatively large). Malformed conf
    * values count as the default rather than failing DML. */
  def nmbsSmallTable(spark: org.apache.spark.sql.SparkSession,
                     recordedBytes: Option[Long]): Boolean = {
    val threshold = spark.conf
      .getOption(ManifestLake.NmbsSmallTableBytesConf)
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .getOrElse(1L * 1024 * 1024 * 1024)
    threshold > 0 && recordedBytes.exists(_ <= threshold)
  }

  /** First-match-wins action index over clause conditions (offset by
    * `base` in the shared action space); -1 = no clause fired. */
  def actionIndexOf(conds: Seq[Option[Column]], base: Int = 0): Column =
    conds.zipWithIndex.foldRight(lit(-1)) { case ((c, i), rest) =>
      when(fires(c), lit(base + i)).otherwise(rest)
    }

  def actionIndex(clauses: Seq[MergeMatched], base: Int = 0): Column =
    actionIndexOf(clauses.map(_.condition), base)

  /** Compose the clause application. `currentRows` is the rewritten
    * files' live rows (schema columns only); `notMatchedSrc` is the
    * source rows with NO live-key match anywhere in the table (the
    * caller's full-key anti-join — completeness is the caller's
    * contract); `scope` rides the join condition per SQL ON semantics
    * (a key-equal row failing it is NOT matched), and NMBS clauses
    * fire on source-matchless rows inside the scope (everywhere, when
    * `effectiveFullTable`). */
  /** `extraCarry` columns (present on `currentRows`, e.g. Iceberg v3
    * lineage) ride survivors VERBATIM — except UPDATE-fired rows,
    * where a `stampUpdated` entry overrides the carry (the
    * last-updated-sequence bump) — and land NULL on inserts (fresh
    * rows inherit downstream). CDC images stay schema-shaped. */
  def apply(currentRows: DataFrame, source: DataFrame,
            keyCols: Seq[String], schema: StructType,
            matched: Seq[MergeMatched], notMatched: Seq[MergeInsert],
            notMatchedBySource: Seq[MergeMatched],
            scope: Option[Column], effectiveFullTable: Boolean,
            notMatchedSrc: DataFrame,
            extraCarry: Seq[org.apache.spark.sql.types.StructField] = Nil,
            stampUpdated: Map[String, Column] = Map.empty): Applied = {
    extraCarry.foreach(f => require(
      currentRows.columns.contains(f.name),
      s"extraCarry column ${f.name} missing from the rewrite scan"))
    require(schema.fieldNames.forall(!_.startsWith(MergeSrcPrefix)),
      s"MERGE target columns may not start with '$MergeSrcPrefix'")
    val srcNames = source.columns.toSeq
    def srcHas(n: String): Boolean = srcNames.exists(_.equalsIgnoreCase(n))
    keyCols.foreach(k => require(srcHas(k),
      s"MERGE source lacks key column '$k'"))
    val presentCol = MergeSrcPrefix + "__present"
    def prefix(df: DataFrame): DataFrame = df.select(
      (df.columns.toSeq.map(c => col(s"`$c`").as(MergeSrcPrefix + c)) :+
        lit(1).as(presentCol)): _*)
    val srcP = prefix(source)
    val joinCond = scope.foldLeft(keyCols.map(k =>
      col(s"`$k`") === col(MergeSrcPrefix + k)).reduce(_ && _))(_ && _)
    val joined = currentRows.join(srcP, joinCond, "left")
    // shared action space: matched clauses first, NMBS clauses after
    val scopeP = scope.map(c => coalesce(c, lit(false)))
      .getOrElse(lit(effectiveFullTable))
    val withAct = joined.withColumn("__act",
      when(col(presentCol).isNotNull, actionIndex(matched))
        .otherwise(if (notMatchedBySource.isEmpty) lit(-1)
        else when(scopeP, actionIndex(notMatchedBySource, matched.size))
          .otherwise(lit(-1))))
    val rowClauses = matched ++ notMatchedBySource
    val deleteIdxs = rowClauses.zipWithIndex.collect {
      case (_: MergeDelete, i) => i }
    val updateIdxs = rowClauses.zipWithIndex.collect {
      case (_: MergeUpdate, i) => i }
    val surviving =
      if (deleteIdxs.isEmpty) withAct
      else withAct.filter(!col("__act").isin(deleteIdxs: _*))
    def updateValue(f: org.apache.spark.sql.types.StructField): Column =
      rowClauses.zipWithIndex.foldRight(col(s"`${f.name}`")) {
        case ((u: MergeUpdate, i), rest) =>
          val v = u.assignments match {
            case None => // SET *: source value where the source has one
              if (srcHas(f.name)) col(MergeSrcPrefix + f.name)
              else col(s"`${f.name}`")
            case Some(as) => as.find(_._1.equalsIgnoreCase(f.name))
              .map(_._2).getOrElse(col(s"`${f.name}`"))
          }
          when(col("__act") === i, v.cast(f.dataType)).otherwise(rest)
        case (_, rest) => rest
      }.as(f.name)
    val schemaCols = schema.fields.toIndexedSeq
    def carryValue(f: org.apache.spark.sql.types.StructField): Column =
      stampUpdated.get(f.name) match {
        case Some(stamp) if updateIdxs.nonEmpty =>
          when(col("__act").isin(updateIdxs: _*), stamp)
            .otherwise(col(s"`${f.name}`")).as(f.name)
        case _ => col(s"`${f.name}`").as(f.name)
      }
    val survivors = surviving.select(
      (schemaCols.map(updateValue) ++ extraCarry.map(carryValue)): _*)
    val oldCols = schemaCols.map(f => col(s"`${f.name}`"))
    val firedOld = withAct.filter(col("__act") >= 0).select(oldCols: _*)
    val updatedRows =
      if (updateIdxs.isEmpty) withAct.filter(lit(false))
      else withAct.filter(col("__act").isin(updateIdxs: _*))
    val updatedPre = updatedRows.select(oldCols: _*)
    val updatedPost = updatedRows.select(schemaCols.map(updateValue): _*)
    val deletedOld =
      (if (deleteIdxs.isEmpty) withAct.filter(lit(false))
       else withAct.filter(col("__act").isin(deleteIdxs: _*)))
        .select(oldCols: _*)
    // fired NOT MATCHED inserts over the caller's anti-join basis
    val srcNM = prefix(notMatchedSrc)
    val firedIns = srcNM.withColumn("__iact",
        actionIndexOf(notMatched.map(_.condition)))
      .filter(col("__iact") >= 0)
    def insertValue(f: org.apache.spark.sql.types.StructField): Column =
      notMatched.zipWithIndex.foldRight(lit(null).cast(f.dataType)) {
        case ((cl, i), rest) =>
          val v = cl.assignments match {
            case None => // INSERT *: null where the source lacks it
              if (srcHas(f.name)) col(MergeSrcPrefix + f.name)
              else lit(null).cast(f.dataType)
            case Some(as) => as.find(_._1.equalsIgnoreCase(f.name))
              .map(_._2).getOrElse(lit(null).cast(f.dataType))
          }
          when(col("__iact") === i, v.cast(f.dataType)).otherwise(rest)
      }.as(f.name)
    val inserts = firedIns.select(
      (schemaCols.map(insertValue) ++ extraCarry.map(f =>
        lit(null).cast(f.dataType).as(f.name))): _*)
    Applied(survivors, inserts, firedOld, updatedPre, updatedPost,
      deletedOld)
  }
}
