package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's DataFrame API lacks (SURVEY §4.4 /
  * brief: as-of join, range join), composed from existing operators per
  * the custom-operator preference order — the compositions below keep
  * the scale properties a dedicated physical operator would have.
  */
object TemporalJoins {

  /** AS-OF join: for every left row, the single most recent right row
    * with `right.ts <= left.ts` in the same key group (the
    * financial-tick / latest-dimension-version lookup).
    *
    * Composition: tag both sides, union, sort each key group once by
    * (ts, side), carry the last-seen right values forward with
    * `last(_, ignoreNulls)` over the running frame, keep left rows.
    * ONE shuffle (by key) and a per-group sort — same cost shape as a
    * dedicated as-of physical operator, and radically cheaper than the
    * naive `left.join(right, ts >= ts).groupBy.max` which multiplies
    * rows by the match count before collapsing them.
    *
    * Right side must be unique per (key, ts) — pre-aggregate if not
    * (duplicate-ts as-of semantics are ambiguous in every engine).
    * Right rows at exactly `left.ts` DO match (>= semantics, like
    * DuckDB's ASOF JOIN, which oracles this operator).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightValueCols: Seq[String]): DataFrame = {
    require(rightValueCols.nonEmpty, "asofJoin needs right value columns")
    val leftCols = left.columns

    // The carried values ride in ONE nullable struct: NULL marks "this is
    // a left placeholder row", so last(ignoreNulls) skips placeholders but
    // NEVER a matched right row whose VALUE happens to be NULL — the
    // struct itself is non-null, only its field is. Carrying the values
    // as bare columns would make a legitimate NULL value indistinguishable
    // from a placeholder and resurrect a stale older value.
    val payloadType = org.apache.spark.sql.types.StructType(
      rightValueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    val l = left
      .withColumn("__asof_payload", lit(null).cast(payloadType))
      .withColumn("__side", lit(1))
    val r = right.select(
      (Seq(col(key), col(ts)) ++
        leftCols.filterNot(Set(key, ts)).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightValueCols.map(col): _*).as("__asof_payload") :+
        lit(0).as("__side")): _*)

    // side 0 (right) sorts before side 1 (left) at equal ts ⇒ >= match
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r.select(l.columns.map(col).toIndexedSeq: _*))
      .withColumn("__asof_payload",
        last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumns(rightValueCols.map(c =>
        s"__asof_$c" -> col(s"__asof_payload.$c")).toMap)
      .drop("__side", "__asof_payload")
  }

  /** Bucketed range (interval) join: pairs (l, r) with
    * `|l.ts - r.ts| <= tolerance` in the same key group.
    *
    * Composition: quantize time into `tolerance`-wide buckets, explode
    * each left row to its bucket and both neighbors, equi-join on
    * (key, bucket), then apply the exact range predicate. Candidates
    * per row are bounded by bucket occupancy — never the cross product
    * a `ts BETWEEN` theta-join degenerates to at scale.
    */
  /** Right-side columns come back prefixed (`__range_<col>`, and the
    * right timestamp as `__range_ts`) so a right value column whose name
    * also exists on the left can never produce an ambiguous duplicate in
    * the output — the same protection [[asofJoin]]'s `__asof_` prefix
    * provides. */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
                toleranceUs: Long,
                rightValueCols: Seq[String]): DataFrame = {
    val lb = left
      .withColumn("__bucket0", (unix_micros(col(ts)) / toleranceUs).cast("long"))
      .withColumn("__bucket",
        explode(array(col("__bucket0") - 1, col("__bucket0"),
          col("__bucket0") + 1)))
      .drop("__bucket0")
    val rb = right.select(
      (Seq(col(key).as("__rkey"), col(ts).as("__range_ts")) ++
        rightValueCols.map(c => col(c).as(s"__range_$c"))): _*)
      .withColumn("__rbucket",
        (unix_micros(col("__range_ts")) / toleranceUs).cast("long"))

    lb.join(rb, col(key) === col("__rkey") &&
        col("__bucket") === col("__rbucket"))
      .filter(abs(unix_micros(col(ts)) - unix_micros(col("__range_ts")))
        <= toleranceUs)
      .drop("__bucket", "__rbucket", "__rkey")
  }
}
