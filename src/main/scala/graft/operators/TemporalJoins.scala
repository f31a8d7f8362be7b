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
    val leftCols = left.columns
    val carried = rightValueCols.map(c => s"__asof_$c")

    val l = left
      .withColumns(rightValueCols.zip(carried).map { case (c, cc) =>
        cc -> lit(null).cast(right.schema(c).dataType)
      }.toMap)
      .withColumn("__side", lit(1))
    val r = right.select(
      (Seq(col(key), col(ts)) ++
        leftCols.filterNot(Set(key, ts)).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightValueCols.zip(carried).map { case (c, cc) => col(c).as(cc) } :+
        lit(0).as("__side")): _*)

    // side 0 (right) sorts before side 1 (left) at equal ts ⇒ >= match
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r.select(l.columns.map(col).toIndexedSeq: _*))
      .withColumns(carried.map(cc =>
        cc -> last(col(cc), ignoreNulls = true).over(w)).toMap)
      .filter(col("__side") === 1)
      .drop("__side")
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
      (Seq(col(key).as("__rkey"), col(ts).as("__rts")) ++
        rightValueCols.map(col)): _*)
      .withColumn("__rbucket", (unix_micros(col("__rts")) / toleranceUs).cast("long"))

    lb.join(rb, col(key) === col("__rkey") &&
        col("__bucket") === col("__rbucket"))
      .filter(abs(unix_micros(col(ts)) - unix_micros(col("__rts")))
        <= toleranceUs)
      .drop("__bucket", "__rbucket", "__rkey")
  }
}
