package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized aggregate over a manifest-lake table — the
  * classic incremental-view-maintenance shape: a grouped SUM/COUNT view
  * kept current by applying the source's row-level CHANGE FEED instead
  * of re-aggregating the source. The cost model is the whole point at
  * 100 TB: a refresh reads only the CHANGED files of the versions since
  * the last one ([[ManifestLake.changeFeed]] never touches untouched
  * files), plus the materialized table itself — which is O(distinct
  * keys), not O(source). Re-aggregating from scratch reads the full
  * source every time; this reads it once, ever.
  *
  * Exactly-once bookkeeping rides the lake's own streaming-identity
  * headers: each refresh commits the view with `batchId = <source
  * version applied>` and an app id derived from the view definition, so
  * a refresh is RESUMABLE (the next one feeds from the recorded
  * version), IDEMPOTENT (already-at-head is a no-op), and a view table
  * can never be corrupted by a refresh with a different definition
  * (app-id mismatch raises).
  *
  * Sums are maintained in fixed-precision decimal
  * (`CAST(col AS DECIMAL(27,2))`): decimal addition is exact and
  * associative, so the incrementally-maintained value is BIT-IDENTICAL
  * to a from-scratch re-aggregation regardless of application order —
  * the property that makes the view hash-verifiable against an oracle
  * (double sums would drift by reassociation). Counts are longs.
  * Groups whose row count reaches zero leave the view, matching the
  * re-aggregation semantics.
  *
  * Requirements on the source: every version in the refresh range must
  * be row-diffable — plain appends always are; merges/deletes/updates
  * must have been committed with `recordChangeFeed = true` (or the SQL
  * session conf). A non-diffable version raises through
  * [[ManifestLake.changeFeed]] with the version named.
  */
object MaterializedAgg {

  private val SumType = "decimal(27,2)"

  /** The full view identity: SOURCE TABLE plus key and sum columns. The
    * source must be part of it — two same-shaped views over different
    * sources would otherwise pass the guard and a misdirected refresh
    * would silently mix totals (and interpret the recorded version
    * against the wrong version sequence). */
  private def appIdFor(source: String, keyCols: Seq[String],
                       sumCols: Seq[String]): String =
    s"graft-mview:$source:${keyCols.mkString(",")}:${sumCols.mkString(",")}"

  /** The view's schema: key columns, one `<col>_sum` per sum column,
    * and `n_rows`. An empty `sumCols` keeps only the multiplicity —
    * the inner layer of the distinct-count view. */
  private def aggregate(rows: DataFrame, keyCols: Seq[String],
                        sumCols: Seq[String], sign: Column): DataFrame =
    if (sumCols.isEmpty)
      rows.groupBy(keyCols.map(col): _*)
        .agg(sum(sign.cast("long")).as("n_rows"))
    else rows.groupBy(keyCols.map(col): _*)
      .agg(
        sum(col(sumCols.head).cast(SumType) * sign)
          .cast(SumType).as(s"${sumCols.head}_sum"),
        (sumCols.tail.map(c =>
          sum(col(c).cast(SumType) * sign).cast(SumType).as(s"${c}_sum")) :+
          sum(sign.cast("long")).as("n_rows")): _*)

  /** Bring `aggTable` up to the source's current head. Returns the
    * source version the view now reflects. A fresh (never-committed)
    * view table builds from the full feed (version 1 is the initial
    * data, all inserts). */
  def refresh(spark: SparkSession, source: String, aggTable: String,
              keyCols: Seq[String], sumCols: Seq[String]): Long = {
    require(keyCols.nonEmpty && sumCols.nonEmpty,
      "materialized agg needs key and sum columns")
    refreshImpl(spark, source, aggTable, keyCols, sumCols,
      appIdFor(source, keyCols, sumCols))
  }

  /** Incremental COUNT DISTINCT maintenance — the EXACT scale path for
    * "distinct users per segment over a mutating 100 TB table":
    * sketches (HLL) merge under inserts but cannot retract a delete,
    * so the maintained state is instead the classic two-layer IVM form
    * — a PAIR table keyed by `(keyCols…, distinctCol)` holding each
    * pair's live multiplicity, maintained by the same change-feed
    * arithmetic as [[refresh]] (a delete decrements; a pair reaching
    * zero leaves the table, exactly when its value stops counting).
    * The pair table is O(distinct pairs) — the distinct count's own
    * information content — and a refresh reads only changed files plus
    * that table, never the source. Serve with [[distinctCounts]]: an
    * O(pairs) aggregate instead of an O(source) COUNT DISTINCT
    * re-scan. */
  def refreshDistinct(spark: SparkSession, source: String,
                      pairTable: String, keyCols: Seq[String],
                      distinctCol: String): Long = {
    require(keyCols.nonEmpty, "materialized distinct needs key columns")
    require(!keyCols.contains(distinctCol),
      "the distinct column cannot also be a group key")
    refreshImpl(spark, source, pairTable, keyCols :+ distinctCol, Nil,
      s"graft-mdistinct:$source:${keyCols.mkString(",")}:$distinctCol")
  }

  /** The served surface of a [[refreshDistinct]] pair table:
    * `n_distinct` counts live pairs with a non-NULL value (COUNT
    * DISTINCT semantics — NULL never counts), `n_rows` restores the
    * group's row count from the multiplicities. */
  def distinctCounts(spark: SparkSession, pairTable: String,
                     keyCols: Seq[String], distinctCol: String): DataFrame =
    ManifestLake.read(spark, pairTable)
      .groupBy(keyCols.map(col): _*)
      .agg(count(col(distinctCol)).as("n_distinct"),
        sum(col("n_rows")).as("n_rows"))

  private def refreshImpl(spark: SparkSession, source: String,
                          aggTable: String, groupCols: Seq[String],
                          sumCols: Seq[String], appId: String): Long = {
    val head = ManifestLake.currentVersion(spark, source).getOrElse(
      throw new IllegalStateException(
        s"source $source has no committed version"))
    val prior = ManifestLake.currentVersion(spark, aggTable)
      .map(v => ManifestLake.snapshot(spark, aggTable, Some(v)))
    prior.foreach { s =>
      require(s.appId.contains(appId),
        s"$aggTable was built by a different view definition " +
          s"(${s.appId.getOrElse("none")} vs $appId) — refreshing it " +
          "with this one would corrupt the view. Use a fresh table path.")
    }
    val applied = prior.flatMap(_.batchId)
    if (applied.contains(head)) return head // already current: no-op
    val deltas = aggregate(
      ManifestLake.changeFeed(spark, source, applied.getOrElse(0L), head),
      groupCols, sumCols, changeSign)
    applyDeltas(spark, aggTable, prior.isDefined, deltas, groupCols,
      sumCols, batchId = head, appId = appId)
    head
  }

  /** +1 for a row arriving, −1 for a row leaving — how a CDC row moves
    * the view's sums and counts. */
  private def changeSign: Column = when(
    col("_change_type").isin("insert", "update_postimage"), lit(1))
    .otherwise(lit(-1))

  /** Combine `deltas` into the stored view and commit it carrying
    * `(appId, batchId)` — ONE copy of the merge arithmetic shared by the
    * batch refresh and the streaming maintainer (sum/NULL semantics must
    * never drift between them). */
  private def applyDeltas(spark: SparkSession, aggTable: String,
                          hasPrior: Boolean, deltas: DataFrame,
                          keyCols: Seq[String], sumCols: Seq[String],
                          batchId: Long, appId: String): Unit = {
    val combined =
      if (!hasPrior) deltas
      else {
        val current = ManifestLake.read(spark, aggTable)
        // null-SAFE key equality: a null group key must meet itself,
        // or every refresh would duplicate that group's row
        val cond = keyCols.map(k =>
          current(k) <=> deltas(k)).reduce(_ && _)
        val joined = current.join(deltas, cond, "full_outer")
        val keys = keyCols.map(k =>
          coalesce(current(k), deltas(k)).as(k))
        val sums = sumCols.map { c =>
          val cur = current(s"${c}_sum")
          val del = deltas(s"${c}_sum")
          // SQL SUM over an all-NULL group is NULL, and it must STAY
          // NULL through refreshes that touch other groups — a blanket
          // coalesce-to-0 would drift the stored value away from what a
          // re-aggregation returns
          when(cur.isNull && del.isNull, lit(null).cast(SumType))
            .otherwise((coalesce(cur, lit(0).cast(SumType)) +
              coalesce(del, lit(0).cast(SumType))).cast(SumType))
            .as(s"${c}_sum")
        }
        val n = (coalesce(current("n_rows"), lit(0L)) +
          coalesce(deltas("n_rows"), lit(0L))).as("n_rows")
        joined.select((keys ++ sums :+ n): _*)
      }
    // emptied groups leave the view, as a re-aggregation would show
    val next = combined.filter(col("n_rows") > 0)
    // the view is O(distinct keys): overwriting it wholesale is the
    // cheap side of the refresh — the expensive side (the source) was
    // only read where it CHANGED
    ManifestLake.write(next, aggTable, append = false,
      batchId = Some(batchId), appId = Some(appId)): Unit
  }

  /** STREAMING view maintenance: the same incremental arithmetic driven
    * by the lake's change-feed SOURCE instead of a polled refresh —
    * `readStream.format("graft-lake").option("readChangeFeed", true)`
    * feeding `foreachBatch`, the production shape for a view that must
    * track an ingest continuously. Each micro-batch applies its CDC
    * rows' deltas and commits the view carrying the STREAMING batch id;
    * a crashed-and-replayed batch (foreachBatch is at-least-once) finds
    * the view already at or past its id and commits NOTHING — the
    * replay guard that, with the source's checkpointed version
    * watermark, closes the exactly-once loop end to end.
    *
    * The view's recorded identity gets a `:stream` suffix: its batchId
    * axis is streaming batch numbers, not source versions, and a batch
    * [[refresh]] of a stream-maintained view (or vice versa) would
    * misread one for the other — the definition guard turns that into
    * a named error instead.
    *
    * Runs with `Trigger.AvailableNow` by default: drain every committed
    * change, maintain the view, terminate — re-invoke on a schedule or
    * swap the trigger for continuous tailing. Scale shape per batch:
    * changed-file scans + an O(distinct keys) join, never a source
    * re-scan. */
  def stream(spark: SparkSession, source: String, aggTable: String,
             keyCols: Seq[String], sumCols: Seq[String],
             checkpointDir: String,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(keyCols.nonEmpty && sumCols.nonEmpty,
      "materialized agg needs key and sum columns")
    val appId = appIdFor(source, keyCols, sumCols) + ":stream"
    spark.readStream.format("graft-lake")
      .option("readChangeFeed", "true")
      .load(source)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyStreamBatch(batch, aggTable, keyCols, sumCols, appId, id): Unit
      }
      .start()
  }

  /** One streaming micro-batch of CDC rows into the view — factored
    * from the foreachBatch closure so the replay guard is directly
    * testable. Returns true when the batch committed (false = replay
    * skip or empty batch). */
  private[sources] def applyStreamBatch(batch: DataFrame, aggTable: String,
                                        keyCols: Seq[String],
                                        sumCols: Seq[String],
                                        appId: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val prior = ManifestLake.currentVersion(spark, aggTable)
      .map(v => ManifestLake.snapshot(spark, aggTable, Some(v)))
    prior.foreach { s =>
      require(s.appId.contains(appId),
        s"$aggTable was built by a different view definition " +
          s"(${s.appId.getOrElse("none")} vs $appId) — maintaining it " +
          "with this stream would corrupt the view. Use a fresh table path.")
    }
    // REPLAY GUARD: batch ids are monotonic; a view already at or past
    // this id has applied these change rows — commit nothing (the
    // foreachBatch retry after a sink-side crash lands here)
    if (prior.exists(_.batchId.exists(_ >= batchId))) return false
    if (batch.isEmpty) return false // no change rows: nothing to commit
    val deltas = aggregate(batch, keyCols, sumCols, changeSign)
    applyDeltas(spark, aggTable, prior.isDefined, deltas, keyCols, sumCols,
      batchId = batchId, appId = appId)
    true
  }
}
