package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Correctness-gate entries for the temporal joins. DuckDB has a NATIVE
  * ASOF JOIN, so the composed as-of operator is checked against a real
  * independent implementation of the semantics, not a re-derivation. */
object TemporalQueries {

  private def clicks(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))

  /** Right side unique per (user, ts): duplicate-timestamp as-of is
    * ambiguous, so pre-aggregate to the max event id (both engines). */
  private def views(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_event_id"))
      .withColumn("view_ts_us", unix_micros(col("ts")))

  /** aj1 — for every click, the latest view at-or-before it per user. */
  def aj1AsofJoin(s: SparkSession, d: String): DataFrame =
    TemporalJoins.asofJoin(clicks(s, d), views(s, d), "user_id", "ts",
        Seq("view_event_id", "view_ts_us"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("__asof_view_event_id").as("view_event_id"),
        col("__asof_view_ts_us").as("view_ts_us"))

  val aj1Oracle: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events WHERE event_type = 'click'),
      |views AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    max(event_id) AS view_event_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id, c.ts_us,
      |  v.view_event_id, v.ts_us AS view_ts_us
      |FROM clicks c ASOF LEFT JOIN views v
      |  ON c.user_id = v.user_id AND c.ts_us >= v.ts_us""".stripMargin

  /** aj2 — clicks paired with every view of the same user within ±1
    * hour (bucketed interval join, never a theta cross product). */
  def aj2RangeJoin(s: SparkSession, d: String): DataFrame =
    TemporalJoins.rangeJoin(clicks(s, d), views(s, d), "user_id", "ts",
        toleranceUs = 3600L * 1000000L, Seq("view_event_id"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("__range_view_event_id").as("view_event_id"),
        unix_micros(col("__range_ts")).as("view_ts_us"))

  val aj2Oracle: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events WHERE event_type = 'click'),
      |views AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    max(event_id) AS view_event_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id, c.ts_us,
      |  v.view_event_id, v.ts_us AS view_ts_us
      |FROM clicks c JOIN views v ON c.user_id = v.user_id
      |  AND abs(c.ts_us - v.ts_us) <= 3600000000""".stripMargin

  /** aj3 — as-of output composed into window aggregates, the real usage
    * pattern (attribute each click to its view, then analyze latency per
    * user over time). Pins the `__asof_*` column-collision hygiene
    * END-TO-END: the prefixed payload columns feed running sums, counts,
    * and a lag() comparison downstream of the join. All window
    * arithmetic is integral (microsecond latencies, counts) so the
    * running values are bit-exact in both engines regardless of window
    * evaluation order. */
  def aj3AsofWindow(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val asof = TemporalJoins.asofJoin(clicks(s, d), views(s, d), "user_id",
      "ts", Seq("view_event_id", "view_ts_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    asof
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("latency_us", col("ts_us") - col("__asof_view_ts_us"))
      .withColumn("cum_latency_us", sum(col("latency_us")).over(wRun))
      .withColumn("n_attributed", count(col("latency_us")).over(wRun))
      .withColumn("repeat_view", col("__asof_view_event_id") ===
        lag(col("__asof_view_event_id"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("latency_us"), col("cum_latency_us"), col("n_attributed"),
        col("repeat_view"))
  }

  val aj3Oracle: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events WHERE event_type = 'click'),
      |views AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    max(event_id) AS view_event_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |attributed AS (
      |  SELECT c.event_id, c.user_id, c.ts_us,
      |    v.view_event_id, v.ts_us AS view_ts_us
      |  FROM clicks c ASOF LEFT JOIN views v
      |    ON c.user_id = v.user_id AND c.ts_us >= v.ts_us)
      |SELECT event_id, user_id, ts_us,
      |  ts_us - view_ts_us AS latency_us,
      |  CAST(sum(ts_us - view_ts_us) OVER w2 AS BIGINT) AS cum_latency_us,
      |  count(ts_us - view_ts_us) OVER w2 AS n_attributed,
      |  view_event_id = lag(view_event_id) OVER w AS repeat_view
      |FROM attributed
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id),
      |  w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "aj1_asof_join" -> (aj1AsofJoin _),
    "aj2_range_join" -> (aj2RangeJoin _),
    "aj3_asof_window" -> (aj3AsofWindow _))

  val oracles: Map[String, String] = Map(
    "aj1_asof_join" -> aj1Oracle,
    "aj2_range_join" -> aj2Oracle,
    "aj3_asof_window" -> aj3Oracle)
}
