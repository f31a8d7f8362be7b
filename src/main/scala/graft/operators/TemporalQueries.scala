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

  /** Strict-order first-touch FUNNEL over an event stream: step 1 is
    * each user's first `steps(0)` event; step i is the first
    * `steps(i)` event STRICTLY AFTER the user's step-(i−1) timestamp —
    * the product-analytics conversion query (view → click → purchase).
    * Returns one row per user who entered the funnel, with the step
    * reached and each step's timestamp (null past the drop-off).
    *
    * Scale shape: one `(user, step-type)` filtered aggregate per step
    * (each a map-side-combined min over only THAT event type's rows)
    * chained by joins on the user key — step tables shrink
    * monotonically down the funnel, and every join is on the same key
    * space (co-partitioned at scale; AQE broadcasts the deep-funnel
    * tails). No window over the full event stream — the classic
    * sessionize-then-scan formulation sorts every user's whole
    * history; this one touches each step's event type only. */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts",
             maxGapUs: Seq[Long] = Nil): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    // per-transition conversion DEADLINES ("click within 7 days of the
    // view"): maxGapUs(i) bounds the gap step i → step i+1 in
    // microseconds; ≤ 0 means unbounded. The deadline applies to the
    // candidate events themselves — the first qualifying event must
    // land INSIDE the window, not merely exist after the previous step
    require(maxGapUs.isEmpty || maxGapUs.size == steps.size - 1,
      s"maxGapUs needs one entry per transition " +
        s"(${steps.size - 1} for ${steps.size} steps), got ${maxGapUs.size}")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("step1_ts"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"step${i}_ts"
      val cur = s"step${i + 1}_ts"
      val gap = if (maxGapUs.isEmpty) 0L else maxGapUs(i - 1)
      val inWindow =
        if (gap > 0)
          col("__t") > col(prev) &&
            unix_micros(col("__t")) - unix_micros(col(prev)) <= gap
        else col("__t") > col(prev)
      val nxt = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("__t"))
        .join(acc.select(col(userCol), col(prev)), Seq(userCol))
        .filter(inWindow)
        .groupBy(col(userCol))
        .agg(min(col("__t")).as(cur))
      acc.join(nxt.select(col(userCol), col(cur)), Seq(userCol), "left")
    }.withColumn("step_reached",
      // fold ascending so the DEEPEST step is the outermost test
      steps.indices.drop(1).foldLeft(lit(1)) { (acc, i) =>
        when(col(s"step${i + 1}_ts").isNotNull, i + 1).otherwise(acc)
      })
  }

  /** fn1_funnel — the view → click → purchase conversion funnel
    * through the gate: per-step user counts plus each step's exact
    * first-touch timestamp sum (microsecond epochs as exact longs, so
    * the aggregate is associative and partition-independent), DuckDB
    * re-deriving the same strictly-ordered first-touch semantics. */
  def fn1Funnel(s: SparkSession, d: String): DataFrame = {
    // the first-36h slice leaves real drop-off at every SF (the full
    // stream is dense enough that every user eventually converts, and
    // a funnel with one populated step exercises nothing)
    funnel(Tables.events(s, d)
        .filter(col("ts") <= to_timestamp(lit("2024-01-02 12:00:00"))),
      Seq("view", "click", "purchase"))
      .groupBy(col("step_reached"))
      .agg(count(lit(1)).as("users"),
        sum(unix_micros(col("step1_ts"))).as("sum_view_us"),
        sum(unix_micros(col("step2_ts"))).as("sum_click_us"),
        sum(unix_micros(col("step3_ts"))).as("sum_purchase_us"))
      .orderBy(col("step_reached"))
  }

  val fn1Oracle: String =
    """WITH src AS (
      |  SELECT * FROM events
      |  WHERE ts <= TIMESTAMP '2024-01-02 12:00:00'),
      |v AS (
      |  SELECT user_id, min(ts) AS v_ts FROM src
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS c_ts
      |  FROM src e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.v_ts
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS p_ts
      |  FROM src e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      |  GROUP BY e.user_id),
      |f AS (
      |  SELECT v.user_id, v.v_ts, c.c_ts, p.p_ts,
      |    CASE WHEN p.p_ts IS NOT NULL THEN 3
      |         WHEN c.c_ts IS NOT NULL THEN 2
      |         ELSE 1 END AS step_reached
      |  FROM v LEFT JOIN c ON c.user_id = v.user_id
      |  LEFT JOIN p ON p.user_id = v.user_id)
      |SELECT step_reached, count(*) AS users,
      |  CAST(sum(epoch_us(v_ts)) AS BIGINT) AS sum_view_us,
      |  CAST(sum(epoch_us(c_ts)) AS BIGINT) AS sum_click_us,
      |  CAST(sum(epoch_us(p_ts)) AS BIGINT) AS sum_purchase_us
      |FROM f
      |GROUP BY step_reached
      |ORDER BY step_reached""".stripMargin

  /** fn2_funnel_deadline — the same conversion funnel with per-step
    * DEADLINES, the shape real funnels take ("click within 2 h of the
    * view, purchase within 8 h of the click"): the first qualifying
    * event must land inside the window, so late converters DROP
    * instead of counting — over the full event stream (no slice
    * needed; the deadlines themselves create drop-off at every SF).
    * Same exact epoch-sum surface as fn1, BIGINT-cast per the
    * gate-surface lint. */
  def fn2FunnelDeadline(s: SparkSession, d: String): DataFrame =
    funnel(Tables.events(s, d), Seq("view", "click", "purchase"),
        maxGapUs = Seq(2L * 3600 * 1000000, 8L * 3600 * 1000000))
      .groupBy(col("step_reached"))
      .agg(count(lit(1)).as("users"),
        sum(unix_micros(col("step1_ts"))).as("sum_view_us"),
        sum(unix_micros(col("step2_ts"))).as("sum_click_us"),
        sum(unix_micros(col("step3_ts"))).as("sum_purchase_us"))
      .orderBy(col("step_reached"))

  val fn2Oracle: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS c_ts
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.v_ts
      |    AND epoch_us(e.ts) - epoch_us(v.v_ts) <= 7200000000
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS p_ts
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      |    AND epoch_us(e.ts) - epoch_us(c.c_ts) <= 28800000000
      |  GROUP BY e.user_id),
      |f AS (
      |  SELECT v.user_id, v.v_ts, c.c_ts, p.p_ts,
      |    CASE WHEN p.p_ts IS NOT NULL THEN 3
      |         WHEN c.c_ts IS NOT NULL THEN 2
      |         ELSE 1 END AS step_reached
      |  FROM v LEFT JOIN c ON c.user_id = v.user_id
      |  LEFT JOIN p ON p.user_id = v.user_id)
      |SELECT step_reached, count(*) AS users,
      |  CAST(sum(epoch_us(v_ts)) AS BIGINT) AS sum_view_us,
      |  CAST(sum(epoch_us(c_ts)) AS BIGINT) AS sum_click_us,
      |  CAST(sum(epoch_us(p_ts)) AS BIGINT) AS sum_purchase_us
      |FROM f
      |GROUP BY step_reached
      |ORDER BY step_reached""".stripMargin

  /** ct1_cohort_retention — the cohort-retention matrix (the other
    * half of product analytics beside [[funnel]]): users cohorted by
    * the ISO week of their first SIGNUP event, then for every
    * (cohort, week-offset) the exact count of distinct users active
    * that week — pre-signup activity excluded, never-signed-up users
    * outside the matrix. Scale shape:
    * the event stream collapses to distinct (user, week) pairs
    * immediately (one map-side-combined distinct — O(users × weeks),
    * not O(events)), the cohort derivation is one min-aggregate on the
    * user key, and the matrix is one more keyed aggregate after a join
    * on that same key. */
  def ct1CohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val uw = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    // cohort = the week of the user's first SIGNUP (the acquisition
    // event); users who never sign up are outside the matrix
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort"))
    uw.join(cohorts, Seq("user_id"))
      .filter(col("wk") >= col("cohort"))
      .groupBy(col("cohort").cast("date").as("cohort_week"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val ct1Oracle: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
      |  FROM events),
      |cohorts AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id)
      |SELECT CAST(cohort AS DATE) AS cohort_week,
      |  CAST(date_diff('day', cohort, wk) / 7 AS INTEGER) AS week_offset,
      |  count(*) AS users
      |FROM uw JOIN cohorts USING (user_id)
      |WHERE wk >= cohort
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** mk1_transitions — the first-order Markov transition matrix over
    * per-user event sequences (the journey-analysis primitive beside
    * [[funnel]] and [[ct1CohortRetention]]): within each user's
    * timeline ordered by (ts, event_id) — the id tie-break makes
    * simultaneous events deterministic — count every consecutive
    * (state, next-state) pair and row-normalize to transition
    * probabilities (ONE IEEE division of exact longs, bit-identical
    * everywhere). Scale shape: one user-partitioned window pass (the
    * sort is per-user, never global), one pair-keyed aggregate of
    * O(states²) output, one broadcast-sized row-total join. */
  def mk1Transitions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("event_type"))
      .agg(sum(col("n")).as("row_total"))
    pairs.join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("next_type"), col("n"),
        (col("n").cast("double") / col("row_total")).as("p"))
      .orderBy(col("event_type"), col("next_type"))
  }

  val mk1Oracle: String =
    """WITH seq AS (
      |  SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |pairs AS (
      |  SELECT event_type, next_type, count(*) AS n
      |  FROM seq WHERE next_type IS NOT NULL
      |  GROUP BY 1, 2),
      |totals AS (
      |  SELECT event_type, sum(n) AS row_total FROM pairs GROUP BY 1)
      |SELECT p.event_type, p.next_type, p.n,
      |  CAST(p.n AS DOUBLE) / t.row_total AS p
      |FROM pairs p JOIN totals t USING (event_type)
      |ORDER BY p.event_type, p.next_type""".stripMargin

  /** GAP-BASED SESSIONIZATION — the product-analytics primitive under
    * funnels and journeys: within each user's timeline, a new session
    * opens when the gap since the previous event exceeds `gapUs`
    * microseconds; every event gets a per-user `session_idx` (1-based,
    * in time order). Classic lag-then-cumulative-sum formulation.
    *
    * Scale shape: ONE shuffle on the user key, then per-user window
    * sorts (never a global sort — each partition orders only its own
    * users' rows); output adds two narrow columns. A pathological
    * single user's whole history must fit one partition's sort, the
    * standard sessionization bound every engine shares.
    *
    * Determinism with tied timestamps: ties diff to zero, so no break
    * opens between them regardless of their internal order — the
    * session assignment (and every per-session aggregate over it) is
    * order-invariant. */
  def sessionize(events: DataFrame, gapUs: Long,
                 userCol: String = "user_id",
                 tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(gapUs > 0, "the session gap must be positive")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    events
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("__brk",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__brk")
  }

  /** sn1_sessionize — sessionization through the gate: 30-minute-gap
    * sessions over the event stream, emitted as per-session rows
    * (event count, exact microsecond duration, exact start) so every
    * surfaced value is an exact long — no epoch SUMS (the gate lint's
    * 2^53 class), durations are bounded diffs. */
  def sn1Sessionize(s: SparkSession, d: String): DataFrame =
    sessionize(Tables.events(s, d), gapUs = 1800L * 1000000L)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("duration_us"),
        min(unix_micros(col("ts"))).as("start_us"))

  val sn1Oracle: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS tu FROM events),
      |l AS (
      |  SELECT user_id, tu,
      |    CASE WHEN lag(tu) OVER (PARTITION BY user_id ORDER BY tu)
      |           IS NULL
      |         OR tu - lag(tu) OVER (PARTITION BY user_id ORDER BY tu)
      |           > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM e),
      |s AS (
      |  SELECT user_id, tu,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY tu
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM l)
      |SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
      |  count(*) AS n_events,
      |  CAST(max(tu) - min(tu) AS BIGINT) AS duration_us,
      |  CAST(min(tu) AS BIGINT) AS start_us
      |FROM s GROUP BY user_id, sid""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mk1_transitions" -> (mk1Transitions _),
    "ct1_cohort_retention" -> (ct1CohortRetention _),
    "fn1_funnel" -> (fn1Funnel _),
    "fn2_funnel_deadline" -> (fn2FunnelDeadline _),
    "sn1_sessionize" -> (sn1Sessionize _),
    "aj1_asof_join" -> (aj1AsofJoin _),
    "aj2_range_join" -> (aj2RangeJoin _),
    "aj3_asof_window" -> (aj3AsofWindow _))

  val oracles: Map[String, String] = Map(
    "mk1_transitions" -> mk1Oracle,
    "ct1_cohort_retention" -> ct1Oracle,
    "fn1_funnel" -> fn1Oracle,
    "fn2_funnel_deadline" -> fn2Oracle,
    "sn1_sessionize" -> sn1Oracle,
    "aj1_asof_join" -> aj1Oracle,
    "aj2_range_join" -> aj2Oracle,
    "aj3_asof_window" -> aj3Oracle)
}
