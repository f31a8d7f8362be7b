package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.functions.exact._

/** Relational operator family — SURVEY.md §2.5 (R1-R4) plus the general
  * aggregate / join / union / distinct / window surface a complete engine
  * needs. Every query here is declarative DataFrame code: Catalyst handles
  * pushdown, pruning, join selection; we add explicit `broadcast()` where a
  * dimension table is known-small (region/nation/supplier never grow with
  * fact data — the same reasoning as the reference's SS⋈SI join where SI is
  * ~1.5k stations, `/root/reference/dags/lib/index_to_elastic_with_spark.py`
  * consumers at :115-123).
  */
object Relational {

  /** q1_pricing_summary — hash-aggregate workhorse (TPC-H Q1 shape).
    * Per-row arithmetic stays in doubles (deterministic), sums go through
    * [[graft.functions.exact]] so the result is partitioning-independent.
    */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        decSum($"l_quantity", 2).as("sum_qty"),
        moneySum($"l_extendedprice").as("sum_base_price"),
        decSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6)
          .as("sum_disc_price"),
        decSum($"l_extendedprice" * (lit(1.0) - $"l_discount") *
          (lit(1.0) + $"l_tax"), 6).as("sum_charge"),
        count(lit(1)).as("count_order"))
  }

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** r1_join_broadcast — equi inner join fact⋈dim⋈dim with explicit
    * broadcast of the small sides (SURVEY §2.5 R1: SS ⋈ SI on station_id).
    * nation (25 rows) and region (5 rows) are broadcast: zero shuffle of the
    * customer side, and at 100 TB the plan is a single scan + two
    * BroadcastHashJoins feeding one hash aggregate.
    */
  def r1JoinBroadcast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"),
        moneySum($"c_acctbal").as("total_acctbal"))
  }

  val r1Oracle: String =
    """SELECT r_name, n_name, count(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS total_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  /** r2_harmonize — projection/harmonization to a unified provider schema
    * (SURVEY §2.5 R2: `enriched_lime` maps free bikes to the 7-col contract
    * with literal provider, unit count 1, NULL slot count). Same shape here:
    * customers as a "provider" feed.
    */
  def r2Harmonize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d).select(
      lit("customer").as("provider"),
      $"c_custkey".cast("string").as("id"),
      $"c_name".as("name"),
      $"c_acctbal".as("balance"),
      lit(1).as("num_units"),
      lit(null).cast("int").as("num_slots"))
  }

  val r2Oracle: String =
    """SELECT 'customer' AS provider, CAST(c_custkey AS VARCHAR) AS id,
      |  c_name AS name, c_acctbal AS balance, 1 AS num_units,
      |  CAST(NULL AS INTEGER) AS num_slots
      |FROM customer""".stripMargin

  /** r3_union_all — `unionByName` of two harmonized feeds (SURVEY §2.5 R3:
    * `enriched_join_velib_lime` = velib ∪ lime on the shared schema).
    * UNION ALL is shuffle-free: partitions of both children are simply
    * concatenated, so this costs nothing extra at scale.
    */
  def r3UnionAll(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val suppliers = Tables.supplier(s, d).select(
      lit("supplier").as("provider"),
      $"s_suppkey".cast("string").as("id"),
      $"s_name".as("name"),
      $"s_acctbal".as("balance"),
      lit(1).as("num_units"),
      lit(0).as("num_slots"))
    r2Harmonize(s, d).unionByName(
      suppliers.withColumn("num_slots", $"num_slots".cast("int")))
  }

  val r3Oracle: String =
    """SELECT 'customer' AS provider, CAST(c_custkey AS VARCHAR) AS id,
      |  c_name AS name, c_acctbal AS balance, 1 AS num_units,
      |  CAST(NULL AS INTEGER) AS num_slots
      |FROM customer
      |UNION ALL
      |SELECT 'supplier', CAST(s_suppkey AS VARCHAR), s_name, s_acctbal, 1,
      |  CAST(0 AS INTEGER)
      |FROM supplier""".stripMargin

  /** r4_quality_checks — data-quality aggregations (SURVEY §2.5 R4: dbt
    * generic tests compile to violation-count queries; the pipeline gates on
    * zero violations before serving). Four check shapes: not_null, unique,
    * referential integrity (anti join), accepted range. Each is a full-scan
    * count — at 100 TB these run as map-side partial counts, no wide rows
    * ever shuffle.
    */
  def r4QualityChecks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, d)
    val customer = Tables.customer(s, d)
    val lineitem = Tables.lineitem(s, d)

    val notNull = orders.agg(
      count(when($"o_custkey".isNull, 1)).as("violations"))
      .select(lit("orders_custkey_not_null").as("check_name"), $"violations")
    val unique = customer.groupBy($"c_custkey").count()
      .filter($"count" > 1)
      .agg(count(lit(1)).as("violations"))
      .select(lit("customer_custkey_unique").as("check_name"), $"violations")
    // Referential integrity runs as a shuffled left-anti: customer is a
    // fact-scale table, so broadcasting its keyset would OOM the driver at
    // 100 TB. AQE may still pick a broadcast at small SF — that's its call.
    val refInt = orders.join(customer.select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("orders_custkey_references_customer").as("check_name"),
        $"violations")
    val range = lineitem.agg(
      count(when($"l_discount" < 0.0 || $"l_discount" > 1.0, 1))
        .as("violations"))
      .select(lit("lineitem_discount_in_range").as("check_name"), $"violations")

    notNull.unionByName(unique).unionByName(refInt).unionByName(range)
  }

  val r4Oracle: String =
    """SELECT 'orders_custkey_not_null' AS check_name,
      |  count(*) FILTER (o_custkey IS NULL) AS violations FROM orders
      |UNION ALL
      |SELECT 'customer_custkey_unique',
      |  CAST((SELECT count(*) FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) > 1)) AS BIGINT)
      |UNION ALL
      |SELECT 'orders_custkey_references_customer',
      |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
      |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |UNION ALL
      |SELECT 'lineitem_discount_in_range',
      |  (SELECT count(*) FILTER (l_discount < 0.0 OR l_discount > 1.0) FROM lineitem)""".stripMargin

  /** r5_bloom_anti_join — referential check via
    * [[graft.operators.BloomJoin]]: orders whose customer is not in the
    * high-balance subset. The bloom pre-pass means only might-contain
    * survivors shuffle for the exact anti-join; the oracle is the plain
    * NOT EXISTS — the bloom must be invisible in the result. */
  def r5BloomAntiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.operators.BloomJoin.preFilteredLeftAnti(
      Tables.orders(s, d).select($"o_orderkey", $"o_custkey"),
      Tables.customer(s, d).filter($"c_acctbal" > 5000.0),
      "o_custkey", "c_custkey", estimatedRightRows = 100000L)
  }

  val r5Oracle: String =
    """SELECT o_orderkey, o_custkey FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM customer c
      |  WHERE c.c_acctbal > 5000.0 AND c.c_custkey = o.o_custkey)""".stripMargin

  /** j1_semi_join — EXISTS as left-semi (no row multiplication, only the
    * left columns survive — cheaper than inner+distinct at scale). */
  def j1SemiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_mktsegment")
  }

  val j1Oracle: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** j2_anti_join — NOT EXISTS as left-anti. */
  def j2AntiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_mktsegment")
  }

  val j2Oracle: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** j3_outer_join — left outer fact-extension with null-producing side. */
  def j3OuterJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perCust = Tables.orders(s, d)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"),
        moneySum($"o_totalprice").as("total_spent"))
    Tables.customer(s, d)
      .join(perCust, $"c_custkey" === $"o_custkey", "left_outer")
      .select($"c_custkey", $"c_mktsegment",
        coalesce($"n_orders", lit(0L)).as("n_orders"), $"total_spent")
  }

  val j3Oracle: String =
    """SELECT c_custkey, c_mktsegment,
      |  COALESCE(n_orders, 0) AS n_orders, total_spent
      |FROM customer LEFT JOIN (
      |  SELECT o_custkey, count(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total_spent
      |  FROM orders GROUP BY o_custkey
      |) ON c_custkey = o_custkey""".stripMargin

  /** a1_distinct — DISTINCT = shuffle-dedup on the projected columns. */
  def a1Distinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d).select($"l_returnflag", $"l_linestatus").distinct()
  }

  val a1Oracle: String =
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"

  /** a2_count_distinct — exact + approximate distinct counts. HLL
    * (`approx_count_distinct`) is the 100 TB path: mergeable sketch, no
    * per-key shuffle; the exact count is the correctness anchor. The approx
    * value is engine-specific, so only exact columns face the oracle; the
    * HLL estimate is sanity-bounded in ScalaTest instead.
    */
  def a2CountDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d).groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n_orders"),
        countDistinct($"l_partkey").as("n_parts"))
  }

  val a2Oracle: String =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** a4_approx_sketches — mergeable-sketch aggregates: HLL distinct
    * counts and approximate percentiles, the 100 TB substitutes for
    * exact DISTINCT / sort-based percentiles (sketches merge map-side,
    * nothing per-key ever shuffles). The estimates themselves are
    * engine-specific, so the gate row does not expose them: it grades
    * them in-engine and emits exact counts + pass booleans, which DuckDB
    * re-derives HASH-EXACTLY (see the body comment); accuracy is also
    * bounded independently in RelationalSpec. */
  def a4ApproxSketches(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // The gate row grades the sketches in-engine instead of exposing
    // their engine-internal values: HLL++ estimates are checked against
    // exact count-distincts (≤ 2% relative error at the default rsd),
    // and each percentile_approx value is checked by the RANK it lands
    // at in a second pass (accuracy 10000 bounds rank error at 1e-4 of
    // the population). Only the exact counts and the pass/fail booleans
    // are emitted, so DuckDB re-derives the row hash-exactly and a
    // sketch-accuracy regression flips a boolean and fails the gate.
    // (A production user queries the sketch side alone — the exact
    // companions exist here as the grading harness.)
    val li = Tables.lineitem(s, d)
    // The sketch agg and the exact count-distincts run as SEPARATE
    // aggregations: count-distinct plans an Expand (3× rows), and mixing
    // it with the object-hash percentile buffers in one agg forces a
    // sort-based aggregate over the expanded rows — measured 80× slower
    // than the two clean plans crossJoined (both are 1-row frames).
    val sk = li.agg(
      // rsd 0.01: the default 0.05 sketch is too coarse to promise the
      // 2% gate bound; at 1% relative standard deviation the bound is
      // ~2σ and, the data being fixed, the estimate is deterministic —
      // the gate can't flake, only regress
      approx_count_distinct($"l_orderkey", 0.01).as("a_ord"),
      approx_count_distinct($"l_partkey", 0.01).as("a_part"),
      expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("p50"),
      expr("percentile_approx(l_extendedprice, 0.95, 10000)").as("p95"))
    val ex = li.agg(
      countDistinct($"l_orderkey").as("exact_orders"),
      countDistinct($"l_partkey").as("exact_parts"))
    li.crossJoin(broadcast(sk)).crossJoin(broadcast(ex))
      .agg(
        first($"exact_orders").as("exact_orders"),
        first($"exact_parts").as("exact_parts"),
        (abs(first($"a_ord") - first($"exact_orders")) <=
          first($"exact_orders") * 0.02).as("hll_orders_ok"),
        (abs(first($"a_part") - first($"exact_parts")) <=
          first($"exact_parts") * 0.02).as("hll_parts_ok"),
        (count(when($"l_extendedprice" <= $"p50", 1))
          .cast("double") / count(lit(1)))
          .between(0.49, 0.51).as("p50_rank_ok"),
        (count(when($"l_extendedprice" <= $"p95", 1))
          .cast("double") / count(lit(1)))
          .between(0.94, 0.96).as("p95_rank_ok"))
  }

  val a4Oracle: String =
    """SELECT count(DISTINCT l_orderkey) AS exact_orders,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS hll_orders_ok, TRUE AS hll_parts_ok,
      |  TRUE AS p50_rank_ok, TRUE AS p95_rank_ok
      |FROM lineitem""".stripMargin

  /** g1_rollup — hierarchical totals in one pass (GROUPING SETS family). */
  def g1Rollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), decSum($"l_quantity", 2).as("sum_qty"))
  }

  val g1Oracle: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** g2_cube — full cross-tabulation totals. */
  def g2Cube(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"))
  }

  val g2Oracle: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** o1_topk — global top-k: Spark's `orderBy.limit` plans a TakeOrdered
    * (per-partition heap + driver merge of k rows), never a full sort of
    * 100 TB. Tie-broken on the unique key for determinism.
    */
  def o1TopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .limit(10)
  }

  val o1Oracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** q3_shipping_priority — TPC-H Q3 shape: selective dimension filter,
    * two fact joins, aggregate, top-k. The plan to want at 100 TB: both
    * filters reach their scans as PushedFilters, the join keys shuffle
    * once each, TakeOrdered caps the output. */
  def q3ShippingPriority(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cutoff = to_timestamp(lit("1998-03-15 00:00:00"))
    val c = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
    val o = Tables.orders(s, d)
      .filter($"o_orderdate".cast("timestamp") < cutoff)
    val l = Tables.lineitem(s, d)
      .filter($"l_shipdate".cast("timestamp") > cutoff)
    c.join(o, $"c_custkey" === $"o_custkey")
      .join(l, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey",
        unix_micros($"o_orderdate".cast("timestamp")).as("odate_us"),
        $"o_orderpriority")
      .agg(decSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6)
        .as("revenue"))
      .orderBy($"revenue".desc, $"odate_us".asc, $"l_orderkey".asc)
      .limit(10)
  }

  val q3Oracle: String =
    """SELECT l_orderkey, epoch_us(o_orderdate) AS odate_us, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(27,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, odate_us, l_orderkey LIMIT 10""".stripMargin

  /** q5_local_supplier — TPC-H Q5 shape: six-table join where only
    * customer/orders/lineitem are fact-scale; nation and region are
    * broadcast so the plan has exactly two shuffle joins. */
  def q5LocalSupplier(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
      .filter($"o_orderdate".cast("timestamp") >=
        to_timestamp(lit("1996-01-01 00:00:00")) &&
        $"o_orderdate".cast("timestamp") <
          to_timestamp(lit("1997-01-01 00:00:00")))
    Tables.customer(s, d)
      .join(o, $"c_custkey" === $"o_custkey")
      .join(Tables.lineitem(s, d), $"l_orderkey" === $"o_orderkey")
      .join(Tables.supplier(s, d),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(decSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6)
        .as("revenue"))
      .orderBy($"revenue".desc)
  }

  val q5Oracle: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(27,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC""".stripMargin

  /** q14_promo_share — TPC-H Q14 shape: fact⋈dim join feeding a
    * conditional-aggregate ratio, then two map-side partial sums. Also
    * exercises the string-predicate family (LIKE prefix match on p_name).
    *
    * No broadcast hint on part, deliberately: unlike nation/region (fixed
    * 25/5 rows), part GROWS with scale factor — 20 k rows at sf0.1,
    * billions at the 100 TB target — and a forced hint overrides Spark's
    * size threshold, turning into a driver/executor OOM at scale. Left
    * unhinted, AQE broadcasts it at small SF (PLANS.md pins the BHJ) and
    * falls back to a shuffled hash join once part outgrows
    * autoBroadcastJoinThreshold — the correct plan at both ends. */
  def q14PromoShare(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val revenue = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), $"l_partkey" === $"p_partkey")
      .agg(
        (lit(100.0) *
          decSum(when($"p_type" === "PROMO", revenue).otherwise(0.0), 6) /
          decSum(revenue, 6)).as("promo_share_pct"),
        decSum(when($"p_name".like("red%"), revenue).otherwise(0.0), 6)
          .as("red_prefix_revenue"))
  }

  val q14Oracle: String =
    """SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
      |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
      |    AS DECIMAL(27,6))) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(27,6))) AS DOUBLE) AS promo_share_pct,
      |  CAST(SUM(CAST(CASE WHEN p_name LIKE 'red%'
      |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
      |    AS DECIMAL(27,6))) AS DOUBLE) AS red_prefix_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  /** q17_small_qty_revenue — TPC-H Q17 shape: a correlated SCALAR
    * subquery (per-part average quantity) gating a fact-table filter —
    * the one mainstream relational shape the surface lacked. Written as
    * SQL because the correlated form itself is what's being covered;
    * Catalyst's RewriteCorrelatedScalarSubquery decorrelates it into ONE
    * aggregate over lineitem grouped by l_partkey joined back on the
    * key — never a per-row re-execution — so the plan is two lineitem
    * scans (filter + per-key avg), a broadcast of the filtered part
    * dimension, and a single-row final aggregate (PLANS.md pins this).
    * The revenue sum goes through an exact decimal so the result is
    * partitioning-independent; the per-part avg is exact in doubles
    * (integral quantities, bounded count). */
  def q17SmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("q17_lineitem")
    Tables.part(s, d).createOrReplaceTempView("q17_part")
    s.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2)))
        |    AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_small_qty
        |FROM q17_lineitem, q17_part
        |WHERE p_partkey = l_partkey
        |  AND p_brand = 'Brand#1'
        |  AND p_size < 15
        |  AND l_quantity < (
        |    SELECT 0.5 * avg(l2.l_quantity)
        |    FROM q17_lineitem l2
        |    WHERE l2.l_partkey = q17_part.p_partkey)""".stripMargin)
  }

  val q17Oracle: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2)))
      |    AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_small_qty
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND p_brand = 'Brand#1'
      |  AND p_size < 15
      |  AND l_quantity < (
      |    SELECT 0.5 * avg(l2.l_quantity)
      |    FROM lineitem l2
      |    WHERE l2.l_partkey = part.p_partkey)""".stripMargin

  /** q4_order_priority — TPC-H Q4 shape: a correlated EXISTS predicate
    * gating an aggregate, through the SQL surface. Catalyst's
    * RewritePredicateSubquery decorrelates the EXISTS into a LEFT SEMI
    * join on the correlation key — one lineitem scan, never a per-row
    * probe (PLANS.md pins the semi join). The orders-side date filter
    * stays pushed to the parquet scan. */
  def q4OrderPriority(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("q4_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("q4_lineitem")
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM q4_orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM q4_lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val q4Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q22_idle_customers — TPC-H Q22 shape: NOT EXISTS anti-join plus an
    * uncorrelated scalar-subquery threshold, through the SQL surface
    * (\"high-balance customers with no large order\" — the extra
    * o_totalprice predicate keeps the anti side selective so the gate
    * row is non-empty at every SF). The NOT EXISTS decorrelates to a
    * LEFT ANTI join; the threshold
    * subquery runs once and broadcasts. The threshold itself is
    * `exact-decimal-sum / count` rather than `avg(double)`: a double
    * avg accumulates in partition order, so its last ulp is
    * partitioning-dependent and a boundary row could flip between
    * engines — sum-as-decimal is associative-exact, the cast and the
    * single IEEE division are then bit-identical everywhere. */
  def q22IdleCustomers(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("q22_customer")
    Tables.orders(s, d).createOrReplaceTempView("q22_orders")
    s.sql(
      """SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM q22_customer c
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(*)
        |    FROM q22_customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM q22_orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_totalprice > 300000.0)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  val q22Oracle: String =
    """SELECT c_mktsegment, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |    AS totacctbal
      |FROM customer c
      |WHERE c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |      / COUNT(*)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_totalprice > 300000.0)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** q7_volume_shipping — TPC-H Q7 shape: the bidirectional two-nation
    * trade query. The nation dimension appears TWICE (supplier side and
    * customer side); both copies are pre-filtered to the two nations of
    * interest and broadcast, so the fact-side plan is the usual
    * supplier⋈lineitem⋈orders⋈customer chain — three key shuffles at
    * most, zero extra shuffle for either nation hop — with the
    * asymmetric pair predicate applied after both hops. The shipdate
    * range reaches the lineitem scan as a PushedFilter. */
  def q7VolumeShipping(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nations = Seq("NATION_1", "NATION_2")
    val n1 = broadcast(Tables.nation(s, d)
      .filter($"n_name".isin(nations: _*))
      .select($"n_nationkey".as("supp_nkey"), $"n_name".as("supp_nation")))
    val n2 = broadcast(Tables.nation(s, d)
      .filter($"n_name".isin(nations: _*))
      .select($"n_nationkey".as("cust_nkey"), $"n_name".as("cust_nation")))
    val l = Tables.lineitem(s, d)
      .filter($"l_shipdate".cast("timestamp") >=
        to_timestamp(lit("1996-01-01 00:00:00")) &&
        $"l_shipdate".cast("timestamp") <
          to_timestamp(lit("1998-01-01 00:00:00")))
    Tables.supplier(s, d)
      .join(l, $"s_suppkey" === $"l_suppkey")
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .join(n1, $"s_nationkey" === $"supp_nkey")
      .join(n2, $"c_nationkey" === $"cust_nkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate".cast("timestamp")).cast("long").as("l_year"))
      .agg(decSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6)
        .as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  val q7Oracle: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(27,6))) AS DOUBLE) AS revenue
      |FROM supplier
      |JOIN lineitem ON s_suppkey = l_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      |  AND n2.n_name IN ('NATION_1', 'NATION_2')
      |  AND n1.n_name <> n2.n_name
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** q8_market_share — TPC-H Q8 shape: one nation's share of a region's
    * import revenue for one part type, by year — a conditional-aggregate
    * RATIO over a seven-table join. part is filtered on type then joined
    * unhinted (same reasoning as q14: it grows with SF, AQE broadcasts
    * it while small); nation×2 and region are fixed-size broadcasts. The
    * share numerator keys on the SUPPLIER's nation while the region
    * filter keys on the CUSTOMER's — the two-sided nation pattern again,
    * but asymmetrically consumed. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val n2 = broadcast(Tables.nation(s, d)
      .select($"n_nationkey".as("cust_nkey"), $"n_regionkey"))
    val r = broadcast(Tables.region(s, d).filter($"r_name" === "ASIA"))
    val p = Tables.part(s, d).filter($"p_type" === "PROMO")
    val o = Tables.orders(s, d)
      .filter($"o_orderdate".cast("timestamp") >=
        to_timestamp(lit("1996-01-01 00:00:00")) &&
        $"o_orderdate".cast("timestamp") <
          to_timestamp(lit("1998-01-01 00:00:00")))
    val rev = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    Tables.lineitem(s, d)
      .join(p, $"l_partkey" === $"p_partkey")
      .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .join(n2, $"c_nationkey" === $"cust_nkey")
      .join(r, $"n_regionkey" === $"r_regionkey")
      .groupBy(year($"o_orderdate".cast("timestamp")).cast("long")
        .as("o_year"))
      .agg((decSum(when($"s_nationkey" === 3, rev).otherwise(0.0), 6) /
        decSum(rev, 6)).as("mkt_share"))
      .orderBy($"o_year")
  }

  val q8Oracle: String =
    """SELECT year(o_orderdate) AS o_year,
      |  CAST(SUM(CAST(CASE WHEN s_nationkey = 3
      |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
      |    AS DECIMAL(27,6))) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(27,6))) AS DOUBLE) AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1 ORDER BY o_year""".stripMargin

  /** q10_returned_items — TPC-H Q10 shape: per-customer revenue lost to
    * returns in one quarter, top 20. The quarter filter lands on the
    * orders scan and the returnflag filter on the lineitem scan before
    * either join; the aggregation keys on customer attributes, so the
    * join order is facts-first and the grouped output is
    * customer-sized. TakeOrdered caps the driver at 20 rows. */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
      .filter($"o_orderdate".cast("timestamp") >=
        to_timestamp(lit("1996-01-01 00:00:00")) &&
        $"o_orderdate".cast("timestamp") <
          to_timestamp(lit("1996-04-01 00:00:00")))
    val l = Tables.lineitem(s, d).filter($"l_returnflag" === "R")
    Tables.customer(s, d)
      .join(o, $"c_custkey" === $"o_custkey")
      .join(l, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name", $"c_acctbal")
      .agg(decSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6)
        .as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey".asc)
      .limit(20)
  }

  val q10Oracle: String =
    """SELECT c_custkey, c_name, n_name, c_acctbal,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(27,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** q13_order_distribution — TPC-H Q13 shape: the customer
    * order-count DISTRIBUTION, the one double-aggregate-over-outer-join
    * form in the suite. The LEFT join keeps zero-order customers (their
    * `count(o_orderkey)` is 0 — count of a null column, not count(*)),
    * the first aggregate collapses to one row per customer, the second
    * histograms those counts. Scale shape: one join shuffle on the
    * customer key, then an aggregate whose input is O(customers) and
    * output O(distinct counts) — the histogram step is near-free. */
  def q13OrderDistribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d).select($"c_custkey")
      .join(Tables.orders(s, d).select($"o_custkey", $"o_orderkey"),
        $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  val q13Oracle: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count""".stripMargin

  /** q12_priority_by_status — TPC-H Q12 shape: the CASE-conditional
    * double count over a fact⋈fact join (the driver testdata carries no
    * `l_shipmode`/commit/receipt columns, so the grouping rides
    * `l_linestatus` and the date window rides `l_shipdate`; the PLAN
    * shape — Q12's point — is unchanged). Scale shape: the year
    * predicate reaches the lineitem scan as a PushedFilter, both CASE
    * counts fold into ONE partial aggregate map-side (`count(CASE)` not
    * `sum(CASE)`, so both engines agree the surface is a plain BIGINT),
    * and the single join shuffle carries only (orderkey, linestatus) vs
    * (orderkey, priority) — two narrow columns each side. */
  def q12PriorityByStatus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val highs = Seq("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        $"l_shipdate" < to_timestamp(lit("1997-01-01 00:00:00")))
      .select($"l_orderkey", $"l_linestatus")
      .join(Tables.orders(s, d).select($"o_orderkey", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_linestatus")
      .agg(
        count(when($"o_orderpriority".isin(highs: _*), 1))
          .as("high_line_count"),
        count(when(!$"o_orderpriority".isin(highs: _*), 1))
          .as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  val q12Oracle: String =
    """SELECT l_linestatus,
      |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |             THEN 1 END) AS high_line_count,
      |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |             THEN 1 END) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** q21_waiting_suppliers — TPC-H Q21 shape: the doubly-correlated
    * EXISTS / NOT EXISTS form (\"the supplier who was the ONLY late one
    * on a multi-supplier order\"), the hardest decorrelation in the
    * suite — and the NOT EXISTS side carries its own join, so Catalyst
    * must decorrelate a subquery that is not a bare filter. \"Late\"
    * is `l_shipdate > o_orderdate + 75 days` (the testdata has no
    * commit/receipt dates; the correlation structure — Q21's point — is
    * identical). RewritePredicateSubquery turns both predicates into
    * LEFT SEMI / LEFT ANTI joins on `l_orderkey`; all three lineitem
    * scans reduce to (orderkey, suppkey[, shipdate]) before any
    * shuffle, and the supplier dimension broadcasts. The numwait-DESC
    * ordering tie-breaks on s_name so the row set is deterministic. */
  def q21WaitingSuppliers(s: SparkSession, d: String): DataFrame = {
    Tables.supplier(s, d).createOrReplaceTempView("q21_supplier")
    Tables.lineitem(s, d).createOrReplaceTempView("q21_lineitem")
    Tables.orders(s, d).createOrReplaceTempView("q21_orders")
    // One lineitem pass instead of three: the EXISTS/NOT EXISTS
    // subqueries only ask per-order questions — "does another supplier
    // appear in this order" and "is another supplier late in this
    // order" (the subquery's o3 is provably the same order as o, so
    // its orders join re-derives o_orderdate it already had). Both
    // collapse to window aggregates over ONE l_orderkey-keyed shuffle:
    // EXISTS ⟺ countDistinct(supp) ≥ 2, NOT EXISTS ⟺ the late-supplier
    // set is exactly {l1.supp} ⟺ countDistinct(late supp) = 1 given l1
    // is late. At scale that is 1 lineitem scan + 1 exchange where the
    // correlated form paid 3 scans + a semi- and an anti-join shuffle
    // (guide §2.4). Verified row-identical to the correlated form at
    // sf0.1 and against the unchanged oracle.
    // o_orderstatus is constant per l_orderkey (the window partition
    // key), so filtering to 'F' BELOW the window removes whole
    // partitions without changing any surviving row's n_supp /
    // n_late_supp — ~half of TPC-H orders never reach the exchange,
    // sort, or collect_set buffers.
    s.sql(
      """WITH l AS (
        |  SELECT l1.l_suppkey, l1.l_orderkey,
        |    l1.l_shipdate > o.o_orderdate + INTERVAL '75' DAY AS late
        |  FROM q21_lineitem l1
        |  JOIN q21_orders o ON o.o_orderkey = l1.l_orderkey
        |  WHERE o.o_orderstatus = 'F'),
        |m AS (
        |  SELECT l_suppkey, late,
        |    size(collect_set(l_suppkey)
        |      OVER (PARTITION BY l_orderkey)) AS n_supp,
        |    size(collect_set(CASE WHEN late THEN l_suppkey END)
        |      OVER (PARTITION BY l_orderkey)) AS n_late_supp
        |  FROM l)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM m JOIN q21_supplier s ON s.s_suppkey = m.l_suppkey
        |WHERE m.late AND m.n_supp >= 2 AND m.n_late_supp = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin)
  }

  val q21Oracle: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderstatus = 'F'
      |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1
      |    FROM lineitem l3
      |    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 75 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  /** q18_large_orders — TPC-H Q18 shape: the IN-over-grouped-HAVING
    * subquery, through the SQL surface (the one predicate-subquery form
    * q4/q22 don't cover: the subquery is itself an aggregate).
    * RewritePredicateSubquery turns the IN into a LEFT SEMI join against
    * the having-filtered aggregate — lineitem is scanned twice (once
    * aggregated for the filter, once for the outer sum) but the filter
    * aggregate reduces to one row per qualifying order BEFORE the semi
    * join, so nothing resembling a per-row probe survives. Quantities
    * are integral doubles, so their sums are exact in both engines. */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("q18_customer")
    Tables.orders(s, d).createOrReplaceTempView("q18_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("q18_lineitem")
    s.sql(
      """SELECT c_custkey, c_name, o_orderkey,
        |  unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS odate_us,
        |  o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE)
        |    AS total_qty
        |FROM q18_customer
        |JOIN q18_orders ON c_custkey = o_custkey
        |JOIN q18_lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |    SELECT l_orderkey FROM q18_lineitem
        |    GROUP BY l_orderkey HAVING SUM(l_quantity) > 250.0)
        |GROUP BY c_custkey, c_name, o_orderkey, odate_us, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin)
  }

  val q18Oracle: String =
    """SELECT c_custkey, c_name, o_orderkey,
      |  epoch_us(o_orderdate) AS odate_us, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE)
      |    AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem
      |    GROUP BY l_orderkey HAVING SUM(l_quantity) > 250.0)
      |GROUP BY c_custkey, c_name, o_orderkey, odate_us, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** q6_forecast_revenue — TPC-H Q6 shape: the pure scan-filter-agg
    * query. Its whole point at 100 TB is that every predicate reaches
    * the parquet scan as a PushedFilter (shipdate year, discount band,
    * quantity cap) and the plan is one codegen stage with a map-side
    * partial sum — any shuffle or unpushed filter here is a bug. The
    * discount literals compare against the same stored doubles in both
    * engines, so the band edges cannot diverge. */
  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate".cast("timestamp") >=
        to_timestamp(lit("1996-01-01 00:00:00")) &&
        $"l_shipdate".cast("timestamp") <
          to_timestamp(lit("1997-01-01 00:00:00")) &&
        $"l_discount" >= 0.04 && $"l_discount" <= 0.06 &&
        $"l_quantity" < 24.0)
      .agg(decSum($"l_extendedprice" * $"l_discount", 6).as("revenue"))
  }

  val q6Oracle: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount
      |    AS DECIMAL(27,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.04 AND 0.06
      |  AND l_quantity < 24.0""".stripMargin

  /** q15_top_supplier — TPC-H Q15 shape: a derived revenue view consumed
    * twice (join input + uncorrelated scalar MAX threshold), through the
    * SQL surface. The revenue sums are exact decimals, so `= (SELECT
    * max…)` cannot miss by an ulp between engines. Catalyst evaluates
    * the scalar subquery once and reuses the view's aggregate via
    * exchange reuse — never per-row. */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    Tables.supplier(s, d).createOrReplaceTempView("q15_supplier")
    Tables.lineitem(s, d).createOrReplaceTempView("q15_lineitem")
    s.sql(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(27,6))) AS DOUBLE) AS total_revenue
        |  FROM q15_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM q15_supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin)
  }

  val q15Oracle: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |      AS DECIMAL(27,6))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** q19_disjunctive_join — TPC-H Q19 shape: an OR-of-ANDs predicate
    * spanning both join sides. The optimizer's job here is extracting
    * the per-side disjunctions (l_quantity ∈ [1,11]∪[10,20]∪[20,30]
    * for lineitem, brand/size bands for part) and pushing them below
    * the join so neither side scans rows no branch can accept — at
    * 100 TB the difference between scanning three quantity bands and
    * scanning the table. part joins unhinted, as in q14/q8. */
  def q19DisjunctiveJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val branch1 = $"p_brand" === "Brand#1" &&
      $"p_size".between(1, 10) && $"l_quantity".between(1.0, 11.0)
    val branch2 = $"p_brand" === "Brand#2" &&
      $"p_size".between(1, 20) && $"l_quantity".between(10.0, 20.0)
    val branch3 = $"p_brand" === "Brand#3" &&
      $"p_size".between(1, 30) && $"l_quantity".between(20.0, 30.0)
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), $"l_partkey" === $"p_partkey")
      .filter(branch1 || branch2 || branch3)
      .agg(decSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6)
        .as("revenue"))
  }

  val q19Oracle: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(27,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 1.0 AND 11.0)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
      |       AND l_quantity BETWEEN 10.0 AND 20.0)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
      |       AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin

  /** g3_pivot — cross-tabulation via `groupBy().pivot()` with explicit
    * pivot values (explicit values skip the extra distinct-scan job and
    * keep the plan a single hash aggregate). */
  def g3Pivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(decSum($"l_quantity", 2))
  }

  val g3Oracle: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_linestatus = 'F'
      |    THEN CAST(l_quantity AS DECIMAL(27,2)) END) AS DOUBLE) AS F,
      |  CAST(SUM(CASE WHEN l_linestatus = 'O'
      |    THEN CAST(l_quantity AS DECIMAL(27,2)) END) AS DOUBLE) AS O
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** a3_grouped_topk — per-group top-k through the typed
    * [[graft.functions.TopKByValue]] Aggregator: k-bounded buffers
    * combine map-side, so only k rows per group cross the shuffle
    * (vs. a window row_number sorting every group row). Oracle is the
    * row_number formulation — results must be identical. */
  def a3GroupedTopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.{TopKByValue, UserEvent}
    Tables.events(s, d)
      .select($"user_id", $"event_id", $"value").as[UserEvent]
      .groupByKey(_.user_id)
      .agg(new TopKByValue(3).toColumn)
      .flatMap { case (userId, buf) =>
        buf.items.zipWithIndex.map { case (e, i) =>
          (userId, i + 1, e.event_id, e.value)
        }
      }
      .toDF("user_id", "rn", "event_id", "value")
  }

  val a3Oracle: String =
    """SELECT user_id, rn, event_id, value FROM (
      |  SELECT user_id, event_id, value,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |      ORDER BY value DESC, event_id) AS INTEGER) AS rn
      |  FROM events) WHERE rn <= 3""".stripMargin

  /** g4_unpivot — wide→long reshaping (`unpivot`/MELT, the inverse of
    * g3): per-row fan-out is a narrow Expand, no shuffle. */
  def g4Unpivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .select($"c_custkey", $"c_acctbal".cast("double").as("acctbal"),
        $"c_nationkey".cast("double").as("nationkey"))
      .unpivot(Array($"c_custkey"), Array($"acctbal", $"nationkey"),
        "metric", "value")
  }

  val g4Oracle: String =
    """SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS value
      |FROM customer
      |UNION ALL
      |SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
      |FROM customer""".stripMargin

  /** f14_date_arith — the date/interval scalar family the bike surface
    * never needed (computed driver-side in the reference): truncation,
    * field extraction, day difference, month shift. */
  def f14DateArith(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d).select(
      $"event_id",
      unix_micros(date_trunc("day", $"ts")).as("day_start_us"),
      dayofweek($"ts").as("dow"),
      hour($"ts").as("hr"),
      datediff($"ts", to_timestamp(lit("2024-01-01 00:00:00")))
        .as("days_since_epoch_start"),
      unix_micros(expr("ts + INTERVAL 1 MONTH")).as("next_month_us"))
  }

  val f14Oracle: String =
    """SELECT event_id,
      |  epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS day_start_us,
      |  CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS INTEGER) AS dow,
      |  CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hr,
      |  CAST(date_diff('day', DATE '2024-01-01',
      |    CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS INTEGER)
      |    AS days_since_epoch_start,
      |  epoch_us(CAST(ts AS TIMESTAMP) + INTERVAL 1 MONTH) AS next_month_us
      |FROM events""".stripMargin

  /** w1_window_rank — per-group top-n via row_number + running total.
    * The running sum uses an exact decimal frame sum so the result does not
    * depend on how the window operator associates additions.
    */
  def w1WindowRank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_spend",
        sum($"o_totalprice".cast(DecimalType(27, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .filter($"rn" <= 3)
      // o_orderdate reads as TIMESTAMP_NTZ; unix_micros needs TimestampType.
      // Session TZ is pinned UTC, so the NTZ→LTZ cast is lossless.
      .select($"o_custkey", $"o_orderkey",
        unix_micros($"o_orderdate".cast("timestamp")).as("odate_us"),
        $"rn", $"running_spend")
  }

  val w1Oracle: String =
    """SELECT o_custkey, o_orderkey, odate_us, rn, running_spend FROM (
      |  SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS odate_us,
      |    CAST(row_number() OVER w AS INT) AS rn,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2)))
      |      OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |      AS running_spend
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |) WHERE rn <= 3""".stripMargin

  /** w2_lag_lead — analytic offset functions over an ordered partition. */
  def w2LagLead(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(s, d)
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .withColumn("gap_us", unix_micros($"ts") -
        unix_micros(lag($"ts", 1).over(w)))
      .select($"event_id", $"user_id", $"event_type", $"prev_type", $"gap_us")
  }

  val w2Oracle: String =
    """SELECT event_id, user_id, event_type,
      |  lag(event_type, 1) OVER w AS prev_type,
      |  epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  /** o2_salted_join — deliberate skew-salted equi-join
    * ([[graft.operators.SkewJoin]]): lineitem (fact, potentially hot
    * orderkeys) ⋈ orders, salted 8 ways, then aggregated. The oracle is
    * the PLAIN join — salting must be invisible in the result. */
  def o2SaltedJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .select($"l_orderkey".as("orderkey"), $"l_quantity")
    val ord = Tables.orders(s, d)
      .select($"o_orderkey".as("orderkey"), $"o_orderpriority")
    graft.operators.SkewJoin.saltedInnerJoin(li, ord, "orderkey", 8)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"), decSum($"l_quantity", 2).as("sum_qty"))
  }

  val o2Oracle: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** i1_intersect — set intersection (distinct semantics). */
  def i1Intersect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d).select($"o_custkey".as("custkey")).intersect(
      Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey".as("custkey")))
  }

  val i1Oracle: String =
    """SELECT o_custkey AS custkey FROM orders
      |INTERSECT
      |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin

  /** i2_except — set difference (distinct semantics). */
  def i2Except(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d).select($"c_custkey".as("custkey")).except(
      Tables.orders(s, d).select($"o_custkey".as("custkey")))
  }

  val i2Oracle: String =
    """SELECT c_custkey AS custkey FROM customer
      |EXCEPT
      |SELECT o_custkey FROM orders""".stripMargin

  /** g5_grouping_sets — arbitrary GROUPING SETS (the general form g1's
    * rollup and g2's cube specialize): two unrelated dimension pairs
    * plus the grand total in ONE aggregate pass (a single Expand, not
    * three scans unioned), with `grouping_id` disambiguating which set
    * produced each row — the only way to tell a real NULL group from a
    * superaggregate NULL. */
  def g5GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("g5_orders")
    s.sql(
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(grouping_id(o_orderpriority, o_orderstatus) AS BIGINT)
        |    AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
        |    AS total
        |FROM g5_orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        |  (o_orderpriority), (o_orderstatus), ())""".stripMargin)
  }

  val g5Oracle: String =
    """SELECT o_orderpriority, o_orderstatus,
      |  CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
      |    AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
      |    AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
      |  (o_orderpriority), (o_orderstatus), ())""".stripMargin

  /** i3_bag_setops — INTERSECT ALL / EXCEPT ALL (bag semantics: each
    * row survives min/difference of its multiplicities, unlike i1/i2's
    * set forms which collapse to distinct). Driven over order-priority
    * multisets from two date ranges so multiplicities genuinely differ;
    * the two results are union-tagged into one gate row. */
  def i3BagSetops(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def prios(lo: String, hi: String) = Tables.orders(s, d)
      .filter($"o_orderdate".cast("timestamp") >=
        to_timestamp(lit(lo)) &&
        $"o_orderdate".cast("timestamp") < to_timestamp(lit(hi)))
      .select($"o_orderpriority".as("prio"), $"o_orderstatus".as("status"))
    val a = prios("1996-01-01 00:00:00", "1996-02-01 00:00:00")
    val b = prios("1996-02-01 00:00:00", "1996-03-01 00:00:00")
    a.intersectAll(b).groupBy($"prio", $"status")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      .unionByName(
        a.exceptAll(b).groupBy($"prio", $"status")
          .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all")))
  }

  val i3Oracle: String =
    """WITH a AS (
      |  SELECT o_orderpriority AS prio, o_orderstatus AS status
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1996-02-01 00:00:00'),
      |b AS (
      |  SELECT o_orderpriority AS prio, o_orderstatus AS status
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-02-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1996-03-01 00:00:00')
      |SELECT prio, status, count(*) AS n, 'intersect_all' AS op
      |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
      |GROUP BY 1, 2
      |UNION ALL
      |SELECT prio, status, count(*) AS n, 'except_all' AS op
      |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
      |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g5_grouping_sets" -> (g5GroupingSets _),
    "i3_bag_setops" -> (i3BagSetops _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q14_promo_share" -> (q14PromoShare _),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q22_idle_customers" -> (q22IdleCustomers _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q8_market_share" -> (q8MarketShare _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q12_priority_by_status" -> (q12PriorityByStatus _),
    "q13_order_distribution" -> (q13OrderDistribution _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q21_waiting_suppliers" -> (q21WaitingSuppliers _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q19_disjunctive_join" -> (q19DisjunctiveJoin _),
    "r1_join_broadcast" -> (r1JoinBroadcast _),
    "r2_harmonize" -> (r2Harmonize _),
    "r3_union_all" -> (r3UnionAll _),
    "r4_quality_checks" -> (r4QualityChecks _),
    "r5_bloom_anti_join" -> (r5BloomAntiJoin _),
    "j1_semi_join" -> (j1SemiJoin _),
    "j2_anti_join" -> (j2AntiJoin _),
    "j3_outer_join" -> (j3OuterJoin _),
    "a1_distinct" -> (a1Distinct _),
    "a2_count_distinct" -> (a2CountDistinct _),
    "g1_rollup" -> (g1Rollup _),
    "g2_cube" -> (g2Cube _),
    "g3_pivot" -> (g3Pivot _),
    "a3_grouped_topk" -> (a3GroupedTopK _),
    "a4_approx_sketches" -> (a4ApproxSketches _),
    "g4_unpivot" -> (g4Unpivot _),
    "f14_date_arith" -> (f14DateArith _),
    "o1_topk" -> (o1TopK _),
    "o2_salted_join" -> (o2SaltedJoin _),
    "w1_window_rank" -> (w1WindowRank _),
    "w2_lag_lead" -> (w2LagLead _),
    "i1_intersect" -> (i1Intersect _),
    "i2_except" -> (i2Except _))

  val oracles: Map[String, String] = Map(
    "g5_grouping_sets" -> g5Oracle,
    "i3_bag_setops" -> i3Oracle,
    "q1_pricing_summary" -> q1Oracle,
    "q3_shipping_priority" -> q3Oracle,
    "q5_local_supplier" -> q5Oracle,
    "q14_promo_share" -> q14Oracle,
    "q17_small_qty_revenue" -> q17Oracle,
    "q4_order_priority" -> q4Oracle,
    "q22_idle_customers" -> q22Oracle,
    "q7_volume_shipping" -> q7Oracle,
    "q8_market_share" -> q8Oracle,
    "q10_returned_items" -> q10Oracle,
    "q12_priority_by_status" -> q12Oracle,
    "q13_order_distribution" -> q13Oracle,
    "q18_large_orders" -> q18Oracle,
    "q21_waiting_suppliers" -> q21Oracle,
    "q6_forecast_revenue" -> q6Oracle,
    "q15_top_supplier" -> q15Oracle,
    "q19_disjunctive_join" -> q19Oracle,
    "r1_join_broadcast" -> r1Oracle,
    "r2_harmonize" -> r2Oracle,
    "r3_union_all" -> r3Oracle,
    "r4_quality_checks" -> r4Oracle,
    "r5_bloom_anti_join" -> r5Oracle,
    "j1_semi_join" -> j1Oracle,
    "j2_anti_join" -> j2Oracle,
    "j3_outer_join" -> j3Oracle,
    "a1_distinct" -> a1Oracle,
    "a2_count_distinct" -> a2Oracle,
    "g1_rollup" -> g1Oracle,
    "g2_cube" -> g2Oracle,
    "g3_pivot" -> g3Oracle,
    "a3_grouped_topk" -> a3Oracle,
    "a4_approx_sketches" -> a4Oracle,
    "g4_unpivot" -> g4Oracle,
    "f14_date_arith" -> f14Oracle,
    "o1_topk" -> o1Oracle,
    "o2_salted_join" -> o2Oracle,
    "w1_window_rank" -> w1Oracle,
    "w2_lag_lead" -> w2Oracle,
    "i1_intersect" -> i1Oracle,
    "i2_except" -> i2Oracle)
}
