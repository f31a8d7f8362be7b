package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Market-basket analytics: exact frequent pairs with the classic
  * association-rule measures. (The Apriori observation does the heavy
  * lifting relationally: the basket table collapses to DISTINCT
  * (basket, item) first, so pair counting is one self-join on the
  * basket key + one aggregate — counts are exact longs, each measure
  * ONE IEEE division of exact integers, bit-identical everywhere.)
  */
object Baskets {

  /** All item pairs co-occurring in ≥ `minSupport` baskets with their
    * support count, both directional confidences, and lift:
    * `conf(a→b) = n_ab / n_a`, `lift = (n_ab · N) / (n_a · n_b)`.
    *
    * Scale shape: dedup to (basket, item) (map-side combine), ONE
    * basket-keyed self-join whose output is Σ basket_size² — bounded
    * by the basket-size distribution, never by n_items² — then a
    * pair-keyed aggregate and two small item-count joins (AQE
    * broadcasts the item side). The support threshold prunes BEFORE
    * the measure joins, the Apriori ordering. A pathological mega
    * basket (one order holding thousands of items) bounds like a hot
    * LSH bucket: cap-and-flag or salt the basket. */
  def frequentPairs(baskets: DataFrame, minSupport: Long = 2L,
                    basketCol: String = "basket",
                    itemCol: String = "item"): DataFrame = {
    val base = graft.core.TransientCache.persist(
      baskets.select(col(basketCol).as("o"), col(itemCol).as("p"))
        .distinct())
    val nBaskets = base.agg(countDistinct(col("o")).as("n_baskets"))
    val items = base.groupBy(col("p")).agg(count(lit(1)).as("n"))
    val pairs = supportedPairs(base, minSupport)
    pairs
      .join(items.select(col("p").as("pa"), col("n").as("n_a")), Seq("pa"))
      .join(items.select(col("p").as("pb"), col("n").as("n_b")), Seq("pb"))
      .crossJoin(broadcast(nBaskets))
      .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") / col("n_a")).as("conf_a_b"),
        (col("n_ab").cast("double") / col("n_b")).as("conf_b_a"),
        ((col("n_ab") * col("n_baskets")).cast("double") /
          (col("n_a") * col("n_b"))).as("lift"))
  }

  /** Just the supported pairs `(pa, pb, n_ab)` — the self-join +
    * aggregate core of [[frequentPairs]] WITHOUT the item-count joins,
    * the basket count, or the rule measures. Callers that only need
    * the co-occurrence EDGE SET (triangle counting over the
    * co-purchase graph) project here instead of paying two joins and
    * an aggregate whose outputs they drop (guide §2.3 project early —
    * measured ~20% of tc1's wall-clock at sf0.1). Same edge set as
    * [[frequentPairs]] by construction: the support filter never
    * depended on the measures. */
  def frequentPairIds(baskets: DataFrame, minSupport: Long = 2L,
                      basketCol: String = "basket",
                      itemCol: String = "item"): DataFrame =
    supportedPairs(
      graft.core.TransientCache.persist(
        baskets.select(col(basketCol).as("o"), col(itemCol).as("p"))
          .distinct()),
      minSupport)
      .select(col("pa"), col("pb"))

  /** Shared pair-support core: distinct (o, p) self-join on the basket
    * key, pair-keyed count, support filter. */
  private def supportedPairs(base: DataFrame,
                             minSupport: Long): DataFrame =
    base.select(col("o"), col("p").as("pa"))
      .join(base.select(col("o"), col("p").as("pb")), Seq("o"))
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
}

/** Correctness-gate entries for the basket family. */
object BasketQueries {

  /** ar1_association_rules — exact market-basket rules through the
    * gate: orders as baskets, parts as items, support ≥ 2; counts are
    * exact longs and every measure one IEEE division of exact
    * integers, so confidences and lifts agree with DuckDB bit for
    * bit — no grid rounding needed anywhere. */
  def ar1AssociationRules(s: SparkSession, d: String): DataFrame =
    Baskets.frequentPairs(
      Tables.lineitem(s, d).select(col("l_orderkey").as("basket"),
        col("l_partkey").as("item")))

  val ar1Oracle: String =
    """WITH base AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |nb AS (SELECT count(DISTINCT o) AS n_baskets FROM base),
      |items AS (SELECT p, count(*) AS n FROM base GROUP BY p),
      |pairs AS (
      |  SELECT a.p AS pa, b.p AS pb, count(*) AS n_ab
      |  FROM base a JOIN base b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT pa, pb, n_ab, ia.n AS n_a, ib.n AS n_b,
      |  CAST(n_ab AS DOUBLE) / ia.n AS conf_a_b,
      |  CAST(n_ab AS DOUBLE) / ib.n AS conf_b_a,
      |  CAST(n_ab * n_baskets AS DOUBLE) / (ia.n * ib.n) AS lift
      |FROM pairs
      |JOIN items ia ON ia.p = pa
      |JOIN items ib ON ib.p = pb, nb""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ar1_association_rules" -> (ar1AssociationRules _))

  val oracles: Map[String, String] = Map(
    "ar1_association_rules" -> ar1Oracle)
}
