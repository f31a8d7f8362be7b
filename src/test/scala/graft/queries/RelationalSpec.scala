package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.Tables

/** Plan-shape and sketch-bound assertions for the relational family. Runs
  * on sf0.001 (~6k lineitem rows) to stay fast. */
class RelationalSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct (HLL) lands within 10% of the exact count") {
    import spark.implicits._
    val row = Tables.lineitem(spark, sf)
      .agg(countDistinct($"l_orderkey").as("exact"),
        approx_count_distinct($"l_orderkey").as("approx"))
      .collect().head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    math.abs(approx - exact) / exact should be < 0.10
  }

  test("approx percentile sketch lands within 2% of the exact percentile") {
    import spark.implicits._
    val row = Tables.lineitem(spark, sf).agg(
      expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx"),
      expr("percentile(l_extendedprice, 0.5)").as("exact"))
      .collect().head
    val (approx, exact) = (row.getDouble(0), row.getDouble(1))
    math.abs(approx - exact) / exact should be < 0.02
  }

  test("o1_topk plans TakeOrdered, never a global sort") {
    val plan = Relational.o1TopK(spark, sf)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
    (plan should not).include("SortExec")
  }

  test("q1 aggregation runs inside whole-stage codegen") {
    val df = Relational.q1PricingSummary(spark, sf)
    // AQE only annotates codegen stages once the plan is final — execute
    // THIS QueryExecution (a write action would plan a fresh one)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen stage marker: the whole
    // scan → filter → project → partial-agg pipeline fuses into stage 1
    plan should include("*(1) HashAggregate")
    plan should include("*(1) Filter")
    // and the shipdate predicate reached the parquet scan
    plan should include regex "PushedFilters: \\[.*l_shipdate".r
  }

  test("r1 plans broadcast joins for the dimension sides") {
    val plan = Relational.r1JoinBroadcast(spark, sf)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("r4 logical plan no longer forces a broadcast of customer") {
    // the referential-integrity anti-join must not carry an explicit
    // broadcast hint on the fact-scale customer keyset (VERDICT r1 fix);
    // AQE may still *choose* broadcast at tiny SF, which is fine.
    val analyzed = Relational.r4QualityChecks(spark, sf)
      .queryExecution.analyzed.toString
    (analyzed should not).include("ResolvedHint")
  }

  test("p4 time filter pushes the raw-nanos predicate into the parquet scan") {
    val plan = ScalarOps.p4TimeFilter(spark, sf)
      .queryExecution.executedPlan.toString
    // pushdown evidence: ts bounds appear in PushedFilters, not only in a
    // post-scan Filter
    plan should include("PushedFilters")
    plan should include regex "PushedFilters: \\[.*GreaterThanOrEqual\\(ts".r
  }

  test("salted skew join returns exactly the plain-join result") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey".as("orderkey"), $"l_quantity")
    val ord = Tables.orders(spark, sf)
      .select($"o_orderkey".as("orderkey"), $"o_orderpriority")
    val salted = graft.operators.SkewJoin
      .saltedInnerJoin(li, ord, "orderkey", 8)
    val plain = li.join(ord, Seq("orderkey"), "inner")
    salted.count() shouldBe plain.count()
    salted.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(salted).count() shouldBe 0
  }

  test("quality checks detect injected violations") {
    import spark.implicits._
    val dirty = Seq((1, "a"), (1, "b"), (2, null)).toDF("k", "v")
    dirty.filter($"v".isNull).count() shouldBe 1
    dirty.groupBy($"k").count().filter($"count" > 1).count() shouldBe 1
  }

  test("q21 answers both EXISTS forms from ONE orderkey window — no " +
    "nested loop, no semi/anti re-shuffles of lineitem") {
    // r17 shape: the per-order EXISTS / NOT EXISTS questions are window
    // aggregates over a single l_orderkey exchange — one lineitem scan,
    // no LeftSemi/LeftAnti passes. A BroadcastNestedLoopJoin or
    // CartesianProduct here would mean O(n²) — the difference between a
    // keyed shuffle and a scale disaster at 100 TB.
    val df = Relational.q21WaitingSuppliers(spark, sf)
    df.count() should be > 0L
    val plan = df.queryExecution.executedPlan.toString
    (plan should not).include("BroadcastNestedLoopJoin")
    (plan should not).include("CartesianProduct")
    (plan should not).include("LeftSemi")
    (plan should not).include("LeftAnti")
    plan should include regex "Window .*windowspecdefinition\\(l_orderkey".r
  }

  test("q12 pushes the shipdate window into the lineitem scan") {
    val df = Relational.q12PriorityByStatus(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should include regex "PushedFilters: \\[.*l_shipdate".r
    // both CASE counts fold into one aggregate, not two plan branches
    plan.sliding("HashAggregate".length).count(_ == "HashAggregate") should be <= 4
  }
}
