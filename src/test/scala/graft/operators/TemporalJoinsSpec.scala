package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class TemporalJoinsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("as-of join: latest at-or-before match, null before first right") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, ts(50)),   // before any quote → null
      (2L, 100L, ts(100)),  // exactly at quote t=100 → that quote (>=)
      (3L, 100L, ts(250)),  // between 200 and 300 → quote at 200
      (4L, 200L, ts(500)))  // other key → its own quote stream
      .toDF("trade_id", "account", "ts")
    val right = Seq(
      (100L, ts(100), 10.0), (100L, ts(200), 20.0), (100L, ts(300), 30.0),
      (200L, ts(400), 40.0))
      .toDF("account", "ts", "price")
    val out = TemporalJoins.asofJoin(left, right, "account", "ts",
        Seq("price"))
      .select($"trade_id", $"__asof_price")
      .as[(Long, Option[Double])].collect().toMap
    out shouldBe Map(
      1L -> None, 2L -> Some(10.0), 3L -> Some(20.0), 4L -> Some(40.0))
  }

  test("as-of: a matched right row's NULL value is carried as NULL, " +
    "not replaced by a stale earlier value") {
    import spark.implicits._
    val left = Seq((1L, 100L, ts(12))).toDF("trade_id", "account", "ts")
    val right = Seq(
      (100L, ts(5), Some(7.0)),
      (100L, ts(10), None)) // the actual as-of match — with a NULL price
      .toDF("account", "ts", "price")
    val out = TemporalJoins.asofJoin(left, right, "account", "ts",
        Seq("price"))
      .select($"trade_id", $"__asof_price")
      .as[(Long, Option[Double])].collect().toMap
    out(1L) shouldBe None // NOT Some(7.0)
  }

  test("range join matches the plain theta join inside the tolerance") {
    import spark.implicits._
    val left = Seq((1L, 7L, ts(1000)), (2L, 7L, ts(5000)))
      .toDF("lid", "k", "ts")
    val right = Seq(
      (7L, ts(400), "a"),   // 600s from l1 → only via wide tolerance
      (7L, ts(1100), "b"),  // 100s from l1 ✓
      (7L, ts(4800), "c"),  // 200s from l2 ✓
      (8L, ts(1000), "d"))  // other key → never
      .toDF("k", "ts", "tag")
    val got = TemporalJoins.rangeJoin(left, right, "k", "ts",
        toleranceUs = 300L * 1000000L, Seq("tag"))
      .select($"lid", $"__range_tag").as[(Long, String)].collect().toSet
    got shouldBe Set((1L, "b"), (2L, "c"))
    // bucket-boundary correctness: a match exactly at the tolerance edge
    val edge = TemporalJoins.rangeJoin(left, right, "k", "ts",
        toleranceUs = 600L * 1000000L, Seq("tag"))
      .select($"lid", $"__range_tag").as[(Long, String)].collect().toSet
    edge should contain((1L, "a")) // |1000-400| == tolerance → inclusive
  }

  test("range join: a right value column named like a left column does " +
    "not produce ambiguous duplicates") {
    import spark.implicits._
    val left = Seq((1L, 7L, ts(1000), "L")).toDF("lid", "k", "ts", "tag")
    val right = Seq((7L, ts(1100), "R")).toDF("k", "ts", "tag")
    val out = TemporalJoins.rangeJoin(left, right, "k", "ts",
        toleranceUs = 300L * 1000000L, Seq("tag"))
      .select($"lid", $"tag", $"__range_tag") // unambiguous by contract
      .as[(Long, String, String)].collect().toSet
    out shouldBe Set((1L, "L", "R"))
  }

  test("funnel: strict first-touch ordering — pre-view clicks don't " +
    "count, drop-offs label correctly, never-viewed users are absent") {
    import spark.implicits._
    def t(sec: Int) = Timestamp.valueOf(s"2024-01-01 00:00:${"%02d".format(sec)}")
    val events = Seq(
      // user 1: full conversion in order
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)),
      // user 2: click BEFORE the first view — must not count; no later
      // click, so user 2 stalls at step 1 despite a purchase existing
      (2L, "click", t(1)), (2L, "view", t(2)), (2L, "purchase", t(3)),
      // user 3: view then click, purchase BEFORE the click — step 2
      (3L, "view", t(1)), (3L, "purchase", t(2)), (3L, "click", t(3)),
      // user 4: never views — not in the funnel at all
      (4L, "click", t(1)), (4L, "purchase", t(2)))
      .toDF("user_id", "event_type", "ts")
    val out = TemporalQueries.funnel(events, Seq("view", "click", "purchase"))
      .select($"user_id", $"step_reached")
      .as[(Long, Int)].collect().toMap
    out shouldBe Map(1L -> 3, 2L -> 1, 3L -> 2)
  }

  test("funnel deadlines: the first qualifying event must land INSIDE " +
    "the per-step window — late converters drop, a within-window " +
    "SECOND event still converts, unbounded entries behave like fn1") {
    import spark.implicits._
    def t(sec: Int) = Timestamp.valueOf(s"2024-01-01 00:00:${"%02d".format(sec)}")
    val events = Seq(
      // user 1: click 2 s after view (inside the 5 s window), purchase
      // 3 s after click (inside 10 s) — full conversion
      (1L, "view", t(1)), (1L, "click", t(3)), (1L, "purchase", t(6)),
      // user 2: first click 8 s after view — OUTSIDE the 5 s window,
      // and no earlier click exists: stalls at step 1 even though a
      // purchase follows
      (2L, "view", t(1)), (2L, "click", t(9)), (2L, "purchase", t(10)),
      // user 3: click converts at 4 s; purchase 20 s later — outside
      // the 10 s purchase window: step 2
      (3L, "view", t(1)), (3L, "click", t(5)), (3L, "purchase", t(25)),
      // user 4: an out-of-window click at 8 s is IGNORED, but a
      // second view resets nothing — windows anchor on the FIRST
      // view; the later click at 30 s is also out of window: step 1
      (4L, "view", t(1)), (4L, "click", t(30)))
      .toDF("user_id", "event_type", "ts")
    val out = TemporalQueries.funnel(events, Seq("view", "click", "purchase"),
        maxGapUs = Seq(5L * 1000000, 10L * 1000000))
      .select($"user_id", $"step_reached")
      .as[(Long, Int)].collect().toMap
    out shouldBe Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 1)
    // zero/negative gaps mean unbounded — identical to the plain funnel
    val plain = TemporalQueries.funnel(events,
      Seq("view", "click", "purchase"))
      .select($"user_id", $"step_reached").as[(Long, Int)].collect().toMap
    TemporalQueries.funnel(events, Seq("view", "click", "purchase"),
        maxGapUs = Seq(0L, -1L))
      .select($"user_id", $"step_reached")
      .as[(Long, Int)].collect().toMap shouldBe plain
    // arity guard
    intercept[IllegalArgumentException] {
      TemporalQueries.funnel(events, Seq("view", "click", "purchase"),
        maxGapUs = Seq(1L))
    }.getMessage should include("one entry per transition")
  }

  test("transition matrix: hand-computed counts and probabilities; " +
    "sequences never cross users; ties break on event_id") {
    import spark.implicits._
    def t(sec: Int) = Timestamp.valueOf(s"2024-01-01 00:00:${"%02d".format(sec)}")
    // user 1: a -> b -> a -> b ; user 2: b -> b (no cross-user pair)
    val events = Seq(
      (10L, 1L, "a", t(1)), (11L, 1L, "b", t(2)),
      (12L, 1L, "a", t(3)), (13L, 1L, "b", t(4)),
      (20L, 2L, "b", t(1)), (21L, 2L, "b", t(2)))
      .toDF("event_id", "user_id", "event_type", "ts")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    // user1 pairs: (a,b),(b,a),(a,b); user2: (b,b)
    pairs shouldBe Set(("a", "b", 2L), ("b", "a", 1L), ("b", "b", 1L))
  }
}
