package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.BenchReport

/** Pins the bench artifact's line schema — specifically the TAIL-SAFETY
  * contract: the driver's capture windows onto the last ~2,000 chars of
  * stdout, so (1) the final summary line must be compact and
  * self-contained including the top-N slowest per-query MINIMA, and
  * (2) the detail line must order raw passes FIRST and minima LAST, so
  * a window cutting into it lands on minima — never on one pass's raw
  * timings (the r11 artifact presented pass-2 raw noise as per-query
  * regressions because the minima lived at the truncated front). */
class BenchReportSpec extends AnyFunSuite with Matchers {

  private val names = Seq("q_fast", "q_mid", "q_slow", "q_broken")
  private val best: Seq[(String, Option[Double])] = Seq(
    "q_fast" -> Some(0.1), "q_mid" -> Some(1.5),
    "q_slow" -> Some(9.0), "q_broken" -> None)
  private val pass1 = Map("q_fast" -> Some(0.1), "q_mid" -> Some(2.0),
    "q_slow" -> Some(9.0), "q_broken" -> Option.empty[Double])
  private val pass2 = Map("q_fast" -> Some(0.3), "q_mid" -> Some(1.5),
    "q_slow" -> Some(44.0), "q_broken" -> Option.empty[Double])

  private def parsed(line: String): org.json4s.JValue =
    org.json4s.jackson.JsonMethods.parse(line)

  test("the summary line is valid JSON carrying total, counts, " +
    "sentinels, and the slowest per-query minima under `top`") {
    import org.json4s._
    val (_, summary) = BenchReport.lines(names, best, Seq(pass1, pass2),
      "/x/sf0.1", Seq(0.17, 0.19))
    val j = parsed(summary)
    (j \ "metric") shouldBe JString("total")
    (j \ "value") shouldBe JDouble(0.1 + 1.5 + 9.0)
    (j \ "queries_run") shouldBe JInt(4)
    (j \ "failed") shouldBe JInt(1)
    (j \ "sentinel_sec") shouldBe JArray(List(JDouble(0.17), JDouble(0.19)))
    // top carries MINIMA (q_slow's min 9.0, not pass2's raw 44.0),
    // slowest first, failed queries excluded
    (j \ "top") shouldBe JObject(List(
      "q_slow" -> JDouble(9.0), "q_mid" -> JDouble(1.5),
      "q_fast" -> JDouble(0.1)))
  }

  test("the detail line puts raw passes FIRST and per-query minima " +
    "LAST, so any tail truncation lands on minima") {
    import org.json4s._
    val (detail, _) = BenchReport.lines(names, best, Seq(pass1, pass2),
      "/x/sf0.1", Seq(0.17, 0.19))
    val j = parsed(detail)
    (j \ "queries" \ "q_slow") shouldBe JDouble(9.0)
    (j \ "passes") match {
      case JArray(ps) =>
        ps should have size 2
        (ps(1) \ "q_slow") shouldBe JDouble(44.0)
      case other => fail(s"passes is not an array: $other")
    }
    // the positional contract itself: the minima object trails the
    // raw passes in the emitted line
    detail.indexOf("\"queries\":") should be >
      detail.indexOf("\"passes\":")
    detail.indexOf("\"queries\":") should be >
      detail.lastIndexOf("44.0")
  }

  test("load self-labeling (r15): a quiet window reports ratio 1.0 " +
    "and an adjusted total equal to the raw; a loaded window labels " +
    "itself with the ratio and the discounted estimate") {
    import org.json4s._
    val (_, quiet) = BenchReport.lines(names, best, Seq(pass1, pass2),
      "/x/sf0.1", Seq(0.17, 0.19))
    val jq = parsed(quiet)
    (jq \ "quiet_norm_sec") shouldBe JDouble(BenchReport.QuietNormSec)
    (jq \ "load_ratio") shouldBe JDouble(1.0)
    (jq \ "load_adjusted_total") shouldBe JDouble(10.6)
    (jq \ "passes_run") shouldBe JInt(2)
    // loaded: the BEST sentinel (0.7) sets the ratio — 0.7/0.2 = 3.5
    val (_, loaded) = BenchReport.lines(names, best, Seq(pass1, pass2),
      "/x/sf0.1", Seq(0.8, 0.7))
    val jl = parsed(loaded)
    (jl \ "load_ratio") shouldBe JDouble(3.5)
    (jl \ "load_adjusted_total") shouldBe JDouble(3.0) // 10.6/3.5 ≈ 3.0
  }

  test("per-query load evidence (r16): a query whose own NON-FIRST " +
    "passes disagree >2x surfaces as a suspect with its ratio; " +
    "interleaved judged sentinel maxima surface as burst_ratio; warm " +
    "(pass-1) sentinels report separately without being judged; " +
    "spread rides the detail line") {
    import org.json4s._
    // passes 2 vs 3: q_slow 9.0 vs 44.0 — a 4.9x disagreement, the
    // r15 pr1 shape; q_fast 3x ratio but only 0.2 s absolute — below
    // the delta bar. Pass 1 (builds/JIT) never participates.
    val (detail, summary) = BenchReport.lines(names, best,
      Seq(pass2, pass1, pass2), "/x/sf0.1",
      // boundary sentinels quiet, one INTERLEAVED judged sample
      // caught the burst — load_ratio stays 1.0 (best) but
      // burst_ratio flags; the inflated WARM sentinel (pass-1 build
      // churn) is reported but judged by neither ratio
      Seq(0.18, 2.4, 0.19), warmSentinels = Seq(7.7))
    val j = parsed(summary)
    (j \ "load_ratio") shouldBe JDouble(1.0)
    (j \ "burst_ratio") shouldBe JDouble(12.0)
    (j \ "sentinel_warm_sec") shouldBe JArray(List(JDouble(7.7)))
    (j \ "suspect_queries") shouldBe JInt(1)
    (j \ "suspect" \ "q_slow") shouldBe JDouble(4.89)
    val jd = parsed(detail)
    (jd \ "spread_gt_1_5" \ "q_slow") shouldBe JDouble(4.89)
    (jd \ "spread_gt_1_5" \ "q_fast") shouldBe JDouble(3.0)
    // the spread map precedes minima so truncation still lands on
    // minima last
    detail.indexOf("\"queries\":") should be >
      detail.indexOf("\"spread_gt_1_5\":")
    // the methodology label derives from the passes actually run
    detail should include("min-of-3")
    val (d2, _) = BenchReport.lines(names, best,
      Seq(pass1, pass2), "/x/sf0.1", Seq(0.18))
    d2 should include("min-of-2")
  }

  test("suspects: flags only >2x AND >0.2s disagreements among " +
    "NON-FIRST passes — pass-1 build cost can never flag, and a " +
    "2-pass run is not evaluable (burst_ratio covers it)") {
    // 2 passes: only ONE post-build sample per query → nothing to
    // disagree with
    BenchReport.suspects(names, Seq(pass1, pass2)) shouldBe empty
    // 3 passes: q_slow's 9.0 vs 44.0 across passes 2-3 flags; q_fast
    // (3x but 0.2 s) stays below the delta bar
    BenchReport.suspects(names,
      Seq(pass2, pass1, pass2)).map(_._1) shouldBe Seq("q_slow")
    // a pass-1-only outlier (the build) never flags
    BenchReport.suspects(names, Seq(pass2, pass1, pass1)) shouldBe empty
    // a broken query (missing in one pass) is a failure, not a suspect
    BenchReport.suspects(Seq("q_broken"),
      Seq(pass1, pass2, pass1)) shouldBe empty
  }

  test("top is capped at TopN and orders ties by name") {
    val many = (1 to 25).map(i => f"q$i%02d" -> Some(1.0))
    val (_, summary) = BenchReport.lines(many.map(_._1), many,
      Seq(many.toMap), "/x", Seq(0.1))
    import org.json4s._
    parsed(summary) \ "top" match {
      case JObject(kvs) =>
        kvs should have size BenchReport.TopN
        kvs.map(_._1) shouldBe kvs.map(_._1).sorted
      case other => fail(s"top is not an object: $other")
    }
  }
}
