package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class SpatialSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("radius join: cross-cell neighbors found, boundary inclusive, " +
    "just-beyond excluded, equals brute force on random points, " +
    "no cartesian") {
    import spark.implicits._
    val planted = Seq(
      (1L, 0.5, 0.5),   // cell (0,0)
      (2L, 1.4, 1.4),   // cell (1,1) — diagonal neighbor, dist ~1.27 < 2
      (3L, 0.5, 2.5),   // dist 2.0 from point 1 exactly — inclusive
      (4L, 0.5, 2.51),  // dist 2.01 from point 1 — excluded
      (5L, 50.0, 50.0)) // far away
    val df = Spatial.radiusJoin(planted.toDF("id", "x", "y"), radius = 2.0)
    val got = df.as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2)).toSet
    got should contain((1L, 2L))
    got should contain((1L, 3L))
    (got should not).contain((1L, 4L))
    (got should not).contain((1L, 5L))
    val plan = df.queryExecution.executedPlan.toString
    (plan should not).include("CartesianProduct")
    (plan should not).include("BroadcastNestedLoopJoin")
    // random points vs brute force — exact pair-set equality
    val rng = new scala.util.Random(11)
    val pts = (1 to 200).map(i =>
      (i.toLong, rng.nextDouble() * 40 - 20, rng.nextDouble() * 40 - 20))
    val fast = Spatial.radiusJoin(pts.toDF("id", "x", "y"), radius = 3.0)
      .as[(Long, Long, Double)].collect().toSet
    val brute = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= 9.0
    } yield (ia, ib, d2)).toSet
    fast shouldBe brute
  }
}
