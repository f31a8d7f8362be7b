package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class GraphSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("PageRank: hand-computed two iterations on a 3-node star; " +
    "rank mass is conserved; the plan is keyed joins only") {
    import spark.implicits._
    // star centered at 1, all edges bidirectional: outdeg 1:2, 2:1, 3:1
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val df = Graph.pageRank(edges, iterations = 2)
    val ranks = df.as[(Long, Double)].collect().toMap
    // iter1: r1 = .15 + .85*(1+1) = 1.85; r2 = r3 = .15 + .85*.5 = .575
    // iter2: r1 = .15 + .85*(.575*2) = 1.1275
    //        r2 = r3 = .15 + .85*(1.85/2) = .93625
    ranks(1L) shouldBe 1.1275 +- 1e-9
    ranks(2L) shouldBe 0.93625 +- 1e-9
    ranks(3L) shouldBe 0.93625 +- 1e-9
    // total mass: sum r' = (1-d)*N + d*sum r = N when sum r = N
    ranks.values.sum shouldBe 3.0 +- 1e-8
    val plan = df.queryExecution.executedPlan.toString
    (plan should not).include("CartesianProduct")
    (plan should not).include("BroadcastNestedLoopJoin")
  }

  test("PageRank is partitioning-invariant bit for bit (the decimal " +
    "contract): 1-partition and 16-partition runs agree exactly") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val edges0 = (1 to 400).map { _ =>
      (rng.nextInt(50).toLong, rng.nextInt(50).toLong)
    }
    // bidirectional so every node that appears is a src
    val all = (edges0 ++ edges0.map(_.swap)).distinct
    val one = Graph.pageRank(all.toDF("src", "dst").coalesce(1), 3)
      .as[(Long, Double)].collect().sorted
    val many = Graph.pageRank(all.toDF("src", "dst").repartition(16), 3)
      .as[(Long, Double)].collect().sorted
    one shouldBe many // exact equality, not tolerance
  }

  test("triangle count: K4 has 4 triangles; duplicates, reversed " +
    "edges and self-loops canonicalize away; a dangling edge adds none") {
    import spark.implicits._
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b)
    val edges = (k4 ++ Seq((1L, 1L), (4L, 5L), (2L, 1L))).toDF("src", "dst")
    val row = Graph.triangleCount(edges)
      .as[(Long, Long, Long)].collect().head
    row shouldBe ((5L, 7L, 4L)) // 5 nodes, K4's 6 edges + (4,5), 4 triangles
  }
}
