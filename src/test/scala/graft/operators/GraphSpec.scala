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

  test("degree-oriented triangle count: identical counts on a random " +
    "graph, and a star hub's wedge set collapses from C(deg,2) to zero") {
    import spark.implicits._
    // star-plus-clique with a MID-id hub (the id-order wedge pivot is
    // the middle vertex a<b<c, so the pathology needs neighbors on
    // both id sides): hub 50 touches leaves 1..49 and 51..99, K5 on
    // 200..204 adds 10 triangles, edge (1,2) closes one hub triangle
    val star = (1L to 49L).map(l => (l, 50L)) ++
      (51L to 99L).map(l => (50L, l))
    val k5 = for (a <- 200L to 204L; b <- 200L to 204L if a < b)
      yield (a, b)
    val edges = (star ++ k5 ++ Seq((1L, 2L))).toDF("src", "dst")
    val byId = Graph.triangleCount(edges)
      .as[(Long, Long, Long)].collect().head
    val byDeg = Graph.triangleCount(edges, degreeOriented = true)
      .as[(Long, Long, Long)].collect().head
    byDeg shouldBe byId
    byDeg._3 shouldBe 11L // K5's 10 + (1, 2, 50)
    // the wedge-work collapse: with id ordering the hub pivots
    // 49 × 49 = 2401 wedges (every low-id × high-id neighbor pair);
    // degree orientation points every edge INTO the hub (max degree),
    // so the hub pivots ZERO and the total is the clique's Σ C(k,2)
    // plus a couple of leaf pivots
    val canonical = edges.select(
        least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
    val idWedges = canonical.select($"u".as("a"), $"v".as("b"))
      .join(canonical.select($"u".as("b"), $"v".as("c")), Seq("b"))
      .count()
    val o = Graph.orientedEdges(canonical)
    val degWedges = o.select($"s", $"t".as("t1"), $"dt".as("d1"))
      .join(o.select($"s", $"t".as("t2"), $"dt".as("d2")), Seq("s"))
      .filter($"d1" < $"d2" || ($"d1" === $"d2" && $"t1" < $"t2"))
      .count()
    idWedges should be >= 2401L
    degWedges should be < 30L // clique pivots + a leaf; hub pivots 0
    // random graph: both orientations agree
    val rng = new scala.util.Random(11)
    val rand = (1 to 600).map(_ =>
      (rng.nextInt(60).toLong, rng.nextInt(60).toLong)).toDF("src", "dst")
    Graph.triangleCount(rand).as[(Long, Long, Long)].collect().head shouldBe
      Graph.triangleCount(rand, degreeOriented = true)
        .as[(Long, Long, Long)].collect().head
  }

  test("PageRank dangling policies: refuse fails by name; self-loop " +
    "and redistribute match hand-unrolled oracles; convergence " +
    "termination stops early and matches the fixed-count run") {
    import spark.implicits._
    // 1 → 2, 1 → 3, 3 → 1: node 2 is DANGLING (never a src)
    val dangling = Seq((1L, 2L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.pageRank(dangling, iterations = 1)
    }.getMessage should include("dangling")
    // assume-none skips the check's edge job; on a CLOSED graph it is
    // bit-identical to the checked default
    val closed0 = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    Graph.pageRank(closed0, iterations = 2, dangling = "assume-none")
      .as[(Long, Double)].collect().sorted shouldBe
      Graph.pageRank(closed0, iterations = 2).as[(Long, Double)]
        .collect().sorted
    // self-loop oracle, 2 iterations (outdeg: 1→2 (+2,3), 2→1 (self),
    // 3→1): r0 = 1 each.
    // iter1: r1 = .15+.85*(r3)= .15+.85*1 = 1.0
    //        r2 = .15+.85*(r1/2 + r2) = .15+.85*1.5 = 1.425
    //        r3 = .15+.85*(r1/2) = .575
    // iter2: r1 = .15+.85*(.575) = .63875
    //        r2 = .15+.85*(1.0/2 + 1.425) = 1.78625
    //        r3 = .15+.85*(1.0/2) = .575
    val sl = Graph.pageRank(dangling, iterations = 2,
      dangling = "self-loop").as[(Long, Double)].collect().toMap
    sl(1L) shouldBe 0.63875 +- 1e-9
    sl(2L) shouldBe 1.78625 +- 1e-9
    sl(3L) shouldBe 0.575 +- 1e-9
    // redistribute oracle, 2 iterations, N = 3: dangling mass = r2.
    // iter1: dm = 1/3;
    //   r1 = .15+.85*(1 + 1/3) = 1.28333...
    //   r2 = .15+.85*(.5 + 1/3) = .858333...
    //   r3 = .15+.85*(.5 + 1/3) = .858333...
    // iter2: dm = .858333../3 = .2861111..;
    //   r1 = .15+.85*(.858333.. + .2861111..) = 1.122777..
    //   r2 = .15+.85*(1.283333../2 + .2861111..) = .9387499..
    //   r3 = same as r2
    val rd = Graph.pageRank(dangling, iterations = 2,
      dangling = "redistribute").as[(Long, Double)].collect().toMap
    rd(1L) shouldBe (0.15 + 0.85 * (0.858333333 + 0.286111111)) +- 1e-6
    rd(2L) shouldBe (0.15 + 0.85 * (1.283333333 / 2 + 0.286111111)) +- 1e-6
    rd(3L) shouldBe rd(2L) +- 1e-12
    // redistribute conserves total mass exactly like the closed graph
    rd.values.sum shouldBe 3.0 +- 1e-8
    // convergence: a reachable tolerance stops before the cap (the
    // result differs from the full-cap run), and the stopped state is
    // genuinely converged — one more hand-computed power step moves
    // the ranks by less than the tolerance
    val closed = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val d = 0.5 // fast mixing so the test converges in ~a dozen steps
    val conv = Graph.pageRank(closed, iterations = 24, damping = d,
      tolerance = 1e-4).as[(Long, Double)].collect().toMap
    val atCap = Graph.pageRank(closed, iterations = 24, damping = d,
      persistEvery = 4).as[(Long, Double)].collect().toMap
    conv should not equal atCap // stopped early
    // outdeg: 1 → 2; 2, 3 → 1 each
    val step = Map(
      1L -> ((1 - d) + d * (conv(2L) + conv(3L))),
      2L -> ((1 - d) + d * conv(1L) / 2),
      3L -> ((1 - d) + d * conv(1L) / 2))
    step.map { case (k, v) => math.abs(v - conv(k)) }.sum should
      be < 1e-4 * (1 + d) // contraction: successor delta < d·tol + grid slack
    // a tight tolerance runs to the cap, agreeing with the plain
    // fixed-count run bit for bit
    Graph.pageRank(closed, iterations = 3, tolerance = 1e-18)
      .as[(Long, Double)].collect().sorted shouldBe
      Graph.pageRank(closed, iterations = 3)
        .as[(Long, Double)].collect().sorted
  }
}
