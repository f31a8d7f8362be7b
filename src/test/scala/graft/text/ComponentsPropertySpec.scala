package graft.text

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the distributed HashMin label propagation against an
  * independently-written sequential union-find on random graphs: same
  * components, same minimal-id labels, for any edge set — including
  * cycles, self-pairs of structure (paths, stars), and isolated nodes. */
class ComponentsPropertySpec extends AnyFunSuite with Matchers with SparkSpec {

  /** Textbook union-find with path compression — the reference model. */
  private def unionFind(n: Int, edges: List[(Int, Int)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root by min id: union always points the larger root at the smaller,
    // so find() lands on the component minimum
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("rebalanceMix invariants on random corpora and targets: quotas " +
    "are floor(t*M), never exceed group supply, and the kept counts " +
    "realize them exactly") {
    import spark.implicits._
    val genCase = for {
      nGroups <- Gen.chooseNum(1, 4)
      sizes <- Gen.listOfN(nGroups, Gen.chooseNum(0, 40))
      shares <- Gen.listOfN(nGroups, Gen.chooseNum(1, 10))
    } yield (sizes, shares.map(_.toDouble))
    val prop = Prop.forAll(genCase) { case (sizes, shares) =>
      val groups = sizes.indices.map(i => s"g$i")
      val rows = groups.zip(sizes).flatMap { case (g, n) =>
        (0 until n).map(i => (g.hashCode.toLong * 1000 + i, g))
      }
      if (rows.isEmpty) true
      else {
        val df = rows.toDF("doc_id", "lang")
        val targets = groups.zip(shares)
        val kept = CorpusOps.rebalanceMix(df, targets)
          .filter(org.apache.spark.sql.functions.col("kept"))
          .groupBy($"lang").count().as[(String, Long)].collect().toMap
        val m = targets.map { case (g, t) =>
          sizes(groups.indexOf(g)) / t }.min
        targets.forall { case (g, t) =>
          val quota = math.floor(t * m).toLong
          kept.getOrElse(g, 0L) == quota &&
            quota <= sizes(groups.indexOf(g))
        }
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    withClue(result.status.toString) { result.passed shouldBe true }
  }

  test("connectedComponents labels match sequential union-find on " +
    "random graphs") {
    import spark.implicits._
    val genGraph = for {
      n <- Gen.chooseNum(1, 24)
      nEdges <- Gen.chooseNum(0, 30)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.chooseNum(0, n - 1)
        b <- Gen.chooseNum(0, n - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield (n, edges)
    val prop = Prop.forAll(genGraph) { case (n, edges) =>
      val nodes = (0L until n.toLong).toDF("id")
      val pairs = edges.map { case (a, b) => (a.toLong, b.toLong) }
        .toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(nodes, "id", pairs, maxIter = 30)
        .as[(Long, Long)].collect().toMap
      graft.core.TransientCache.drain()
      got == unionFind(n, edges)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    withClue(result.status.toString) { result.passed shouldBe true }
  }

  /** Sequential Levenshtein — the reference model for the PassJoin
    * completeness property. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistanceJoin equals the brute-force pair set on random " +
    "near-duplicate corpora — the blocking provably misses nothing") {
    import spark.implicits._
    // strings over a SMALL alphabet with random single-char edits of a
    // shared base: dense near-duplicate structure, the adversarial case
    // for a blocking scheme (many pairs right AT the threshold)
    val genCase = for {
      base <- Gen.listOfN(14, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      n <- Gen.chooseNum(6, 16)
      docs <- Gen.listOfN(n, for {
        edits <- Gen.chooseNum(0, 4)
        positions <- Gen.listOfN(edits, Gen.chooseNum(0, 13))
        chars <- Gen.listOfN(edits, Gen.oneOf('a', 'b', 'c', 'd'))
      } yield positions.zip(chars).foldLeft(base) { case (acc, (p, c)) =>
        acc.updated(p, c)
      })
    } yield docs
    val prop = Prop.forAll(genCase) { docs =>
      val rows = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.editDistanceJoin(
          rows.toDF("doc_id", "text"), k = 2, prefixLen = 14)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
        d = lev(ta.toLowerCase.take(14), tb.toLowerCase.take(14)) if d <= 2
      } yield (ia, ib, d.toLong)).toSet
      got == want
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    withClue(result.status.toString) { result.passed shouldBe true }
  }
}
