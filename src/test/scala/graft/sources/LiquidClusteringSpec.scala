package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Incremental liquid-clustering OPTIMIZE: on a table with recorded
  * clustering columns, OPTIMIZE rewrites only files whose key ranges
  * OVERLAP (plus small strays between them) — already-clustered
  * files stay untouched by path, final ranges are pairwise disjoint,
  * and a second OPTIMIZE is a no-op. Routine maintenance on a 100 TB
  * clustered table must cost O(new files), not O(table). */
class LiquidClusteringSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-liquid").toString + "/t"

  private def keyRange(a: DeltaInterop.DeltaAdd): (Long, Long) = {
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(a.stats.get)
    def l(which: String): Long = (j \ which \ "id") match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case other => fail(s"no id bound: $other")
    }
    (l("minValues"), l("maxValues"))
  }

  private def disjoint(files: Seq[DeltaInterop.DeltaAdd]): Boolean = {
    val rs = files.map(keyRange).sortBy(_._1)
    rs.sliding(2).forall {
      case Seq((_, hi), (lo, _)) => hi < lo
      case _ => true
    }
  }

  test("OPTIMIZE on a clustered table rewrites only the appended " +
    "file and its overlapping neighbor; untouched files keep their " +
    "paths; ranges stay pairwise disjoint; a re-OPTIMIZE no-ops") {
    import spark.implicits._
    val t = fresh()
    // two fully-interleaved appends → cluster on id → 2 disjoint files
    (0 until 2).foreach(k => DeltaInterop.write(
      (1L to 100L).filter(_ % 2 == k.toLong).map(i => (i, i))
        .toDF("id", "v").coalesce(1), t))
    DeltaInterop.enableClustering(spark, t, Seq("id"))
    val total0 = DeltaInterop.state(spark, t, None).files.map(_.size).sum
    DeltaInterop.optimize(spark, t, targetFileBytes = total0 / 2 + 1)
    val clustered = DeltaInterop.state(spark, t, None).files
    clustered.size shouldBe 2
    disjoint(clustered) shouldBe true
    // the file covering the upper half of the key space
    val upper = clustered.maxBy(a => keyRange(a)._1)
    // append ONE small file overlapping only the LOWER half
    DeltaInterop.write(
      (30L to 40L).map(i => (i, -i)).toDF("id", "v").coalesce(1), t)
    val target = total0 / 2 + 1
    val v = DeltaInterop.optimize(spark, t, targetFileBytes = target)
    val after = DeltaInterop.state(spark, t, None).files
    // the upper-half file was NOT rewritten — same path survives
    after.map(_.path) should contain(upper.path)
    // the lower half + the new file merged; everything disjoint again
    disjoint(after) shouldBe true
    DeltaInterop.read(spark, t).count() shouldBe 111L
    // converged: a second OPTIMIZE finds nothing to do (no commit)
    DeltaInterop.optimize(spark, t, targetFileBytes = target) shouldBe v
    DeltaInterop.state(spark, t, None).version shouldBe v
  }

  test("a run of small disjoint strays between kept files packs as " +
    "its own unit without straddling a kept file's range") {
    import spark.implicits._
    val t = fresh()
    // one big clustered file in the middle of the key space
    DeltaInterop.write(
      (400L to 600L).map(i => (i, i)).toDF("id", "v").coalesce(1), t)
    DeltaInterop.enableClustering(spark, t, Seq("id"))
    val bigSize = DeltaInterop.state(spark, t, None).files.head.size
    val big = DeltaInterop.state(spark, t, None).files.head.path
    // two small strays BELOW it and two ABOVE it, all disjoint
    Seq((1L, 50L), (60L, 99L), (700L, 750L), (760L, 800L)).foreach {
      case (lo, hi) => DeltaInterop.write(
        (lo to hi).map(i => (i, i)).toDF("id", "v").coalesce(1), t)
    }
    // target sized so the big file is kept (≥ target/2) and each
    // stray is small (< target/2)
    DeltaInterop.optimize(spark, t, targetFileBytes = bigSize * 2)
    val after = DeltaInterop.state(spark, t, None).files
    after.map(_.path) should contain(big)
    // the two runs packed independently: nothing overlaps the kept
    // file and everything is pairwise disjoint
    disjoint(after) shouldBe true
    after.size shouldBe 3
    DeltaInterop.read(spark, t).count() shouldBe 383L
  }

  test("multi-column clustering still re-clusters the whole group " +
    "(z-order boxes cannot prove disjointness)") {
    import spark.implicits._
    val t = fresh()
    (0 until 2).foreach(k => DeltaInterop.write(
      (1L to 50L).filter(_ % 2 == k.toLong).map(i => (i, i % 7))
        .toDF("id", "v").coalesce(1), t))
    DeltaInterop.enableClustering(spark, t, Seq("id", "v"))
    val before = DeltaInterop.state(spark, t, None).files.map(_.path).toSet
    DeltaInterop.optimize(spark, t)
    val after = DeltaInterop.state(spark, t, None).files.map(_.path).toSet
    after.intersect(before) shouldBe empty
    DeltaInterop.read(spark, t).count() shouldBe 50L
  }
}
