package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ManifestLake

/** Pins the incremental cross-corpus dedup contract: classification
  * against a lake-resident signature index, bit-stable re-classification
  * after admission, replay-guarded index appends, and bloom coverage on
  * the probe keys. */
class DedupIndexSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-dedup-index").toString

  // distinct enough that no two corpus docs are near-dups at 0.5
  private def corpusDF = {
    import spark.implicits._
    (0L until 20L).map(i =>
      (i, (0 until 30).map(t => s"w${i}_$t").mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("classifyBatch flags exact corpus/batch dups, near dups by " +
    "signature agreement, and admits only unique docs") {
    import spark.implicits._
    val dir = freshDir()
    DedupIndex.buildIndex(corpusDF, dir)
    // both index tables carry their probe-key bloom coverage
    ManifestLake.snapshot(spark, DedupIndex.signaturesTable(dir))
      .bloomCols shouldBe Seq("content_hash")
    ManifestLake.snapshot(spark, DedupIndex.postingsTable(dir))
      .bloomCols shouldBe Seq("bucket")
    val corpusText5 = (0 until 30).map(t => s"w5_$t").mkString(" ")
    val near7 = "qqq " + (1 until 30).map(t => s"w7_$t").mkString(" ")
    val fresh1 = (0 until 30).map(t => s"f1_$t").mkString(" ")
    val fresh2 = (0 until 30).map(t => s"f2_$t").mkString(" ")
    val nearF1 = "qqq " + (1 until 30).map(t => s"f1_$t").mkString(" ")
    val batch = Seq(
      (100L, corpusText5), // exact dup of corpus doc 5
      (101L, fresh1),      // unique (keeper)
      (102L, fresh1),      // exact dup of batch doc 101
      (103L, near7),       // near dup of corpus doc 7
      (104L, nearF1),      // near dup of batch doc 101
      (105L, fresh2)       // unique
    ).toDF("doc_id", "text")
    val verdict = DedupIndex.classifyBatch(spark, batch, dir)
      .as[(Long, Boolean, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    verdict(100L) shouldBe ((true, Some(5L), false))
    verdict(101L) shouldBe ((false, None, false))
    verdict(102L) shouldBe ((true, Some(101L), false))
    verdict(103L) shouldBe ((false, None, true))
    verdict(104L) shouldBe ((false, None, true))
    verdict(105L) shouldBe ((false, None, false))
    // admission appends exactly the two unique docs, replay-guarded
    val n = DedupIndex.admit(spark, batch,
      DedupIndex.classifyBatch(spark, batch, dir), dir, batchId = 1L)
    n shouldBe 2L
    ManifestLake.read(spark, DedupIndex.signaturesTable(dir))
      .count() shouldBe 22
    // re-classification AFTER admission is bit-identical: unique docs
    // self-match in the corpus and are excluded by id; the within-batch
    // dups now match their admitted keepers as corpus partners
    val again = DedupIndex.classifyBatch(spark, batch, dir)
      .as[(Long, Boolean, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    again shouldBe verdict
    // replayed admit (same appId/batchId) is a no-op on both tables
    DedupIndex.admit(spark, batch,
      DedupIndex.classifyBatch(spark, batch, dir), dir, batchId = 1L)
    ManifestLake.read(spark, DedupIndex.signaturesTable(dir))
      .count() shouldBe 22
    ManifestLake.currentVersion(spark, DedupIndex.signaturesTable(dir))
      .get shouldBe 2L
  }

  test("a later batch deduplicates against docs admitted by an earlier " +
    "batch — the incremental contract") {
    import spark.implicits._
    val dir = freshDir()
    DedupIndex.buildIndex(corpusDF, dir)
    val fresh = (0 until 30).map(t => s"g_$t").mkString(" ")
    val b1 = Seq((200L, fresh)).toDF("doc_id", "text")
    DedupIndex.admit(spark, b1,
      DedupIndex.classifyBatch(spark, b1, dir), dir, batchId = 1L)
    // batch 2: one exact copy and one near copy of batch 1's doc
    val nearFresh = "zzz " + (1 until 30).map(t => s"g_$t").mkString(" ")
    val b2 = Seq((300L, fresh), (301L, nearFresh)).toDF("doc_id", "text")
    val v = DedupIndex.classifyBatch(spark, b2, dir)
      .as[(Long, Boolean, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    v(300L) shouldBe ((true, Some(200L), false))
    v(301L) shouldBe ((false, None, true))
    // nothing admitted from batch 2
    DedupIndex.admit(spark, b2,
      DedupIndex.classifyBatch(spark, b2, dir), dir,
      batchId = 2L) shouldBe 0L
  }
}
