package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.Tables

class DedupSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("exact dedup: planted copies collapse to the original keeper") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val planted = docs.unionByName(
      docs.filter($"doc_id" < 5).withColumn("doc_id", $"doc_id" + 100000))
    val out = Dedup.exactDedup(planted)
    out.filter(!$"is_keeper").select($"doc_id").as[Long].collect()
      .sorted shouldBe (0L until 5L).map(_ + 100000).toArray
    out.filter($"is_keeper").count() shouldBe docs.count()
  }

  test("minhash-LSH near-dup: planted first-token edits are recovered, " +
    "originals are not near-dups of each other") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val planted = docs.unionByName(
      docs.filter($"doc_id" < 5)
        .withColumn("doc_id", $"doc_id" + 100000)
        .withColumn("text", regexp_replace($"text", "^\\S+", "qqq")))
    val pairs = Dedup.nearDupPairs(planted, threshold = 0.5)
      .select($"id_a", $"id_b", $"jaccard").collect()
    val plantedPairs = pairs.filter(r => r.getLong(1) == r.getLong(0) + 100000)
    plantedPairs should have length 5
    all(plantedPairs.map(_.getDouble(2))) should be > 0.5
    // every emitted pair is exact-Jaccard-verified above the threshold
    // (the natural corpus contains real near-dups too — that's fine)
    all(pairs.map(_.getDouble(2))) should be >= 0.5
    all(pairs.map(r => r.getLong(0) < r.getLong(1))) shouldBe true
  }

  test("simhash: exact copies share fingerprints (hamming 0)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val planted = docs.unionByName(
      docs.filter($"doc_id" < 5).withColumn("doc_id", $"doc_id" + 100000))
    val pairs = Dedup.simhashPairs(planted, maxHamming = 3)
      .select($"id_a", $"id_b", $"hamming").collect()
    val plantedPairs = pairs.filter(r => r.getLong(1) == r.getLong(0) + 100000)
    plantedPairs should have length 5
    all(plantedPairs.map(_.getInt(2))) shouldBe 0
  }

  test("blocked n-gram jaccard: identical docs → 1.0, disjoint → 0.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e", "x"),
      (2L, "a b c d e", "x"),
      (3L, "p q r s t", "x")).toDF("doc_id", "text", "lang")
    val out = Dedup.blockedNgramJaccard(docs)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    out shouldBe Array((1L, 2L, 1.0), (2L, 3L, 0.0))
  }

  test("shingles: short documents degrade to the full text") {
    import spark.implicits._
    val out = Dedup.withShingles(Seq((1L, "one two")).toDF("doc_id", "text"))
      .select($"shingles").collect().head.getSeq[String](0)
    out shouldBe Seq("one two")
  }

  test("winnow pairs: planted first-token edits are recovered with high " +
    "fingerprint overlap") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val planted = docs.unionByName(
      docs.filter($"doc_id" < 5)
        .withColumn("doc_id", $"doc_id" + 100000)
        .withColumn("text", regexp_replace($"text", "^\\S+", "qqq")))
    // maxDocFreq=30: the synthetic corpus's tiny vocabulary makes
    // cross-doc k-gram collisions much denser than real text, so the
    // production default (10) over-prunes here
    val pairs = Dedup.winnowPairs(planted, maxDocFreq = 30)
      .select($"id_a", $"id_b", $"n_shared").as[(Long, Long, Long)]
      .collect()
    graft.core.TransientCache.drain()
    val plantedPairs = pairs.filter { case (a, b, _) => b == a + 100000 }
    plantedPairs should have length 5
    // a first-token edit leaves almost the whole document intact: the
    // planted pair shares far more than the 3-fingerprint floor
    all(plantedPairs.map(_._3)) should be >= 5L
  }
}
