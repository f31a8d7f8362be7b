package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.Tables

class BpeSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("BPE training: hand-computed merge sequence on a toy corpus, " +
    "left-to-right non-overlapping application, stop at minPairFreq") {
    import spark.implicits._
    // dict: aaab×2, ab×1 → (a,a):4 wins; then (a,b):3; then (aa,ab):2
    val docs = Seq((1L, "aaab aaab ab"), (2L, ""))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 10)
    merges.map(m => (m.left, m.right, m.freq)) shouldBe Seq(
      ("a", "a", 4L), ("a", "b", 3L), ("aa", "ab", 2L))
    merges.map(_.rank) shouldBe Seq(0, 1, 2)
  }

  test("BPE argmax ties break lexicographically — training is " +
    "deterministic") {
    import spark.implicits._
    val docs = Seq((1L, "cd ab cd ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 2)
    merges.map(m => (m.left, m.right)) shouldBe Seq(
      ("a", "b"), ("c", "d"))
  }

  test("distributed training equals the independent reference trainer " +
    "over real corpus data") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.train(docs, nMerges = 16)
    val dict = Bpe.wordDict(docs).select(col("word"), col("freq"))
      .as[(String, Long)].collect().toSeq
    Bpe.trainReference(dict, nMerges = 16) shouldBe merges
    merges should have length 16
  }

  test("encode: learned merges collapse words to subword counts in one " +
    "projection") {
    import spark.implicits._
    val merges = Seq(Bpe.Merge(0, "a", "a", 4L), Bpe.Merge(1, "a", "b", 3L),
      Bpe.Merge(2, "aa", "ab", 2L))
    // aaab → [aaab] (1); aab → [aa, b] (2); b → [b] (1)
    val out = Bpe.encode(Seq((1L, "aaab aab b")).toDF("doc_id", "text"),
      merges)
    out.select($"bpe_tokens").as[Int].head() shouldBe 4
    // character-level fallback when no merge applies
    Bpe.encode(Seq((2L, "xyz")).toDF("doc_id", "text"), merges)
      .select($"bpe_tokens").as[Int].head() shouldBe 3
  }
}
