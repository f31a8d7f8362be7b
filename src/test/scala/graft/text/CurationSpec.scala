package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class CurationSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("rule cascade: first violated rule names the drop, order is fixed") {
    import spark.implicits._
    val enWords = "the cat is in the house and it is warm " * 5 // 50 tokens
    val docs = Seq(
      (1L, enWords.trim),                       // kept
      (2L, "the a of"),                         // too_short
      (3L, ("w " * 200).trim),                  // too_long (and low alpha —
                                                //   too_long wins by order)
      (4L, ("1 2 3 4 ! ? . , 5 6 7 8 9 0 # @ " * 2 + "x y z a b c d e f g h i j k l m").trim), // low_alpha
      (5L, ("le chat est dans la maison et un jardin " * 5).trim), // 40 tokens, fr → lang_filtered
      (6L, enWords.trim))                       // exact dup of 1 → exact_dup
      .toDF("doc_id", "text")
    val out = Curation.annotate(docs, Curation.Config())
      .select($"doc_id", $"drop_reason").as[(Long, Option[String])]
      .collect().toMap
    out(1L) shouldBe None
    out(2L) shouldBe Some("too_short")
    out(3L) shouldBe Some("too_long")
    out(4L) shouldBe Some("low_alpha")
    out(5L) shouldBe Some("lang_filtered")
    out(6L) shouldBe Some("exact_dup")
  }

  test("curate returns only kept rows with the original schema") {
    import spark.implicits._
    val docs = Seq(
      (1L, ("the cat is in the house and it is warm " * 5).trim),
      (2L, "too short")).toDF("doc_id", "text")
    val kept = Curation.curate(docs)
    kept.columns.toSeq shouldBe Seq("doc_id", "text")
    kept.select($"doc_id").as[Long].collect().toSeq shouldBe Seq(1L)
  }

  test("dropRepetitive adds the Gopher verdict between the shape rules " +
    "and the language filter; off by default") {
    import spark.implicits._
    // doc 1: varied English prose (no dominating n-gram — a "* 5"
    // repeat of a clause would itself be repetitive, correctly); doc 2:
    // a loop of the same clause (top_bigram*5 > n_bigrams). Both pass
    // the shape rules.
    val varied = "the quick brown fox jumps over a lazy dog and it is " +
      "warm in the old house while birds sing of summer days to come " +
      "with friends around every corner near water under tall trees"
    val looped = ("the cat is the cat is the cat is the cat is " * 3).trim
    val docs = Seq(
      (1L, varied),
      (2L, looped)).toDF("doc_id", "text")
    val off = Curation.annotate(docs)
      .select($"doc_id", $"drop_reason").as[(Long, Option[String])]
      .collect().toMap
    off(2L) shouldBe None // rule disabled: the doc survives
    val on = Curation.annotate(docs,
      Curation.Config(dropRepetitive = true))
      .select($"doc_id", $"drop_reason").as[(Long, Option[String])]
      .collect().toMap
    on(1L) shouldBe None
    on(2L) shouldBe Some("repetitive")
  }
}
