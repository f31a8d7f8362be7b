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
}
