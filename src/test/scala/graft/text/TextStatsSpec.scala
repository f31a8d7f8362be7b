package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class TextStatsSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("language ID picks the profile with most stopword hits; CJK → zh; " +
    "no hits → und") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "le chat est dans la maison et un jardin"),
      (3L, "der hund ist nicht mit der katze"),
      (4L, "el perro es un amigo y los gatos"),
      (5L, "你好世界数据引擎"),
      (6L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextStats.langId(docs)
      .select($"doc_id", $"predicted_lang").as[(Long, String)]
      .collect().toMap
    out shouldBe Map(1L -> "en", 2L -> "fr", 3L -> "de", 4L -> "es",
      5L -> "zh", 6L -> "und")
  }

  test("quality ratios on a crafted document") {
    import spark.implicits._
    // "ab3! cd" → 7 chars, 2 tokens, 4 alpha, 1 digit, 1 punct
    val out = TextStats.quality(Seq((1L, "ab3! cd")).toDF("doc_id", "text"))
      .collect().head
    out.getAs[Int]("n_tokens") shouldBe 2
    out.getAs[Double]("alpha_ratio") shouldBe 4.0 / 7 +- 1e-12
    out.getAs[Double]("digit_ratio") shouldBe 1.0 / 7 +- 1e-12
    out.getAs[Double]("punct_ratio") shouldBe 1.0 / 7 +- 1e-12
  }

  test("token counts: whitespace vs lexer tokens") {
    import spark.implicits._
    val out = TextStats.tokenCounts(
      Seq((1L, "ab 12 c!d")).toDF("doc_id", "text")).collect().head
    out.getAs[Int]("ws_tokens") shouldBe 3
    // lexer: ab | 12 | c | ! | d
    out.getAs[Int]("lex_tokens") shouldBe 5
  }

  test("fingerprint is stable under case and whitespace noise") {
    import spark.implicits._
    val out = TextStats.fingerprint(Seq(
      (1L, "Hello   World"),
      (2L, "  hello world "),
      (3L, "hello worlds")).toDF("doc_id", "text"))
      .select($"fingerprint").as[String].collect()
    out(0) shouldBe out(1)
    out(2) should not be out(0)
    out(0) should have length 16
  }
}
