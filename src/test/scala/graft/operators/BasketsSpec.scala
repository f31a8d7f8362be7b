package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class BasketsSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("frequent pairs: hand-computed support/confidence/lift; " +
    "within-basket duplicates dedup; sub-threshold pairs absent") {
    import spark.implicits._
    // baskets: {1,2} ×3, {1,3} ×1, {2,3} ×1, plus a dup of item 1 in b1
    val rows = Seq(
      (1L, 10L), (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (4L, 10L), (4L, 30L),
      (5L, 20L), (5L, 30L)).toDF("basket", "item")
    val out = Baskets.frequentPairs(rows, minSupport = 2L)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect()
    out.length shouldBe 1 // only (10,20) reaches support 2; others are 1
    val (pa, pb, nab, na, nb, cab, cba, lift) = out.head
    (pa, pb, nab) shouldBe ((10L, 20L, 3L))
    na shouldBe 4L // item 10 in baskets 1-4 (the dup counted once)
    nb shouldBe 4L // item 20 in baskets 1,2,3,5
    cab shouldBe 3.0 / 4.0
    cba shouldBe 3.0 / 4.0
    lift shouldBe (3.0 * 5.0) / (4.0 * 4.0) // N = 5 baskets
  }

  test("frequentPairIds emits exactly frequentPairs' (pa, pb) edge set " +
    "— the projected fast path never changes which pairs qualify") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 20L), (3L, 30L),
      (4L, 10L), (4L, 30L),
      (5L, 20L), (5L, 30L)).toDF("basket", "item")
    val full = Baskets.frequentPairs(rows, minSupport = 2L)
      .select("pa", "pb").as[(Long, Long)].collect().sorted
    val ids = Baskets.frequentPairIds(rows, minSupport = 2L)
      .as[(Long, Long)].collect().sorted
    ids shouldBe full
    ids should contain ((20L, 30L))
  }
}
