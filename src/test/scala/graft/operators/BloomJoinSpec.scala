package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.Tables

class BloomJoinSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bloom pre-filtered anti-join equals the plain anti-join exactly") {
    import spark.implicits._
    val left = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
    val right = Tables.customer(spark, sf).filter($"c_acctbal" > 5000.0)
    val bloomed = BloomJoin.preFilteredLeftAnti(left, right,
      "o_custkey", "c_custkey", estimatedRightRows = 10000L)
    val plain = left.join(right.select($"c_custkey"),
      $"o_custkey" === $"c_custkey", "left_anti")
    bloomed.count() shouldBe plain.count()
    bloomed.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(bloomed).count() shouldBe 0
    bloomed.count() should be > 0L // the check is not vacuous
  }

  test("empty right side returns every left row, not an empty result") {
    import spark.implicits._
    val left = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
    val right = Tables.customer(spark, sf).filter($"c_acctbal" > 1e18)
    right.count() shouldBe 0 // the anti-join excludes nothing
    BloomJoin.preFilteredLeftAnti(left, right, "o_custkey", "c_custkey")
      .count() shouldBe left.count()
  }

  test("same-named left/right keys join without ambiguity") {
    import spark.implicits._
    val left = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
    val right = Tables.orders(spark, sf)
      .filter($"o_orderkey" < 500).select($"o_custkey")
    val bloomed = BloomJoin.preFilteredLeftAnti(left, right,
      "o_custkey", "o_custkey", estimatedRightRows = 10000L)
    val plain = left.join(
      right.withColumnRenamed("o_custkey", "rk"),
      $"o_custkey" === $"rk", "left_anti")
    bloomed.count() shouldBe plain.count()
    graft.core.TransientCache.drain()
  }

  test("injected bloom functions are callable from SQL") {
    import spark.implicits._
    Tables.customer(spark, sf).createOrReplaceTempView("bloom_spec_c")
    // might_contain requires a constant or SCALAR SUBQUERY bloom input
    val hits = spark.sql(
      """SELECT count(*) FROM bloom_spec_c
        |WHERE might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(c_custkey)) FROM bloom_spec_c),
        |  xxhash64(c_custkey))""".stripMargin)
      .as[Long].collect().head
    // no false NEGATIVES ever: every real key must hit
    hits shouldBe Tables.customer(spark, sf).count()
  }
}
