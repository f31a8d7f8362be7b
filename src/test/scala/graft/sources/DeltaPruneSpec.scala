package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins Delta partition pruning: readWhere drops add actions whose
  * recorded partitionValues prove no match (equality, closed ranges,
  * recorded nulls), fails open on everything undecodable, and always
  * applies the exact residual — `read(...).filter(...)` semantics from
  * fewer files. */
class DeltaPruneSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def names(df: org.apache.spark.sql.DataFrame): Int =
    df.inputFiles.length

  test("string and date partitions prune equality and ranges; nulls " +
    "prune; non-partition predicates fail open with exact residual") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val t = fresh("graft-dpr")
    // one file per (region, day): 2 regions × 2 days + a null region
    DeltaInterop.write(Seq(
      (1L, "emea", d("2024-01-01")),
      (2L, "emea", d("2024-01-02")),
      (3L, "apac", d("2024-01-01")),
      (4L, "apac", d("2024-01-02")),
      (5L, null.asInstanceOf[String], d("2024-01-03")))
      .toDF("id", "region", "day"), t, partitionBy = Seq("region", "day"))
    DeltaInterop.read(spark, t).count() shouldBe 5L
    // equality on region: only emea files scanned, null row pruned
    val emea = DeltaInterop.readWhere(spark, t, Seq(ScanEq("region", "emea")))
    names(emea) shouldBe 2
    emea.select($"id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    // closed date range: one day across regions (null-region day-03
    // file prunes by range)
    val day1 = DeltaInterop.readWhere(spark, t, Seq(ScanBetween("day",
      java.time.LocalDate.parse("2024-01-01"),
      java.time.LocalDate.parse("2024-01-01"))))
    names(day1) shouldBe 2
    day1.select($"id").as[Long].collect().sorted shouldBe Array(1L, 3L)
    // both predicates compose: one file
    val one = DeltaInterop.readWhere(spark, t, Seq(
      ScanEq("region", "apac"), ScanEq("day", d("2024-01-02"))))
    names(one) shouldBe 1
    one.select($"id").as[Long].collect() shouldBe Array(4L)
    // a non-partition predicate never prunes, residual exact
    val byId = DeltaInterop.readWhere(spark, t, Seq(ScanEq("id", 5L)))
    names(byId) shouldBe 5
    byId.select($"region").as[String].collect() shouldBe Array(null)
  }

  test("SQL WHERE prunes through the DeltaSqlRule: equality and " +
    "range conjuncts drop add actions, the original filter stays, " +
    "VERSION AS OF composes") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val t = fresh("graft-dpr-sql")
    DeltaInterop.write(Seq(
      (1L, "emea", d("2024-01-01")),
      (2L, "apac", d("2024-01-01")),
      (3L, "emea", d("2024-01-02")))
      .toDF("id", "region", "day"), t, partitionBy = Seq("region", "day"))
    DeltaSql.register("dprsql", t)
    val q = spark.sql(
      """SELECT id FROM graft_delta.dprsql
        |WHERE region = 'emea'
        |  AND day >= DATE '2024-01-02' AND day <= DATE '2024-01-02'"""
        .stripMargin)
    q.inputFiles.length shouldBe 1
    q.as[Long].collect() shouldBe Array(3L)
    // time travel composes with the filter pre-pass
    DeltaInterop.write(Seq((4L, "emea", d("2024-01-03")))
      .toDF("id", "region", "day"), t, partitionBy = Seq("region", "day"))
    val v0 = spark.sql(
      """SELECT id FROM graft_delta.dprsql VERSION AS OF 0
        |WHERE region = 'emea'""".stripMargin)
    v0.inputFiles.length shouldBe 2
    v0.as[Long].collect().sorted shouldBe Array(1L, 3L)
  }

  test("timestamp partitions decode in the session zone — prune " +
    "verdicts agree with the reconstructed column, and time travel " +
    "composes with pruning") {
    import spark.implicits._
    import java.time.Instant
    def ts(s: String) = java.sql.Timestamp.from(Instant.parse(s))
    val t = fresh("graft-dpr-ts")
    DeltaInterop.write(Seq(
      (1L, ts("2024-05-01T00:00:00Z")),
      (2L, ts("2024-05-02T12:30:00Z")))
      .toDF("id", "hr"), t, partitionBy = Seq("hr"))
    val q = DeltaInterop.readWhere(spark, t, Seq(ScanBetween("hr",
      Instant.parse("2024-05-02T00:00:00Z"),
      Instant.parse("2024-05-02T23:59:59Z"))))
    names(q) shouldBe 1
    q.select($"id").as[Long].collect() shouldBe Array(2L)
    // version 0 still serves both, pruned the same way
    DeltaInterop.write(Seq((3L, ts("2024-05-03T00:00:00Z")))
      .toDF("id", "hr"), t, partitionBy = Seq("hr"))
    val v0 = DeltaInterop.readWhere(spark, t, Seq(ScanBetween("hr",
      Instant.parse("2024-05-01T00:00:00Z"),
      Instant.parse("2024-05-02T23:59:59Z"))), version = Some(0L))
    v0.select($"id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    // head read prunes the new file in when in range
    DeltaInterop.readWhere(spark, t, Seq(ScanEq("hr",
        Instant.parse("2024-05-03T00:00:00Z"))))
      .select($"id").as[Long].collect() shouldBe Array(3L)
  }
}
