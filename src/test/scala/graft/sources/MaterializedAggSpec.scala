package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the incremental-view-maintenance contract: the materialized
  * aggregate equals a from-scratch re-aggregation after every refresh,
  * refreshes are idempotent and resumable via the recorded source
  * version, mismatched view definitions are rejected, and emptied
  * groups leave the view. */
class MaterializedAggSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-mv-$name").toString + "/t"

  private def recompute(source: String) =
    ManifestLake.read(spark, source)
      .groupBy("k")
      .agg(sum(col("v").cast("decimal(27,2)")).cast("decimal(27,2)")
        .as("v_sum"), count(lit(1)).as("n_rows"))

  private def viewRows(agg: String) =
    ManifestLake.read(spark, agg).select("k", "v_sum", "n_rows")
      .collect().map(r => (r.getLong(0), r.getDecimal(1).toPlainString,
        r.getLong(2))).toSet

  private def expectEqual(source: String, agg: String): Unit =
    viewRows(agg) shouldBe recompute(source)
      .collect().map(r => (r.getLong(0), r.getDecimal(1).toPlainString,
        r.getLong(2))).toSet

  test("the view equals a from-scratch re-aggregation across initial " +
    "build, appends, CDC-recorded merge/delete/update, and is " +
    "idempotent at head") {
    import spark.implicits._
    val src = fresh("src")
    val agg = fresh("agg")
    ManifestLake.write(
      (1 to 100).map(i => (i.toLong, (i % 5).toLong, i * 1.0))
        .toDF("id", "k", "v"), src)

    val v1 = MaterializedAgg.refresh(spark, src, agg,
      Seq("k"), Seq("v"))
    v1 shouldBe 1L
    expectEqual(src, agg)

    // append + recorded merge + recorded delete + recorded update
    ManifestLake.write(
      Seq((101L, 7L, 10.5), (102L, 7L, 2.25)).toDF("id", "k", "v"), src)
    ManifestLake.merge(
      Seq((1L, 0L, 999.0), (200L, 8L, 1.0)).toDF("id", "k", "v"),
      src, Seq("id"), recordChangeFeed = true)
    ManifestLake.delete(spark, src, col("id") <= 10L,
      recordChangeFeed = true)
    ManifestLake.update(spark, src, col("id") === 50L,
      Seq("v" -> lit(123.75)), recordChangeFeed = true)

    val v2 = MaterializedAgg.refresh(spark, src, agg, Seq("k"), Seq("v"))
    v2 shouldBe ManifestLake.currentVersion(spark, src).get
    expectEqual(src, agg)

    // at head: no new version committed
    val aggVer = ManifestLake.currentVersion(spark, agg)
    MaterializedAgg.refresh(spark, src, agg, Seq("k"), Seq("v")) shouldBe v2
    ManifestLake.currentVersion(spark, agg) shouldBe aggVer
  }

  test("a group whose rows are all deleted leaves the view") {
    import spark.implicits._
    val src = fresh("zero")
    val agg = fresh("zeroagg")
    ManifestLake.write(
      Seq((1L, 1L, 5.0), (2L, 1L, 6.0), (3L, 2L, 7.0))
        .toDF("id", "k", "v"), src)
    MaterializedAgg.refresh(spark, src, agg, Seq("k"), Seq("v"))
    ManifestLake.delete(spark, src, col("k") === 1L,
      recordChangeFeed = true)
    MaterializedAgg.refresh(spark, src, agg, Seq("k"), Seq("v"))
    viewRows(agg).map(_._1) shouldBe Set(2L)
  }

  test("incremental distinct: the pair table tracks multiplicities — " +
    "deleting one duplicate keeps the value, deleting the last drops " +
    "it, NULLs never count, and the count equals a from-scratch " +
    "COUNT DISTINCT after every refresh") {
    import spark.implicits._
    val src = fresh("dsrc")
    val pair = fresh("dpair")
    def expectDistinct(): Unit = {
      val served = MaterializedAgg.distinctCounts(spark, pair,
        Seq("k"), "u")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val scratch = ManifestLake.read(spark, src).groupBy("k")
        .agg(count_distinct(col("u")).as("d"), count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      served shouldBe scratch
    }
    // k=1: users 10 (×2), 11; k=2: user 20, plus a NULL user
    ManifestLake.write(
      Seq((1L, 1L, Some(10L)), (2L, 1L, Some(10L)), (3L, 1L, Some(11L)),
        (4L, 2L, Some(20L)), (5L, 2L, Option.empty[Long]))
        .toDF("id", "k", "u"), src)
    MaterializedAgg.refreshDistinct(spark, src, pair, Seq("k"), "u")
      .shouldBe(1L)
    expectDistinct()
    MaterializedAgg.distinctCounts(spark, pair, Seq("k"), "u")
      .where(col("k") === 2L).select("n_distinct", "n_rows")
      .as[(Long, Long)].head() shouldBe ((1L, 2L))
    // delete ONE of user 10's two rows: the value stays counted
    ManifestLake.delete(spark, src, col("id") === 1L,
      recordChangeFeed = true)
    MaterializedAgg.refreshDistinct(spark, src, pair, Seq("k"), "u")
    expectDistinct()
    // delete the LAST row of user 10: the value leaves the count
    ManifestLake.delete(spark, src, col("id") === 2L,
      recordChangeFeed = true)
    // and an update MOVES a pair: user 20 becomes user 21
    ManifestLake.update(spark, src, col("id") === 4L,
      Seq("u" -> lit(21L)), recordChangeFeed = true)
    val head = MaterializedAgg.refreshDistinct(spark, src, pair,
      Seq("k"), "u")
    expectDistinct()
    // idempotent at head: no new pair-table version
    val pv = ManifestLake.currentVersion(spark, pair)
    MaterializedAgg.refreshDistinct(spark, src, pair, Seq("k"), "u")
      .shouldBe(head)
    ManifestLake.currentVersion(spark, pair) shouldBe pv
    // the pair table is guarded against the SUM view's definition
    intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, src, pair, Seq("k"), Seq("u"))
    }.getMessage should include("different view definition")
  }

  test("refreshing a view table with a different definition OR a " +
    "different source is rejected") {
    import spark.implicits._
    val src = fresh("def")
    val agg = fresh("defagg")
    ManifestLake.write(Seq((1L, 1L, 5.0)).toDF("id", "k", "v"), src)
    MaterializedAgg.refresh(spark, src, agg, Seq("k"), Seq("v"))
    intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, src, agg, Seq("id"), Seq("v"))
    }.getMessage should include("different view definition")
    // same shape, different source: the recorded version would be
    // interpreted against the wrong version sequence
    val other = fresh("othersrc")
    ManifestLake.write(Seq((9L, 1L, 1.0)).toDF("id", "k", "v"), other)
    intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, other, agg, Seq("k"), Seq("v"))
    }.getMessage should include("different view definition")
  }

  test("an all-NULL sum group stays NULL across refreshes that touch " +
    "other groups (SQL SUM semantics, not 0)") {
    import spark.implicits._
    val src = fresh("nullsum")
    val agg = fresh("nullsumagg")
    ManifestLake.write(
      Seq((1L, 1L, Option.empty[Double]), (2L, 1L, Option.empty[Double]),
        (3L, 2L, Some(4.0))).toDF("id", "k", "v"), src)
    MaterializedAgg.refresh(spark, src, agg, Seq("k"), Seq("v"))
    // touch ONLY group 2; group 1's stored NULL must survive the rebuild
    ManifestLake.write(Seq((4L, 2L, Some(1.0))).toDF("id", "k", "v"), src)
    MaterializedAgg.refresh(spark, src, agg, Seq("k"), Seq("v"))
    val rows = ManifestLake.read(spark, agg)
      .select("k", "v_sum", "n_rows").collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getDecimal(1)).map(_.toPlainString), r.getLong(2))))
      .toMap
    rows(1L) shouldBe ((None, 2L))
    rows(2L) shouldBe ((Some("5.00"), 2L))
  }

  test("the FULL mv1 gate chain is deterministic: two independent runs " +
    "in one session produce bit-identical rows with every " +
    "incr_matches_scratch flag true") {
    // Executes the exact driver-gate computation twice against separate
    // table dirs (LakeQueries memoizes per (JVM, dataset), so the gate
    // itself runs the build once — this pins what a SECOND driver run
    // would have produced) and asserts the emitted rows, flags
    // included, are identical byte for byte.
    val d = "/root/testdata/sf0.001"
    def runChain(): Set[(Int, String, Long, Boolean)] = {
      val src = fresh("mv1src")
      val agg = fresh("mv1agg")
      ManifestLake.writeClustered(
        graft.core.Tables.customer(spark, d)
          .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
            "c_mktsegment"),
        src, "c_custkey", nFiles = 8, extraStatsCols = Seq("c_acctbal"))
      MaterializedAgg.refresh(spark, src, agg,
        Seq("c_nationkey"), Seq("c_acctbal"))
      ManifestLake.merge(LakeQueries.lk2Updates(spark, d), src,
        Seq("c_custkey"), statsCol = Some("c_custkey"),
        recordChangeFeed = true)
      ManifestLake.delete(spark, src, col("c_acctbal") < 0,
        recordChangeFeed = true)
      MaterializedAgg.refresh(spark, src, agg,
        Seq("c_nationkey"), Seq("c_acctbal"))
      val view = ManifestLake.read(spark, agg)
        .select("c_nationkey", "c_acctbal_sum", "n_rows")
      val scratch = ManifestLake.read(spark, src)
        .groupBy("c_nationkey")
        .agg(sum(col("c_acctbal").cast("decimal(27,2)"))
          .cast("decimal(27,2)").as("s_sum"),
          count(lit(1)).as("s_n"))
      view.join(scratch, Seq("c_nationkey"), "full_outer")
        .select(col("c_nationkey"), col("c_acctbal_sum"), col("n_rows"),
          ((col("c_acctbal_sum") <=> col("s_sum")) &&
            (col("n_rows") <=> col("s_n"))).as("ok"))
        .collect()
        .map(r => (r.getInt(0), r.getDecimal(1).toPlainString,
          r.getLong(2), r.getBoolean(3))).toSet
    }
    val first = runChain()
    val second = runChain()
    first shouldBe second
    all(first.toSeq.map(_._4)) shouldBe true
    first.size should be > 0
  }

  test("null group keys maintain one row, not a duplicate per refresh") {
    import spark.implicits._
    val src = fresh("nullk")
    val agg = fresh("nullkagg")
    ManifestLake.write(
      Seq((1L, Option.empty[Long], 5.0), (2L, Some(1L), 6.0))
        .toDF("id", "k", "v"), src)
    MaterializedAgg.refresh(spark, src, agg, Seq("k"), Seq("v"))
    ManifestLake.write(
      Seq((3L, Option.empty[Long], 2.0)).toDF("id", "k", "v"), src)
    MaterializedAgg.refresh(spark, src, agg, Seq("k"), Seq("v"))
    val rows = ManifestLake.read(spark, agg)
      .select("k", "v_sum", "n_rows").collect()
      .map(r => (Option(r.get(0)), r.getDecimal(1).toPlainString,
        r.getLong(2))).toSet
    rows shouldBe Set((None, "7.00", 2L), (Some(1L), "6.00", 1L))
  }

  test("streaming maintenance: two AvailableNow passes over one " +
    "checkpoint track initial load + CDC DML without re-emitting " +
    "version 1, and the view equals a re-aggregation") {
    import spark.implicits._
    val src = fresh("st-src")
    val agg = fresh("st-agg")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-mv-st-ckpt").toString
    ManifestLake.write(
      (1 to 100).map(i => (i.toLong, (i % 5).toLong, i * 1.0))
        .toDF("id", "k", "v"), src)
    def drain(): Unit =
      MaterializedAgg.stream(spark, src, agg, Seq("k"), Seq("v"), ckpt)
        .awaitTermination()
    drain()
    expectEqual(src, agg)
    // DML lands while the stream is down; the resumed stream must apply
    // ONLY the two new versions — a version-1 re-emission would double
    // every original group's sums (expectEqual would catch it)
    ManifestLake.merge(
      Seq((1L, 0L, 999.0), (200L, 8L, 1.0)).toDF("id", "k", "v"),
      src, Seq("id"), recordChangeFeed = true)
    ManifestLake.delete(spark, src, col("id") <= 10L,
      recordChangeFeed = true)
    drain()
    expectEqual(src, agg)
    // draining at head commits nothing (no phantom versions)
    val aggVer = ManifestLake.currentVersion(spark, agg)
    drain()
    ManifestLake.currentVersion(spark, agg) shouldBe aggVer
  }

  test("a replayed foreachBatch commits nothing (the at-least-once " +
    "retry after a sink-side crash), and a definition mismatch is " +
    "refused by name") {
    import spark.implicits._
    val src = fresh("rp-src")
    val agg = fresh("rp-agg")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-mv-rp-ckpt").toString
    ManifestLake.write(
      Seq((1L, 1L, 5.0), (2L, 2L, 6.0)).toDF("id", "k", "v"), src)
    MaterializedAgg.stream(spark, src, agg, Seq("k"), Seq("v"), ckpt)
      .awaitTermination()
    val appId = ManifestLake.snapshot(spark, agg).appId.get
    appId should endWith(":stream")
    val before = ManifestLake.currentVersion(spark, agg)
    // replay batch 0's change rows by hand: the guard must skip them
    val replayRows = ManifestLake.changeFeed(spark, src, 0L, 1L)
    MaterializedAgg.applyStreamBatch(replayRows, agg, Seq("k"), Seq("v"),
      appId, batchId = 0L) shouldBe false
    ManifestLake.currentVersion(spark, agg) shouldBe before
    expectEqual(src, agg)
    // a BATCH refresh of a stream-maintained view is a different
    // definition: the guard names the mismatch instead of misreading
    // stream batch ids as source versions
    val ex = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, src, agg, Seq("k"), Seq("v"))
    }
    ex.getMessage should include("different view definition")
  }
}
