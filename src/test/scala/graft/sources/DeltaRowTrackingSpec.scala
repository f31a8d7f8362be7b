package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Delta ROW TRACKING, write side: [[DeltaInterop.enableRowTracking]]
  * upgrades to writer 7 (`rowTracking` + `domainMetadata`), BACKFILLS
  * every live file's `baseRowId`/`defaultRowCommitVersion`, and
  * publishes the `delta.rowTracking` domain's high-water mark;
  * appends assign fresh ranges past it; [[DeltaInterop.readRowIds]]
  * serves `_row_id`/`_row_commit_version` as `baseRowId + position`;
  * CHECKPOINTS preserve both the domain and the per-file assignment;
  * every rewriting verb (CoW UPDATE/MERGE, MOR UPDATE, OPTIMIZE)
  * MATERIALIZES carried ids under the recorded column names. */
class DeltaRowTrackingSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-delta-rt")
      .toString + "/t"

  private def col(n: String) = org.apache.spark.sql.functions.col(n)

  test("enable backfills live files, appends assign fresh ranges, " +
    "readRowIds serves baseRowId + position, the domain tracks the " +
    "high-water mark, and re-enabling never reassigns") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (0L until 5L).toDF("k").coalesce(1).sortWithinPartitions("k"), t)
    DeltaInterop.enableRowTracking(spark, t) // version 1: backfill
    val st1 = DeltaInterop.state(spark, t, None)
    st1.minWriterVersion shouldBe 7
    st1.writerFeatures should contain allOf ("rowTracking",
      "domainMetadata")
    st1.configuration.get("delta.enableRowTracking") shouldBe
      Some("true")
    st1.domains.keySet should contain("delta.rowTracking")
    st1.files.flatMap(_.baseRowId) shouldBe Seq(0L)
    st1.files.flatMap(_.defaultRowCommitVersion) shouldBe Seq(1L)
    DeltaInterop.write(
      (5L until 8L).toDF("k").coalesce(1).sortWithinPartitions("k"), t)
    val ids = DeltaInterop.readRowIds(spark, t)
      .select($"k", $"_row_id", $"_row_commit_version")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    ids.map(r => (r._1, r._2)) shouldBe (0L until 8L).map(i => (i, i))
    ids.map(_._3) shouldBe Seq(1L, 1L, 1L, 1L, 1L, 2L, 2L, 2L)
    // re-enabling is a no-op for assigned files
    DeltaInterop.enableRowTracking(spark, t)
    DeltaInterop.readRowIds(spark, t)
      .select($"k", $"_row_id").as[(Long, Long)]
      .collect().toMap shouldBe (0L until 8L).map(i => i -> i).toMap
  }

  test("CHECKPOINT preserves the row-tracking domain and per-file " +
    "assignment (classic and v2 forms); replay-from-checkpoint " +
    "serves the same row ids") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (0L until 6L).toDF("k").coalesce(1).sortWithinPartitions("k"), t)
    DeltaInterop.enableRowTracking(spark, t)
    DeltaInterop.write(
      (6L until 9L).toDF("k").coalesce(1).sortWithinPartitions("k"), t)
    DeltaInterop.checkpoint(spark, t) // no longer refuses domains
    val st = DeltaInterop.state(spark, t, None)
    st.domains.keySet should contain("delta.rowTracking")
    st.domains("delta.rowTracking") should include("rowIdHighWaterMark")
    st.files.flatMap(_.baseRowId).sorted shouldBe Seq(0L, 6L)
    DeltaInterop.readRowIds(spark, t)
      .select($"k", $"_row_id").as[(Long, Long)]
      .collect().toMap shouldBe (0L until 9L).map(i => i -> i).toMap
    // append AFTER the checkpoint: the domain replayed from the
    // checkpoint feeds the next assignment
    DeltaInterop.write(Seq(9L).toDF("k"), t)
    DeltaInterop.readRowIds(spark, t)
      .select($"k", $"_row_id").as[(Long, Long)]
      .collect().toMap shouldBe (0L until 10L).map(i => i -> i).toMap
    // v2 form
    val t2 = fresh()
    DeltaInterop.write(
      (0L until 4L).toDF("k").coalesce(1).sortWithinPartitions("k"), t2)
    DeltaInterop.enableRowTracking(spark, t2)
    DeltaInterop.enableV2Checkpoints(spark, t2)
    DeltaInterop.checkpoint(spark, t2)
    val st2 = DeltaInterop.state(spark, t2, None)
    st2.domains.keySet should contain("delta.rowTracking")
    DeltaInterop.readRowIds(spark, t2)
      .select($"k", $"_row_id").as[(Long, Long)]
      .collect().toMap shouldBe (0L until 4L).map(i => i -> i).toMap
  }

  test("the DV DELETE is row-id-safe (files never rewrite, the " +
    "re-add carries the assignment); CoW UPDATE materializes carried " +
    "ids; readRowIds needs the feature") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (0L until 6L).toDF("k").coalesce(1).sortWithinPartitions("k"), t)
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.readRowIds(spark, t)
    }.getMessage should include("rowTracking")
    DeltaInterop.enableRowTracking(spark, t)
    // DELETE attaches a deletion vector — survivors keep their ids
    // (row_index is the PHYSICAL position, stable under vectors)
    DeltaInterop.delete(spark, t, col("k") === 1L)
    DeltaInterop.readRowIds(spark, t)
      .select($"k", $"_row_id").as[(Long, Long)]
      .collect().toMap shouldBe
      (0L until 6L).filter(_ != 1L).map(i => i -> i).toMap
    // a second delete merges vectors; ids still stable
    DeltaInterop.delete(spark, t, col("k") === 4L)
    DeltaInterop.readRowIds(spark, t)
      .select($"k", $"_row_id").as[(Long, Long)]
      .collect().toMap shouldBe
      Map(0L -> 0L, 2L -> 2L, 3L -> 3L, 5L -> 5L)
    // the CoW UPDATE rewrites the touched file with MATERIALIZED
    // ids: the fired row keeps its id and takes the commit's version,
    // bystanders in the same file keep both
    DeltaInterop.update(spark, t, col("k") === 2L,
      Seq("k" -> org.apache.spark.sql.functions.lit(20L)))
    val afterU = DeltaInterop.readRowIds(spark, t)
    afterU.filter($"k" === 20L).select($"_row_id").as[Long]
      .head() shouldBe 2L
    afterU.filter($"k" === 3L).select($"_row_id", $"_row_commit_version")
      .as[(Long, Long)].head() shouldBe ((3L, 1L))
  }

  test("SHALLOW CLONE carries the assignments and the domain: the " +
    "clone serves the source's row ids and allocates past them") {
    import spark.implicits._
    val t = fresh()
    val c = fresh()
    DeltaInterop.write(
      (0L until 6L).toDF("k").coalesce(1).sortWithinPartitions("k"), t)
    DeltaInterop.enableRowTracking(spark, t)
    DeltaInterop.shallowClone(spark, t, c)
    DeltaInterop.readRowIds(spark, c)
      .select($"k", $"_row_id").as[(Long, Long)]
      .collect().toMap shouldBe (0L until 6L).map(i => i -> i).toMap
    DeltaInterop.state(spark, c, None)
      .domains.keySet should contain("delta.rowTracking")
    DeltaInterop.write(Seq(10L).toDF("k"), c)
    DeltaInterop.readRowIds(spark, c).filter($"k" === 10L)
      .select($"_row_id").as[Long].head() should be >= 6L
  }

  test("row tracking composes with COLUMN MAPPING: materialized " +
    "columns ride the physical scan and a mapped MOR update carries") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (0L until 5L).map(k => (k, k)).toDF("k", "v")
        .coalesce(1).sortWithinPartitions("k"), t,
      columnMapping = "name")
    DeltaInterop.enableRowTracking(spark, t)
    DeltaInterop.updateMor(spark, t, col("k") === 2L,
      Seq("v" -> org.apache.spark.sql.functions.lit(200L)))
    val out = DeltaInterop.readRowIds(spark, t)
    out.filter($"k" === 2L).select($"v", $"_row_id")
      .as[(Long, Long)].head() shouldBe ((200L, 2L))
    out.select($"k", $"_row_id").as[(Long, Long)]
      .collect().toMap shouldBe (0L until 5L).map(i => i -> i).toMap
  }

  test("MOR UPDATE materializes carried ids (twice) and bumps the " +
    "row's commit version; OPTIMIZE preserves materialized AND " +
    "inherited ids; later appends never collide") {
    import spark.implicits._
    val lit0 = org.apache.spark.sql.functions.lit _
    val t = fresh()
    DeltaInterop.write(
      (0L until 8L).map(k => (k, k)).toDF("k", "v")
        .coalesce(1).sortWithinPartitions("k"), t)
    DeltaInterop.enableRowTracking(spark, t) // version 1: ids 0..7
    DeltaInterop.updateMor(spark, t, col("k") === 3L,
      Seq("v" -> lit0(300L))) // version 2
    val a = DeltaInterop.readRowIds(spark, t)
    a.filter($"k" === 3L)
      .select($"v", $"_row_id", $"_row_commit_version")
      .as[(Long, Long, Long)].head() shouldBe ((300L, 3L, 2L))
    a.filter($"k" === 5L)
      .select($"_row_id", $"_row_commit_version")
      .as[(Long, Long)].head() shouldBe ((5L, 1L))
    // second update over the materialized image carries again
    DeltaInterop.updateMor(spark, t, col("k") === 3L,
      Seq("v" -> lit0(301L))) // version 3
    DeltaInterop.readRowIds(spark, t).filter($"k" === 3L)
      .select($"v", $"_row_id", $"_row_commit_version")
      .as[(Long, Long, Long)].head() shouldBe ((301L, 3L, 3L))
    // OPTIMIZE compacts the DV-less image files, materializing
    // resolved ids — nothing moves
    DeltaInterop.optimize(spark, t)
    val b = DeltaInterop.readRowIds(spark, t)
    b.select($"k", $"_row_id").as[(Long, Long)]
      .collect().toMap shouldBe (0L until 8L).map(i => i -> i).toMap
    b.filter($"k" === 3L).select($"_row_commit_version")
      .as[Long].head() shouldBe 3L
    // appended rows take a fresh range past everything assigned
    DeltaInterop.write(Seq((100L, 100L)).toDF("k", "v"), t)
    val ids = DeltaInterop.readRowIds(spark, t)
      .select($"_row_id").as[Long].collect()
    ids.distinct.length shouldBe ids.length
    DeltaInterop.readRowIds(spark, t).filter($"k" === 100L)
      .select($"_row_id").as[Long].head() should be >= 8L
    // MERGE carries too: the matched row keeps its id, the insert
    // inherits a fresh one, bystanders in the rewritten file keep
    DeltaInterop.merge(
      Seq((3L, 999L), (200L, 200L)).toDF("k", "v"), t, Seq("k"))
    val m = DeltaInterop.readRowIds(spark, t)
    m.filter($"k" === 3L).select($"v", $"_row_id")
      .as[(Long, Long)].head() shouldBe ((999L, 3L))
    m.filter($"k" === 5L).select($"_row_id").as[Long].head() shouldBe 5L
    val mi = m.select($"_row_id").as[Long].collect()
    mi.distinct.length shouldBe mi.length
  }
}
