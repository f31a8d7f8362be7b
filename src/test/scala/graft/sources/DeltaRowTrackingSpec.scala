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
  * verbs that cannot preserve row ids keep refusing by name. */
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

  test("refusals by name: CoW DML cannot preserve row ids; " +
    "readRowIds needs the feature; materialized tracking columns " +
    "refuse; deletion vectors still compose with row ids") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (0L until 6L).toDF("k").coalesce(1).sortWithinPartitions("k"), t)
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.readRowIds(spark, t)
    }.getMessage should include("rowTracking")
    DeltaInterop.enableRowTracking(spark, t)
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.delete(spark, t, col("k") === 1L)
    }.getMessage should include("rowTracking")
    // a DV delete is row-id-safe (files never rewrite)… but the
    // deleteMor path is gated the same conservative way for now —
    // the refusal is BY NAME either way, never silent corruption
    // materialized-column configs refuse the reader
    val t2 = fresh()
    DeltaInterop.write((0L until 3L).toDF("k"), t2)
    DeltaInterop.setProperties(spark, t2, Map(
      "delta.rowTracking.materializedRowIdColumnName" -> "_mat_rid"))
    DeltaInterop.enableRowTracking(spark, t2)
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.readRowIds(spark, t2)
    }.getMessage should include("materialized")
  }
}
