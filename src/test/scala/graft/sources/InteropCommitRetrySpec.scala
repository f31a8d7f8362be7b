package graft.sources

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Commit-conflict AUTO-RETRY on both open-format interops (the
  * ManifestLake `commitAppendWithRebase` discipline): a blind append
  * that loses the version race re-resolves the winner's state,
  * re-proves its obligations, and retries at the next version — both
  * writers' rows land with zero client redo. Rebases that cannot be
  * proven safe (schema changed, spec changed, field ids renumbered,
  * identity allocation baked in, sink-owned txn/streamMark stamps,
  * overwrites) keep RAISING the named conflict, with staged files
  * cleaned up. Races are deterministic via each interop's
  * commitRaceHook seam. */
class InteropCommitRetrySpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-retry").toString + "/t"

  // ------------------------------------------------------------- Delta

  test("Delta: an append losing the race to a concurrent append " +
    "auto-retries and lands at the next version — both writers' rows " +
    "land, no client redo") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), t)
    DeltaInterop.commitRaceHook.set(() =>
      DeltaInterop.write(Seq((100L, 100L)).toDF("id", "v"), t): Unit)
    DeltaInterop.write(Seq((200L, 200L)).toDF("id", "v"), t)
    val st = DeltaInterop.state(spark, t, None)
    st.version shouldBe 2L
    DeltaInterop.read(spark, t).count() shouldBe 12L
    DeltaInterop.read(spark, t).filter(col("id") >= 100L)
      .count() shouldBe 2L
  }

  test("Delta: a retry re-proves the winner's NEW constraints on the " +
    "staged files; a violation aborts with nothing landed") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), t)
    DeltaInterop.commitRaceHook.set(() =>
      DeltaInterop.addCheckConstraint(spark, t, "small_v", "v < 50"))
    intercept[DeltaWriteGate.DeltaConstraintViolationException](
      DeltaInterop.write(Seq((200L, 200L)).toDF("id", "v"), t))
      .getMessage should include("small_v")
    DeltaInterop.read(spark, t).count() shouldBe 10L
    // a conforming append retries straight through the same race
    DeltaInterop.commitRaceHook.set(() =>
      DeltaInterop.write(Seq((100L, 10L)).toDF("id", "v"), t): Unit)
    DeltaInterop.write(Seq((201L, 20L)).toDF("id", "v"), t)
    DeltaInterop.read(spark, t).count() shouldBe 12L
  }

  test("Delta: losing to a SCHEMA-CHANGING commit refuses by name " +
    "with staged files cleaned; overwrites never auto-retry") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), t)
    DeltaInterop.commitRaceHook.set(() =>
      DeltaInterop.addColumns(spark, t,
        Seq(StructField("w", LongType))))
    val e = intercept[DeltaInterop.ConcurrentDeltaCommitException](
      DeltaInterop.write(Seq((200L, 200L)).toDF("id", "v"), t))
    e.getMessage should include("changed the schema")
    DeltaInterop.read(spark, t).count() shouldBe 10L
    // no orphaned parquet: every file under the root is a live one
    val st = DeltaInterop.state(spark, t, None)
    val root = new org.apache.hadoop.fs.Path(t)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles(p: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) {
          if (s.getPath.getName == "_delta_log") Nil
          else dataFiles(s.getPath)
        } else if (s.getPath.getName.endsWith(".parquet"))
          Seq(s.getPath.getName)
        else Nil
      }
    dataFiles(root).sorted shouldBe
      st.files.map(a => new org.apache.hadoop.fs.Path(a.path).getName)
        .sorted
    // overwrite: the named conflict raises, no retry
    DeltaInterop.commitRaceHook.set(() =>
      DeltaInterop.write(Seq((300L, 1L, 1L)).toDF("id", "v", "w"), t): Unit)
    intercept[DeltaInterop.ConcurrentDeltaCommitException](
      DeltaInterop.write(Seq((400L, 2L, 2L)).toDF("id", "v", "w"), t,
        overwrite = true))
  }

  test("Delta ROW TRACKING: the retry re-allocates row-id ranges past " +
    "the winner's high-water mark — no id collides") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), t)
    DeltaInterop.enableRowTracking(spark, t)
    DeltaInterop.commitRaceHook.set(() =>
      DeltaInterop.write(
        (100L to 104L).map(i => (i, i)).toDF("id", "v"), t): Unit)
    DeltaInterop.write(
      (200L to 204L).map(i => (i, i)).toDF("id", "v"), t)
    val out = DeltaInterop.readRowIds(spark, t)
    out.count() shouldBe 20L
    out.select("_row_id").distinct().count() shouldBe 20L
  }

  // ----------------------------------------------------------- Iceberg

  test("Iceberg: an append losing the race to a concurrent append " +
    "auto-retries — both writers' rows land, no client redo") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 10L).toDF("id"), t)
    IcebergInterop.commitRaceHook.set(() =>
      IcebergInterop.write(Seq(100L).toDF("id"), t): Unit)
    IcebergInterop.write(Seq(200L).toDF("id"), t)
    IcebergInterop.read(spark, t).count() shouldBe 12L
    IcebergInterop.read(spark, t).filter(col("id") >= 100L)
      .count() shouldBe 2L
  }

  test("Iceberg: losing to a schema-changing commit refuses by name " +
    "with staged files cleaned; v3 retries take the winner's " +
    "next-row-id — no row id collides") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 10L).toDF("id"), t)
    IcebergInterop.commitRaceHook.set(() =>
      IcebergInterop.addColumn(spark, t, "w", LongType))
    intercept[IcebergInterop.ConcurrentIcebergCommitException](
      IcebergInterop.write(Seq(200L).toDF("id"), t))
      .getMessage should include("changed the schema")
    IcebergInterop.read(spark, t).count() shouldBe 10L
    // no orphaned parquet under data/
    val st = IcebergInterop.state(spark, t, None)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(new org.apache.hadoop.fs.Path(t, "data"))
      .count(_.getPath.getName.endsWith(".parquet")) shouldBe
      st.files.size

    // v3 lineage through the retry
    val t2 = fresh()
    IcebergInterop.write((0L until 5L).toDF("id").coalesce(1), t2)
    IcebergInterop.upgradeFormat(spark, t2)
    IcebergInterop.upgradeFormat(spark, t2, 3)
    IcebergInterop.commitRaceHook.set(() =>
      IcebergInterop.write(
        (100L until 105L).toDF("id").coalesce(1), t2): Unit)
    IcebergInterop.write((200L until 205L).toDF("id").coalesce(1), t2)
    val lineage = IcebergInterop.readRowLineage(spark, t2)
    lineage.count() shouldBe 15L
    // the 10 post-upgrade rows (winner's 5 + retried 5) hold DISTINCT
    // assigned ids — the retry allocated past the winner's range
    lineage.filter(col("_row_id").isNotNull).count() shouldBe 10L
    lineage.filter(col("_row_id").isNotNull)
      .select("_row_id").distinct().count() shouldBe 10L
  }
}
