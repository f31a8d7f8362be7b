package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The $-suffix INSPECTION tables on both interop dialects — the
  * surfaces real Iceberg/Delta users point dashboards and maintenance
  * jobs at: `$snapshots`, `$manifests`, `$files`, `$partitions`
  * (Iceberg) and `$files`, `$detail` (Delta, + the existing
  * `$history` on both). All metadata-only: numbers come from the
  * manifests/log, never a data scan. */
class InteropInspectionSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def fresh(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString + "/t"

  test("Iceberg $snapshots/$manifests/$files/$partitions agree with " +
    "the state and the log; SQL doors serve them") {
    import spark.implicits._
    val t = fresh("graft-ice-inspect")
    IcebergInterop.write(
      (1L to 40L).map(i => (i, s"g${i % 2}", s"v$i")).toDF("id", "g", "v"),
      t, partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    IcebergInterop.upgradeFormat(spark, t, 2)
    IcebergInterop.write(
      (41L to 60L).map(i => (i, s"g${i % 2}", s"v$i")).toDF("id", "g", "v"),
      t, partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    IcebergInterop.deleteMor(spark, t,
      org.apache.spark.sql.functions.col("id") <= 5)
    val st = IcebergInterop.state(spark, t, None)

    val snaps = IcebergInterop.snapshotsTable(spark, t).collect()
    snaps.length shouldBe 3 // two appends + the MOR delete
    snaps.count(_.getAs[Boolean]("is_current")) shouldBe 1
    snaps.map(_.getAs[String]("operation")).toSet shouldBe
      Set("append", "delete")
    snaps.foreach(r =>
      r.getAs[String]("manifest_list") should not be null)

    val mans = IcebergInterop.manifestsTable(spark, t)
    val manRows = mans.collect()
    // data manifests + the delete manifest, all under the current list
    manRows.map(_.getAs[Int]("content")).toSet shouldBe Set(0, 1)
    manRows.foreach(_.getAs[Long]("length") should be > 0L)

    val files = IcebergInterop.filesTable(spark, t)
    val dataRows = files.filter("content = 0").collect()
    dataRows.length shouldBe st.files.size
    dataRows.map(_.getAs[Long]("record_count")).sum shouldBe 60L
    // the delete surface shows as content=1 (position deletes)
    files.filter("content = 1").count() should be > 0L
    // partition tuples stringified
    dataRows.map(_.getAs[Map[String, String]]("partition")("g"))
      .toSet shouldBe Set("g0", "g1")

    val parts = IcebergInterop.partitionsTable(spark, t).collect()
    parts.length shouldBe 2
    parts.map(_.getAs[Long]("record_count")).sum shouldBe 60L
    parts.foreach(_.getAs[Long]("data_file_count") should be > 0L)

    // SQL doors
    IcebergSql.register("inspect_t", t)
    spark.sql("SELECT count(*) FROM graft_iceberg.`inspect_t$snapshots`")
      .head().getLong(0) shouldBe 3L
    spark.sql("SELECT sum(record_count) FROM " +
      "graft_iceberg.`inspect_t$files` WHERE content = 0")
      .head().getLong(0) shouldBe 60L
    spark.sql("SELECT count(*) FROM graft_iceberg.`inspect_t$manifests`")
      .head().getLong(0) shouldBe manRows.length.toLong
    spark.sql("SELECT count(*) FROM " +
      "graft_iceberg.`inspect_t$partitions`")
      .head().getLong(0) shouldBe 2L
  }

  test("Delta $files carries stats row counts, DV debt and " +
    "row-tracking assignment; $detail profiles the table; SQL doors") {
    import spark.implicits._
    val t = fresh("graft-delta-inspect")
    DeltaInterop.write(
      (1L to 30L).map(i => (i, s"p${i % 2}", i * 2)).toDF("id", "p", "v"),
      t, partitionBy = Seq("p"))
    DeltaInterop.enableRowTracking(spark, t)
    DeltaInterop.delete(spark, t,
      org.apache.spark.sql.functions.col("id") <= 3)
    val st = DeltaInterop.state(spark, t, None)

    val files = DeltaInterop.filesTable(spark, t).collect()
    files.length shouldBe st.files.size
    files.map(r => Option(r.getAs[java.lang.Long]("record_count"))
      .map(_.toLong).getOrElse(0L)).sum shouldBe 30L // stats-recorded
    files.map(r => Option(r.getAs[java.lang.Long]("dv_rows"))
      .map(_.toLong).getOrElse(0L)).sum shouldBe 3L // the MOR debt
    files.foreach(r =>
      r.getAs[java.lang.Long]("base_row_id") should not be null)
    files.map(_.getAs[Map[String, String]]("partition")("p"))
      .toSet shouldBe Set("p0", "p1")

    val detail = DeltaInterop.detail(spark, t).head()
    detail.getAs[String]("format") shouldBe "delta"
    detail.getAs[Seq[String]]("partition_columns") shouldBe Seq("p")
    detail.getAs[Long]("num_files") shouldBe st.files.size.toLong
    detail.getAs[Int]("min_writer_version") shouldBe 7
    detail.getAs[Seq[String]]("writer_features") should
      contain("rowTracking")
    detail.getAs[Map[String, String]]("properties").keySet should
      contain("delta.rowTracking.materializedRowIdColumnName")

    DeltaSql.register("inspect_d", t)
    spark.sql("SELECT sum(record_count) FROM " +
      "graft_delta.`inspect_d$files`").head().getLong(0) shouldBe 30L
    spark.sql("SELECT num_files FROM graft_delta.`inspect_d$detail`")
      .head().getLong(0) shouldBe st.files.size.toLong
    // clustering columns surface once declared
    DeltaInterop.enableClustering(spark, t, Seq("id"))
    spark.sql("SELECT clustering_columns FROM " +
      "graft_delta.`inspect_d$detail`")
      .head().getAs[Seq[String]](0) shouldBe Seq("id")
  }
}
