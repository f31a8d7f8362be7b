package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Iceberg TABLE STATISTICS (spec §Table statistics): computeStats
  * runs one distributed NDV pass, writes a spec-shaped Puffin
  * statistics file and records the `statistics` metadata entry for
  * the current snapshot; commits CARRY the entries verbatim; expiry
  * prunes entries with their snapshots and deletes the files; the
  * `$stats` and ANALYZE SQL doors serve both directions. */
class IcebergStatsSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-ice-stats")
      .toString + "/t"

  test("computeStats records per-column NDV; re-analyze REPLACES the " +
    "snapshot's entry; appends CARRY entries; SQL doors serve them") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 200L).map(i => (i, s"g${i % 7}", i % 3)).toDF("id", "g", "m"),
      t)
    IcebergInterop.computeStats(spark, t)
    val ndv = IcebergInterop.tableNdv(spark, t)
    ndv.keySet shouldBe Set("id", "g", "m")
    // HLL++ is exact at these cardinalities (sparse mode)
    ndv("g") shouldBe 7L
    ndv("m") shouldBe 3L
    ndv("id") should (be >= 190L and be <= 210L)
    // the Puffin file exists under metadata/ and opens with the magic
    val statsFiles = new java.io.File(t, "metadata").listFiles()
      .filter(_.getName.endsWith(".stats"))
    statsFiles.length shouldBe 1
    val head4 = {
      val in = new java.io.FileInputStream(statsFiles.head)
      val b = new Array[Byte](4)
      try { in.read(b); b } finally in.close()
    }
    new String(head4, "UTF-8") shouldBe "PFA1"
    // re-analyze the SAME snapshot: entry replaced, not duplicated
    IcebergInterop.computeStats(spark, t, Seq("g"))
    val stats2 = IcebergInterop.statsTable(spark, t).collect()
    stats2.map(_.getAs[Long]("snapshot_id")).distinct.length shouldBe 1
    stats2.length shouldBe 1 // one column analyzed
    IcebergInterop.tableNdv(spark, t) shouldBe Map("g" -> 7L)
    // an APPEND carries the statistics entry verbatim (it describes
    // the snapshot it names, which stays addressable)
    IcebergInterop.write(Seq((1000L, "gX", 9L)).toDF("id", "g", "m"), t)
    val after = IcebergInterop.statsTable(spark, t).collect()
    after.length shouldBe 1
    // ...but the CURRENT snapshot has no stats yet → tableNdv empty
    IcebergInterop.tableNdv(spark, t) shouldBe Map.empty
    // SQL doors
    IcebergSql.register("stats_t", t)
    spark.sql("ANALYZE TABLE graft_iceberg.stats_t COMPUTE STATISTICS " +
      "FOR COLUMNS g, m").collect()
    IcebergInterop.tableNdv(spark, t) shouldBe Map("g" -> 8L, "m" -> 4L)
    spark.sql("SELECT count(*) FROM graft_iceberg.`stats_t$stats`")
      .head().getLong(0) shouldBe 3L // old entry + 2 fresh columns
  }

  test("computePartitionStats writes the spec-shaped parquet and the " +
    "per-snapshot entry; recompute replaces; carry + expiry prune " +
    "like column stats") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 40L).map(i => (i, s"g${i % 2}", i)).toDF("id", "g", "v"),
      t, partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    IcebergInterop.computePartitionStats(spark, t) should be > 0L
    val ps = IcebergInterop.partitionStats(spark, t).get.collect()
    ps.length shouldBe 2
    ps.map(_.getAs[Long]("data_record_count")).sum shouldBe 40L
    ps.foreach(_.getAs[Long]("data_file_count") should be > 0L)
    ps.map(_.getAs[Map[String, String]]("partition")("g")).toSet shouldBe
      Set("g0", "g1")
    // recompute for the SAME snapshot replaces the entry AND deletes
    // the superseded (now unreferenced) file
    IcebergInterop.computePartitionStats(spark, t)
    new java.io.File(t, "metadata").listFiles()
      .count(_.getName.endsWith("-partition-stats.parquet")) shouldBe 1
    IcebergInterop.partitionStats(spark, t).get.count() shouldBe 2L
    // an append CARRIES the entry, but the NEW snapshot has none
    IcebergInterop.write(Seq((100L, "g0", 1L)).toDF("id", "g", "v"), t,
      partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    IcebergInterop.partitionStats(spark, t) shouldBe None
    // expiry drops the old snapshot's entry with its file
    IcebergInterop.write(Seq((101L, "g1", 1L)).toDF("id", "g", "v"), t,
      partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    IcebergInterop.expireSnapshots(spark, t, keepLast = 2)
    import org.json4s._
    val dir = new java.io.File(t, "metadata")
    val vmax = dir.listFiles().map(_.getName)
      .filter(_.matches("v\\d+\\.metadata\\.json"))
      .map(_.stripPrefix("v").stripSuffix(".metadata.json").toLong).max
    val m = org.json4s.jackson.JsonMethods.parse(
      scala.io.Source.fromFile(
        new java.io.File(dir, s"v$vmax.metadata.json")).mkString)
    (m \ "partition-statistics") match {
      case JArray(xs) => xs shouldBe empty
      case JNothing => ()
      case other => fail(s"partition-statistics: $other")
    }
  }

  test("expiry prunes statistics entries WITH their snapshots and " +
    "deletes the orphaned stats files; unknown columns refuse") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 50L).map(i => (i, i % 5)).toDF("id", "m"), t)
    IcebergInterop.computeStats(spark, t)
    val statsDir = new java.io.File(t, "metadata")
    statsDir.listFiles().count(_.getName.endsWith(".stats")) shouldBe 1
    // two more snapshots push the analyzed one past keepLast=2
    IcebergInterop.write(Seq((100L, 9L)).toDF("id", "m"), t)
    IcebergInterop.write(Seq((101L, 9L)).toDF("id", "m"), t)
    IcebergInterop.expireSnapshots(spark, t, keepLast = 2)
    IcebergInterop.statsTable(spark, t).count() shouldBe 0L
    statsDir.listFiles().count(_.getName.endsWith(".stats")) shouldBe 0
    an[IllegalArgumentException] should be thrownBy
      IcebergInterop.computeStats(spark, t, Seq("nope"))
  }
}
