package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the shallow-clone ownership contract: the clone BORROWS the
  * source's files (a metadata commit, zero data movement), its DML
  * lands locally and never touches the source, and no clone
  * maintenance can physically delete a source file — vacuum is
  * listing-scoped to its own root by construction. */
class ShallowCloneSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-clone-$name")
      .toString + "/t"

  private def parquetCount(dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return 0
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  test("clone is metadata-only, serves the source snapshot, carries " +
    "stats, and time-travels the source") {
    import spark.implicits._
    val src = fresh("src")
    ManifestLake.write(
      (1 to 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), src,
      statsCol = Some("id"))
    ManifestLake.write(
      Seq((101L, "p101")).toDF("id", "payload"), src, append = true,
      statsCol = Some("id"))
    val tgt = fresh("tgt")
    ManifestLake.shallowClone(spark, src, tgt) shouldBe 1L
    parquetCount(tgt) shouldBe 0 // zero data files copied
    ManifestLake.read(spark, tgt).select($"id").as[Long]
      .collect().sorted shouldBe (1L to 101L).toArray
    // per-entry stats carried verbatim -> skipping works on the clone
    ManifestLake.snapshot(spark, tgt).entries
      .forall(_.range("id").nonEmpty) shouldBe true
    // a clone of version 1 serves the pre-append state
    val tgt0 = fresh("tgt0")
    ManifestLake.shallowClone(spark, src, tgt0, version = Some(1L))
    ManifestLake.read(spark, tgt0).count() shouldBe 100L
  }

  test("clone DML lands locally; the source never observes it; clone " +
    "vacuum cannot delete source files") {
    import spark.implicits._
    val src = fresh("src2")
    ManifestLake.write(
      (1 to 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), src)
    val srcFilesBefore = parquetCount(src)
    val tgt = fresh("tgt2")
    ManifestLake.shallowClone(spark, src, tgt)
    // copy-on-write delete on the clone rewrites INTO the clone's dir
    ManifestLake.delete(spark, tgt, col("id") <= 10L)
    ManifestLake.read(spark, tgt).count() shouldBe 90L
    parquetCount(tgt) should be > 0
    // the source is untouched: same rows, same physical files
    ManifestLake.read(spark, src).count() shouldBe 100L
    parquetCount(src) shouldBe srcFilesBefore
    // vacuum the clone to one version: the borrowed entries are no
    // longer referenced anywhere in the clone — and still no source
    // file may die (deletion is listing-scoped to the clone root)
    ManifestLake.vacuum(spark, tgt, keepLast = 1)
    parquetCount(src) shouldBe srcFilesBefore
    ManifestLake.read(spark, src).count() shouldBe 100L
    ManifestLake.read(spark, tgt).count() shouldBe 90L
  }

  test("refusals by name: existing target, partitioned source, " +
    "DV-carrying source") {
    import spark.implicits._
    val src = fresh("src3")
    ManifestLake.write(
      (1 to 20).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), src)
    val tgt = fresh("tgt3")
    ManifestLake.shallowClone(spark, src, tgt)
    intercept[IllegalArgumentException] {
      ManifestLake.shallowClone(spark, src, tgt)
    }.getMessage should include("already exists")
    // nested roots refuse both ways: each table's vacuum walks its own
    // root recursively and would collect the other's files
    intercept[IllegalArgumentException] {
      ManifestLake.shallowClone(spark, src, s"$src/inner")
    }.getMessage should include("nests")
    intercept[IllegalArgumentException] {
      val parent = new Path(src).getParent.toString
      ManifestLake.shallowClone(spark, src, parent)
    }.getMessage should include("nests")
    val part = fresh("part")
    ManifestLake.write(
      (1 to 20).map(i => (i.toLong, i % 2, s"p$i")).toDF("id", "k", "p"),
      part, partitionBy = Seq("k"))
    intercept[IllegalArgumentException] {
      ManifestLake.shallowClone(spark, part, fresh("tgtp"))
    }.getMessage should include("Hive-partitioned")
    val dv = fresh("dv")
    ManifestLake.write(
      (1 to 20).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), dv)
    ManifestLake.deleteMor(spark, dv, col("id") % 5 === 0)
    intercept[IllegalArgumentException] {
      ManifestLake.shallowClone(spark, dv, fresh("tgtd"))
    }.getMessage should include("PURGE")
  }

  test("SQL surface: CREATE TABLE … SHALLOW CLONE … VERSION AS OF " +
    "creates, registers, and serves through graft_lake") {
    import spark.implicits._
    val src = fresh("src4")
    ManifestLake.write(
      (1 to 50).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), src)
    ManifestLake.write(Seq((51L, "x")).toDF("id", "payload"), src,
      append = true)
    LakeSql.register("clonesrc", src)
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set(LakeMaintenanceSql.WarehouseConf, wh)
    try {
      spark.sql("CREATE TABLE graft_lake.clonespec SHALLOW CLONE " +
        "graft_lake.clonesrc VERSION AS OF 1").collect()
      spark.sql("SELECT count(*) AS n FROM graft_lake.clonespec")
        .as[Long].head() shouldBe 50L
      parquetCount(s"$wh/clonespec") shouldBe 0
      // the clone takes SQL DML like any native table
      spark.sql("DELETE FROM graft_lake.clonespec WHERE id <= 40")
      spark.sql("SELECT count(*) AS n FROM graft_lake.clonespec")
        .as[Long].head() shouldBe 10L
      ManifestLake.read(spark, src).count() shouldBe 51L
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_lake.clonespec")
      LakeSql.unregister("clonesrc")
      spark.conf.unset(LakeMaintenanceSql.WarehouseConf)
    }
  }
}
