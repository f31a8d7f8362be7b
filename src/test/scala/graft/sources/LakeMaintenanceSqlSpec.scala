package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the maintenance SQL surface: OPTIMIZE (bin-pack / re-cluster /
  * z-order), VACUUM RETAIN, DESCRIBE HISTORY — parsed by the delegating
  * parser, reported as rows, net-zero for streams where the API calls
  * are, with everything else falling through to the session parser. */
class LakeMaintenanceSqlSpec extends AnyFunSuite with Matchers
  with SparkSpec {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft-maint-sql").toString + "/t"

  test("OPTIMIZE bin-packs the small-file tail and reports the compaction") {
    import spark.implicits._
    val t = freshTable()
    (0 until 6).foreach(b => ManifestLake.write(
      (b * 10 to b * 10 + 9).map(i => (i.toLong, s"p$i")).toDF("id", "p"), t))
    LakeSql.register("maint1", t)
    val r = spark.sql("OPTIMIZE graft_lake.maint1").collect()
    r should have length 1
    r.head.getLong(1) should be < r.head.getLong(0) // files_after < before
    ManifestLake.read(spark, t).count() shouldBe 60
    // maintenance commit: incremental consumers skip it
    ManifestLake.changesBetween(spark, t, r.head.getLong(2) - 1,
      r.head.getLong(2)).map(_.maintenance) shouldBe Seq(true)
  }

  test("OPTIMIZE ZORDER BY re-clusters: one column = range cluster, " +
    "two = z-order with stats on both dimensions") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.write(
      (1 to 4000).map(i => (i.toLong, (i * 37 % 4000).toLong, s"p$i"))
        .toDF("x", "y", "p").repartition(8), t)
    LakeSql.register("maint2", t)
    val r = spark.sql("OPTIMIZE graft_lake.maint2 ZORDER BY (x, y)")
      .collect()
    val snap = ManifestLake.snapshot(spark, t, Some(r.head.getLong(2)))
    // z-order records per-file ranges for BOTH dimensions
    snap.entries.foreach { e =>
      e.range("x") should not be empty
      e.range("y") should not be empty
    }
    ManifestLake.read(spark, t).count() shouldBe 4000
    ManifestLake.changesBetween(spark, t, r.head.getLong(2) - 1,
      r.head.getLong(2)).map(_.maintenance) shouldBe Seq(true)
    // single-column form routes to the range re-cluster
    spark.sql("OPTIMIZE graft_lake.maint2 ZORDER BY (x)").collect()
    ManifestLake.read(spark, t).count() shouldBe 4000
  }

  test("REORG TABLE … APPLY (PURGE) rewrites every deletion-vectored " +
    "file and materializes the vectors; a clean table no-ops") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.writeClustered(
      (1 to 2000).map(i => (i.toLong, s"p$i")).toDF("id", "p"),
      t, "id", nFiles = 4)
    // thin vectors on two files — below any ratio trigger, but REORG
    // purges unconditionally
    ManifestLake.deleteMor(spark, t, col("id") === 3L || col("id") === 1500L)
    ManifestLake.snapshot(spark, t).entries
      .count(_.dv.nonEmpty) shouldBe 2
    LakeSql.register("maint_reorg", t)
    val r = spark.sql("REORG TABLE graft_lake.maint_reorg APPLY (PURGE)")
      .collect()
    r should have length 1
    val snap = ManifestLake.snapshot(spark, t, Some(r.head.getLong(2)))
    snap.entries.forall(_.dv.isEmpty) shouldBe true
    ManifestLake.read(spark, t).count() shouldBe 1998
    ManifestLake.fastCount(spark, t) shouldBe 1998L
    // idempotent: nothing vectored → version no-op
    spark.sql("REORG TABLE graft_lake.maint_reorg APPLY (PURGE)")
      .collect().head.getLong(2) shouldBe r.head.getLong(2)
  }

  test("VACUUM RETAIN and DESCRIBE HISTORY round-trip the API calls") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.write((1 to 10).map(i => (i.toLong, s"p$i")).toDF("id", "p"), t)
    ManifestLake.write((11 to 20).map(i => (i.toLong, s"p$i")).toDF("id", "p"), t)
    ManifestLake.compact(spark, t)
    LakeSql.register("maint3", t)
    val hist = spark.sql("DESCRIBE HISTORY graft_lake.maint3").collect()
    hist.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L, 3L)
    hist.foreach(r => r.getLong(4) should be > 0L) // commit_ts_ms recorded
    val deleted = spark.sql(
      "VACUUM graft_lake.maint3 RETAIN 1 VERSIONS").collect()
    deleted.head.getInt(0) should be > 0
    ManifestLake.versions(spark, t) shouldBe Seq(3L)
    ManifestLake.read(spark, t).count() shouldBe 20
  }

  test("CREATE TABLE AS SELECT makes a managed lake table under the " +
    "warehouse; OR REPLACE overwrites as a new version; DROP TABLE " +
    "deletes managed data but leaves external paths") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set(LakeMaintenanceSql.WarehouseConf, wh)
    try {
      (1 to 50).map(i => (i.toLong, s"n$i")).toDF("id", "name")
        .createOrReplaceTempView("ctas_src")
      val r = spark.sql(
        """CREATE TABLE graft_lake.ctas1 AS
          |SELECT id, name FROM ctas_src WHERE id <= 30""".stripMargin)
        .collect()
      r.head.getString(1) shouldBe s"$wh/ctas1"
      spark.sql("SELECT COUNT(*) FROM graft_lake.ctas1")
        .collect().head.getLong(0) shouldBe 30L
      // plain CREATE on an existing name raises by name
      intercept[IllegalArgumentException] {
        spark.sql("CREATE TABLE graft_lake.ctas1 AS SELECT * FROM ctas_src")
      }.getMessage should include("already exists")
      // OR REPLACE overwrites AT THE SAME PATH as a new version:
      // history reaches through
      spark.sql(
        """CREATE OR REPLACE TABLE graft_lake.ctas1 AS
          |SELECT id, name FROM ctas_src""".stripMargin).collect()
      ManifestLake.read(spark, s"$wh/ctas1").count() shouldBe 50
      ManifestLake.read(spark, s"$wh/ctas1", Some(1L)).count() shouldBe 30
      // partitioned CTAS lays out Hive dirs the manifest prunes on
      spark.sql(
        """CREATE TABLE graft_lake.ctas2 PARTITIONED BY (part) AS
          |SELECT id, id % 3 AS part FROM ctas_src""".stripMargin).collect()
      ManifestLake.readPruned(spark, s"$wh/ctas2", Map("part" -> "1"))
        .count() shouldBe 17
      // DROP deletes managed data
      spark.sql("DROP TABLE graft_lake.ctas2").collect()
        .head.getBoolean(1) shouldBe true
      new java.io.File(s"$wh/ctas2").exists() shouldBe false
      LakeSql.pathOf("ctas2") shouldBe None
      // external path: registered outside the warehouse — DROP only
      // unregisters
      val ext = freshTable()
      ManifestLake.write(Seq((1L, "x")).toDF("id", "name"), ext)
      LakeSql.register("ctas_ext", ext)
      spark.sql("DROP TABLE graft_lake.ctas_ext").collect()
        .head.getBoolean(1) shouldBe false
      ManifestLake.read(spark, ext).count() shouldBe 1
      // IF EXISTS tolerates a missing name; bare DROP raises
      spark.sql("DROP TABLE IF EXISTS graft_lake.never_was").collect()
      intercept[IllegalArgumentException] {
        spark.sql("DROP TABLE graft_lake.never_was")
      }.getMessage should include("not registered")
    } finally spark.conf.unset(LakeMaintenanceSql.WarehouseConf)
  }

  test("SHOW TABLES IN graft_lake lists the registry") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.write(Seq((1L, "x")).toDF("id", "p"), t)
    LakeSql.register("show_me", t)
    val rows = spark.sql("SHOW TABLES IN graft_lake").collect()
    rows.map(r => r.getString(0) -> r.getString(1)).toMap
      .get("show_me") shouldBe Some(t)
    // non-lake SHOW TABLES still goes to the session catalog
    spark.sql("SHOW TABLES").collect() // parses + runs via the delegate
  }

  test("OPTIMIZE WHERE scopes the pack to named partitions — other " +
    "partitions' small files stay, and bad scopes fail by name") {
    import spark.implicits._
    val t = freshTable()
    // two partitions, three small files each
    (0 until 3).foreach { i =>
      ManifestLake.write(
        Seq((i.toLong, "a"), (100L + i, "b")).toDF("id", "part")
          .withColumn("id", $"id")
          .coalesce(1),
        t, partitionBy = Seq("part"))
    }
    val before = ManifestLake.snapshot(spark, t)
    before.entries.count(_.path.contains("part=a")) shouldBe 3
    before.entries.count(_.path.contains("part=b")) shouldBe 3
    LakeSql.register("opt_scope", t)
    val r = spark.sql(
      "OPTIMIZE graft_lake.opt_scope WHERE part = 'a'").collect().head
    r.getLong(0) shouldBe 6L
    r.getLong(1) shouldBe 4L // a packed to 1, b's 3 untouched
    val after = ManifestLake.snapshot(spark, t)
    after.entries.count(_.path.contains("part=a")) shouldBe 1
    // b's entries carried VERBATIM
    before.entries.filter(_.path.contains("part=b")).map(_.line).toSet
      .subsetOf(after.entries.map(_.line).toSet) shouldBe true
    ManifestLake.read(spark, t).count() shouldBe 6L
    // a non-partition column in the scope is a named error
    intercept[IllegalArgumentException] {
      spark.sql("OPTIMIZE graft_lake.opt_scope WHERE id = '1'")
    }.getMessage should include("non-partition")
    // non-equality shapes fail at parse
    intercept[IllegalArgumentException] {
      spark.sql("OPTIMIZE graft_lake.opt_scope WHERE part > 'a'")
    }.getMessage should include("partition equality")
  }

  test("VACUUM DRY RUN previews exactly what the real vacuum deletes, " +
    "deleting nothing itself") {
    import spark.implicits._
    val t = freshTable()
    // v1..v3: two overwrites orphan v1/v2's files under RETAIN 1
    ManifestLake.write(Seq((1L, "a")).toDF("id", "p"), t)
    ManifestLake.write(Seq((2L, "b")).toDF("id", "p"), t, append = false)
    ManifestLake.write(Seq((3L, "c")).toDF("id", "p"), t, append = false)
    LakeSql.register("vac_dry", t)
    val preview = spark.sql(
      "VACUUM graft_lake.vac_dry RETAIN 1 VERSIONS DRY RUN").collect()
    val previewData = preview.filter(_.getString(0) == "data")
      .map(_.getString(1)).toSet
    previewData should not be empty
    // dry run deleted nothing: time travel to v1 still reads
    ManifestLake.read(spark, t, Some(1L)).count() shouldBe 1L
    // the real vacuum removes exactly the previewed data files
    spark.sql("VACUUM graft_lake.vac_dry RETAIN 1 VERSIONS")
      .head().getInt(0) shouldBe previewData.size
    val (fs, p) = (new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(t))
    previewData.foreach { rel =>
      fs.exists(new org.apache.hadoop.fs.Path(p, rel)) shouldBe false
    }
    ManifestLake.read(spark, t).collect().map(_.getLong(0)) shouldBe
      Array(3L)
  }

  test("unregistered names fail by name at parse; ordinary SQL falls " +
    "through untouched") {
    intercept[IllegalArgumentException] {
      spark.sql("OPTIMIZE graft_lake.nope")
    }.getMessage should include("not registered")
    spark.sql("SELECT 1 AS x").collect().head.getInt(0) shouldBe 1
    // a statement mentioning OPTIMIZE only as an identifier still parses
    spark.sql("SELECT 'OPTIMIZE graft_lake.x' AS s").collect()
      .head.getString(0) should include("OPTIMIZE")
  }
}
