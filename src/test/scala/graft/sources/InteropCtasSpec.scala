package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the SQL table-lifecycle surface on both interop dialects —
  * `CREATE [OR REPLACE] TABLE … [PARTITIONED BY …] AS`, `DROP TABLE
  * [IF EXISTS]`, `SHOW TABLES IN` — the statements real users create
  * Delta/Iceberg tables with: managed tables land under the session
  * warehouse conf and DROP deletes them; external registrations
  * survive DROP on disk; plain CREATE on an existing name refuses;
  * OR REPLACE commits a new version/snapshot at the existing path so
  * time travel reaches through it; Iceberg PARTITIONED BY accepts
  * identity columns and days()/bucket()/truncate() transforms. */
class InteropCtasSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def freshWh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("CREATE TABLE graft_delta.x PARTITIONED BY AS: lands under the " +
    "warehouse, reads back from SQL, OR REPLACE is a new version at " +
    "the same path, plain CREATE refuses, DROP deletes managed data") {
    import spark.implicits._
    val wh = freshWh("graft-ctas-dwh")
    spark.conf.set(InteropMaintenanceSql.DeltaWarehouseConf, wh)
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L))
      .toDF("id", "g", "v").createOrReplaceTempView("ctas_src")
    val out = spark.sql(
      "CREATE TABLE graft_delta.ctas_t PARTITIONED BY (g) AS " +
        "SELECT * FROM ctas_src").collect()
    out.head.getString(1) shouldBe s"$wh/ctas_t"
    spark.sql("SELECT count(*) FROM graft_delta.ctas_t")
      .head().getLong(0) shouldBe 3L
    DeltaInterop.state(spark, s"$wh/ctas_t", None)
      .partitionColumns shouldBe Seq("g")
    // plain CREATE on the existing name refuses
    intercept[IllegalArgumentException](spark.sql(
      "CREATE TABLE graft_delta.ctas_t AS SELECT * FROM ctas_src"))
      .getMessage should include("already exists")
    // OR REPLACE commits a new version at the SAME path
    spark.sql(
      "CREATE OR REPLACE TABLE graft_delta.ctas_t PARTITIONED BY (g) " +
        "AS SELECT * FROM ctas_src WHERE id <= 2").collect()
    spark.sql("SELECT count(*) FROM graft_delta.ctas_t")
      .head().getLong(0) shouldBe 2L
    DeltaInterop.readVersion(spark, s"$wh/ctas_t", 0L)
      .count() shouldBe 3L // time travel reaches through the replace
    spark.sql("SHOW TABLES IN graft_delta").collect()
      .map(_.getString(0)) should contain("ctas_t")
    // DROP deletes managed data
    spark.sql("DROP TABLE graft_delta.ctas_t")
      .head().getBoolean(1) shouldBe true
    new java.io.File(s"$wh/ctas_t").exists() shouldBe false
    DeltaSql.pathOf("ctas_t") shouldBe None
    spark.sql("DROP TABLE IF EXISTS graft_delta.ctas_t")
      .collect() shouldBe empty
    intercept[IllegalArgumentException](
      spark.sql("DROP TABLE graft_delta.ctas_t"))
      .getMessage should include("not registered")
  }

  test("CREATE TABLE graft_iceberg.x with identity + transform " +
    "partitioning: real spec tuples land, SQL reads back, OR REPLACE " +
    "snapshots, DROP leaves EXTERNAL registrations on disk") {
    import spark.implicits._
    val wh = freshWh("graft-ctas-iwh")
    spark.conf.set(InteropMaintenanceSql.IcebergWarehouseConf, wh)
    Seq((1L, "a", 10L), (2L, "b", 20L), (17L, "a", 30L))
      .toDF("id", "g", "v").createOrReplaceTempView("ctas_isrc")
    spark.sql(
      "CREATE TABLE graft_iceberg.ctas_it " +
        "PARTITIONED BY (g, bucket(4, id)) AS " +
        "SELECT * FROM ctas_isrc").collect()
    spark.sql("SELECT sum(v) FROM graft_iceberg.ctas_it")
      .head().getLong(0) shouldBe 60L
    val st = IcebergInterop.state(spark, s"$wh/ctas_it", None)
    st.specs(st.defaultSpecId).map(f => (f.transform, f.source)) shouldBe
      Seq(("identity", "g"), ("bucket[4]", "id"))
    spark.sql(
      "CREATE OR REPLACE TABLE graft_iceberg.ctas_it " +
        "PARTITIONED BY (g, bucket(4, id)) AS " +
        "SELECT * FROM ctas_isrc WHERE id = 1").collect()
    spark.sql("SELECT count(*) FROM graft_iceberg.ctas_it")
      .head().getLong(0) shouldBe 1L
    // external table: registered by hand OUTSIDE the warehouse
    val extDir = freshWh("graft-ctas-ext") + "/t"
    IcebergInterop.write(Seq((9L, "z", 9L)).toDF("id", "g", "v"), extDir)
    IcebergSql.register("ctas_ext", extDir)
    spark.sql("DROP TABLE graft_iceberg.ctas_ext")
      .head().getBoolean(1) shouldBe false // external: data preserved
    IcebergInterop.read(spark, extDir).count() shouldBe 1L
    spark.sql("DROP TABLE graft_iceberg.ctas_it")
      .head().getBoolean(1) shouldBe true
    new java.io.File(s"$wh/ctas_it").exists() shouldBe false
  }

  test("CREATE TABLE graft_delta.x CLUSTER BY AS (r15): the created " +
    "table carries the clustering feature + domain, and a plain " +
    "OPTIMIZE re-clusters on it") {
    import spark.implicits._
    val wh = freshWh("graft-ctas-lcwh")
    spark.conf.set(InteropMaintenanceSql.DeltaWarehouseConf, wh)
    (1L to 200L).map(i => (i, i % 7)).toDF("id", "v")
      .createOrReplaceTempView("ctas_lc_src")
    spark.sql("CREATE TABLE graft_delta.ctas_lc CLUSTER BY (id) AS " +
      "SELECT * FROM ctas_lc_src")
    val st = DeltaInterop.state(spark, s"$wh/ctas_lc", None)
    st.writerFeatures should contain("clustering")
    st.domains.keySet should contain(DeltaInterop.ClusteringDomain)
    spark.sql("SELECT count(*) FROM graft_delta.ctas_lc")
      .head().getLong(0) shouldBe 200L
    spark.sql("OPTIMIZE graft_delta.ctas_lc") // re-clusters, no error
    spark.sql("SELECT count(*) FROM graft_delta.ctas_lc")
      .head().getLong(0) shouldBe 200L
  }

  test("ALTER TABLE SET TBLPROPERTIES / ADD CONSTRAINT / DROP " +
    "CONSTRAINT route from SQL: the property lands and binds (Delta " +
    "appendOnly via SQL refuses a later DELETE), Iceberg properties " +
    "republish metadata-only, constraints gate writes end-to-end") {
    import spark.implicits._
    val t = java.nio.file.Files
      .createTempDirectory("graft-ctas-alter").toString + "/t"
    Seq((1L, 5L), (2L, 6L)).toDF("id", "v")
      .createOrReplaceTempView("alter_src")
    DeltaInterop.write(spark.table("alter_src"), t)
    DeltaSql.register("alter_t", t)
    spark.sql("ALTER TABLE graft_delta.alter_t ADD CONSTRAINT " +
      "pos_v CHECK (v > 0)")
    DeltaInterop.state(spark, t, None)
      .configuration("delta.constraints.pos_v") shouldBe "v > 0"
    intercept[DeltaWriteGate.DeltaConstraintViolationException](
      spark.sql("INSERT INTO graft_delta.alter_t VALUES " +
        "(CAST(3 AS BIGINT), CAST(-1 AS BIGINT))"))
    spark.sql("ALTER TABLE graft_delta.alter_t DROP CONSTRAINT pos_v")
    spark.sql("INSERT INTO graft_delta.alter_t VALUES " +
      "(CAST(3 AS BIGINT), CAST(-1 AS BIGINT))")
    DeltaInterop.read(spark, t).count() shouldBe 3L
    spark.sql("ALTER TABLE graft_delta.alter_t SET TBLPROPERTIES " +
      "('delta.appendOnly' = 'true')")
    intercept[DeltaInterop.UnsupportedDeltaFeatureException](
      spark.sql("DELETE FROM graft_delta.alter_t WHERE id = 1"))
    // Iceberg: metadata-only property republish, read back exact
    val it = java.nio.file.Files
      .createTempDirectory("graft-ctas-ialter").toString + "/t"
    IcebergInterop.write(Seq((1L, 5L)).toDF("id", "v"), it)
    IcebergSql.register("alter_it", it)
    spark.sql("ALTER TABLE graft_iceberg.alter_it SET TBLPROPERTIES " +
      "('commit.retry.num-retries' = '7', 'write.tag' = 'a,b')")
    IcebergInterop.properties(spark, it) shouldBe Map(
      "commit.retry.num-retries" -> "7", "write.tag" -> "a,b")
    IcebergInterop.read(spark, it).count() shouldBe 1L
  }

  test("SHALLOW CLONE graft_delta: metadata-only copy with absolute " +
    "paths, deletion vectors re-pointed, constraints carried, " +
    "version-pinned clones serve history; writes to the clone leave " +
    "the source untouched") {
    import spark.implicits._
    val wh = freshWh("graft-ctas-clwh")
    spark.conf.set(InteropMaintenanceSql.DeltaWarehouseConf, wh)
    val src = freshWh("graft-ctas-clsrc") + "/t"
    DeltaInterop.write(
      (1L to 100L).map(i => (i, i * 2)).toDF("id", "v"), src)
    DeltaInterop.addCheckConstraint(spark, src, "pos_v", "v > 0")
    DeltaInterop.delete(spark, src, col("id") % 10 === 0) // vectors
    DeltaSql.register("cl_src", src)
    spark.sql("CREATE TABLE graft_delta.cl_t SHALLOW CLONE " +
      "graft_delta.cl_src").collect()
    val clonePath = s"$wh/cl_t"
    // no data files under the clone root — metadata only
    new java.io.File(clonePath).listFiles()
      .map(_.getName).toSet shouldBe Set("_delta_log")
    DeltaInterop.read(spark, clonePath).count() shouldBe 90L
    DeltaInterop.read(spark, clonePath).filter(col("id") % 10 === 0)
      .count() shouldBe 0L // vectors survived the re-point
    // the carried constraint binds the clone's writes
    intercept[DeltaWriteGate.DeltaConstraintViolationException](
      DeltaInterop.write(Seq((200L, -1L)).toDF("id", "v"), clonePath))
    // writes to the clone never touch the source
    DeltaInterop.write(Seq((200L, 7L)).toDF("id", "v"), clonePath)
    DeltaInterop.read(spark, clonePath).count() shouldBe 91L
    DeltaInterop.read(spark, src).count() shouldBe 90L
    // a version-pinned clone serves the PRE-delete state
    DeltaSql.unregister("cl_v0")
    spark.sql("CREATE TABLE graft_delta.cl_v0 SHALLOW CLONE " +
      "graft_delta.cl_src VERSION AS OF 0").collect()
    DeltaInterop.read(spark, s"$wh/cl_v0").count() shouldBe 100L
  }

  test("unparseable PARTITIONED BY transforms and a missing " +
    "warehouse conf refuse by name") {
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "g").createOrReplaceTempView("ctas_bad")
    intercept[IllegalArgumentException](spark.sql(
      "CREATE TABLE graft_iceberg.ctas_bad " +
        "PARTITIONED BY (md5(id)) AS SELECT * FROM ctas_bad"))
      .getMessage should include("not a column or a supported")
    val prev = spark.conf.getOption(
      InteropMaintenanceSql.DeltaWarehouseConf)
    spark.conf.unset(InteropMaintenanceSql.DeltaWarehouseConf)
    try intercept[IllegalArgumentException](spark.sql(
      "CREATE TABLE graft_delta.ctas_nowh AS SELECT * FROM ctas_bad"))
      .getMessage should include("warehouse")
    finally prev.foreach(spark.conf.set(
      InteropMaintenanceSql.DeltaWarehouseConf, _))
  }
}
