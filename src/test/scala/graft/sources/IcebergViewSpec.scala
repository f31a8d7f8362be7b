package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Iceberg VIEWS (view spec v1): spec-shaped versioned metadata with
  * Spark-dialect SQL representations; CREATE OR REPLACE appends a
  * version (prior versions stay readable), reads plan the current
  * SQL in-session, foreign dialect-only views refuse by name, and
  * the SQL doors (CREATE/DROP VIEW on graft_iceberg) round-trip. */
class IcebergViewSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString + "/v"

  test("create → read; REPLACE versions (old version stays " +
    "readable); the metadata is spec-shaped v1") {
    import spark.implicits._
    val tdir = fresh("graft-ice-viewtbl")
    IcebergInterop.write(
      (1L to 10L).map(i => (i, i % 3, s"r$i")).toDF("id", "g", "v"), tdir)
    IcebergSql.register("view_base", tdir)
    val vdir = fresh("graft-ice-view")
    IcebergViews.create(spark, vdir,
      "SELECT g, count(*) AS n FROM graft_iceberg.view_base " +
        "GROUP BY g") shouldBe 1L
    val out = IcebergViews.read(spark, vdir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    out shouldBe Map(0L -> 3L, 1L -> 4L, 2L -> 3L)
    // REPLACE: a NEW version — both readable
    IcebergViews.create(spark, vdir,
      "SELECT count(*) AS total FROM graft_iceberg.view_base",
      replace = true) shouldBe 2L
    IcebergViews.read(spark, vdir).head().getLong(0) shouldBe 10L
    IcebergViews.readVersion(spark, vdir, 1L).collect().length shouldBe 3
    IcebergViews.versionLog(spark, vdir).map(_._1) shouldBe Seq(1L, 2L)
    // spec shape on disk
    val dir = new java.io.File(vdir, "metadata")
    val m = JsonMethods.parse(scala.io.Source.fromFile(
      new java.io.File(dir, "v2.metadata.json")).mkString)
    (m \ "format-version") shouldBe JInt(1)
    (m \ "current-version-id") match {
      case JInt(n) => n.toLong shouldBe 2L
      case JLong(n) => n shouldBe 2L
      case other => fail(s"current-version-id: $other")
    }
    (m \ "versions") match {
      case JArray(vs) =>
        vs.length shouldBe 2
        vs.foreach { vn =>
          (vn \ "representations") match {
            case JArray(reps) =>
              reps.map(r => r \ "dialect").toSet shouldBe
                Set(JString("spark"))
            case other => fail(s"representations: $other")
          }
        }
      case other => fail(s"versions: $other")
    }
    (m \ "schemas") match {
      case JArray(ss) => ss.length shouldBe 2 // one per version
      case other => fail(s"schemas: $other")
    }
    // a create without replace on an existing view refuses
    an[IllegalArgumentException] should be thrownBy
      IcebergViews.create(spark, vdir, "SELECT 1 AS one")
    // an unresolvable body refuses at CREATE, not first read
    an[Exception] should be thrownBy
      IcebergViews.create(spark, fresh("graft-ice-viewbad"),
        "SELECT nope FROM graft_iceberg.no_such_table")
  }

  test("foreign view metadata: dialect-less SQL serves; trino-only " +
    "refuses by name; format-version 2 refuses") {
    val vdir = fresh("graft-ice-viewforeign")
    val dir = new java.io.File(vdir, "metadata")
    dir.mkdirs()
    def writeMeta(doc: String, v: Int = 1): Unit = {
      val w = new java.io.FileWriter(
        new java.io.File(dir, s"v$v.metadata.json"))
      try w.write(doc) finally w.close()
      val h = new java.io.FileWriter(
        new java.io.File(dir, "version-hint.text"))
      try h.write(v.toString) finally h.close()
    }
    def doc(reps: String, fv: Int = 1): String =
      s"""{"view-uuid":"u-1","format-version":$fv,
         |"location":"$vdir","schemas":[],
         |"current-version-id":1,
         |"versions":[{"version-id":1,"timestamp-ms":1,
         |"schema-id":0,"summary":{"operation":"create"},
         |"representations":[$reps]}],
         |"version-log":[{"timestamp-ms":1,"version-id":1}],
         |"properties":{}}""".stripMargin.replace("\n", "")
    // dialect-less: assumed portable, served
    writeMeta(doc("""{"type":"sql","sql":"SELECT 41 + 1 AS x"}"""))
    IcebergViews.read(spark, vdir).head().getInt(0) shouldBe 42
    // trino-only: refuse BY NAME
    writeMeta(doc(
      """{"type":"sql","sql":"SELECT 1","dialect":"trino"}"""))
    intercept[IcebergViews.UnsupportedIcebergViewException](
      IcebergViews.read(spark, vdir)).getMessage should
      include("trino")
    // format-version 2: refuse by name
    writeMeta(doc("""{"type":"sql","sql":"SELECT 1"}""", fv = 2))
    intercept[IcebergViews.UnsupportedIcebergViewException](
      IcebergViews.read(spark, vdir)).getMessage should
      include("format-version")
  }

  test("SQL doors: CREATE VIEW / SELECT through the namespace / " +
    "CREATE OR REPLACE / DROP VIEW; table-name collisions refuse") {
    import spark.implicits._
    val tdir = fresh("graft-ice-viewsql")
    spark.conf.set(InteropMaintenanceSql.IcebergWarehouseConf,
      java.nio.file.Files.createTempDirectory("graft-view-wh").toString)
    IcebergInterop.write(
      (1L to 6L).map(i => (i, i * 10)).toDF("id", "x"), tdir)
    IcebergSql.register("viewsql_base", tdir)
    spark.sql("CREATE VIEW graft_iceberg.v_sums AS SELECT " +
      "sum(x) AS s FROM graft_iceberg.viewsql_base").collect()
    spark.sql("SELECT s FROM graft_iceberg.v_sums")
      .head().getLong(0) shouldBe 210L
    // REPLACE versions through SQL; the read serves the new body
    spark.sql("CREATE OR REPLACE VIEW graft_iceberg.v_sums AS " +
      "SELECT count(*) AS s FROM graft_iceberg.viewsql_base").collect()
    spark.sql("SELECT s FROM graft_iceberg.v_sums")
      .head().getLong(0) shouldBe 6L
    // a view may not shadow a table, nor a table door serve a view
    an[Exception] should be thrownBy spark.sql(
      "CREATE VIEW graft_iceberg.viewsql_base AS SELECT 1 AS one")
      .collect()
    spark.sql("DROP VIEW graft_iceberg.v_sums").collect()
    an[Exception] should be thrownBy
      spark.sql("SELECT * FROM graft_iceberg.v_sums").collect()
    // DROP IF EXISTS of a gone view is silent
    spark.sql("DROP VIEW IF EXISTS graft_iceberg.v_sums").collect()
    // NESTED views plan (a view over a view); a view REPLACED to
    // reference ITSELF refuses with the named cycle, never recurses
    spark.sql("CREATE VIEW graft_iceberg.v_inner AS SELECT " +
      "count(*) AS n FROM graft_iceberg.viewsql_base").collect()
    spark.sql("CREATE VIEW graft_iceberg.v_outer AS SELECT " +
      "n + 1 AS n1 FROM graft_iceberg.v_inner").collect()
    spark.sql("SELECT n1 FROM graft_iceberg.v_outer")
      .head().getLong(0) shouldBe 7L
    spark.sql("CREATE OR REPLACE VIEW graft_iceberg.v_outer AS " +
      "SELECT n1 FROM graft_iceberg.v_outer").collect()
    intercept[Exception](
      spark.sql("SELECT * FROM graft_iceberg.v_outer").collect())
      .getMessage should include("cycle")
    // the registry listing
    spark.sql("SHOW VIEWS IN graft_iceberg").collect()
      .map(_.getString(0)) should contain allOf ("v_inner", "v_outer")
  }
}
