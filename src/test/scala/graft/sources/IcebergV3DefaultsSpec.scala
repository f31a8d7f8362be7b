package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{LongType, StringType, StructField}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Iceberg v3 COLUMN DEFAULTS (spec: `initial-default` /
  * `write-default` field attributes). The read side serves
  * `initial-default` for rows written BEFORE the field existed —
  * exactly where the pre-r15 null-fill sat, the one known path to
  * silently wrong values. The write side APPLIES `write-default` when
  * an append omits the column. Shapes this reader cannot honor
  * refuse BY NAME: nested-field defaults, undecodable default
  * values, v3's new types (variant/geometry/geography/ns
  * timestamps). */
class IcebergV3DefaultsSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-icev3d").toString + "/t"

  private def fsOf(t: String) =
    new Path(t).getFileSystem(spark.sessionState.newHadoopConf())

  private def writeText(t: String, rel: String, text: String): Unit = {
    val p = new Path(t, rel)
    val fs = fsOf(t)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readText(t: String, rel: String): String = {
    val fs = fsOf(t)
    val in = fs.open(new Path(t, rel))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def currentMetaRel(t: String): String = {
    val hint = readText(t, "metadata/version-hint.text").trim
    s"metadata/v$hint.metadata.json"
  }

  /** A v3 table whose first file PREDATES the `tag`/`score` columns;
    * the current schema then declares defaults on both (hand-edited —
    * graft's own ALTER does not yet write defaults, matching foreign
    * v3 writers that do). */
  private def defaultedTable(): String = {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 5L).toDF("id").coalesce(1), t)
    IcebergInterop.upgradeFormat(spark, t)
    IcebergInterop.upgradeFormat(spark, t, 3)
    IcebergInterop.addColumns(spark, t, Seq(
      StructField("tag", StringType), StructField("score", LongType)))
    val rel = currentMetaRel(t)
    val edited = readText(t, rel)
      .replace(""""name":"tag","required":false,"type":"string"""",
        """"name":"tag","required":false,"type":"string",""" +
          """"initial-default":"legacy","write-default":"fresh"""")
      .replace(""""name":"score","required":false,"type":"long"""",
        """"name":"score","required":false,"type":"long",""" +
          """"initial-default":7""")
    edited should include("initial-default") // the edit landed
    writeText(t, rel, edited)
    t
  }

  test("initial-default serves for rows that predate the column; " +
    "files holding the column serve stored values; the defaults " +
    "survive later commits") {
    import spark.implicits._
    val t = defaultedTable()
    IcebergInterop.write(
      Seq((10L, "stored", 99L)).toDF("id", "tag", "score"), t)
    val out = IcebergInterop.read(spark, t)
    out.count() shouldBe 6L
    // pre-existing rows: the DEFAULT, not null
    out.filter($"id" <= 5L).select($"tag").distinct()
      .as[String].collect() shouldBe Array("legacy")
    out.filter($"id" <= 5L).select($"score").distinct()
      .as[Long].collect() shouldBe Array(7L)
    // stored values win where the file carries the column
    out.filter($"id" === 10L).select($"tag", $"score")
      .as[(String, Long)].head() shouldBe (("stored", 99L))
    // the defaults persist through the append's metadata publication
    IcebergInterop.write(
      Seq((11L, "s2", 1L)).toDF("id", "tag", "score"), t)
    IcebergInterop.read(spark, t).filter($"id" === 1L)
      .select($"tag").as[String].head() shouldBe "legacy"
  }

  test("write-default APPLIES when an append omits the column; an " +
    "append omitting a column with NO write-default still refuses") {
    import spark.implicits._
    val t = defaultedTable()
    // tag has write-default "fresh"; score has only initial-default —
    // omitting BOTH refuses on score
    intercept[IllegalArgumentException](
      IcebergInterop.write(Seq(20L).toDF("id"), t))
      .getMessage should include("score")
    // omitting just tag: the write-default fills
    IcebergInterop.write(Seq((20L, 5L)).toDF("id", "score"), t)
    val row = IcebergInterop.read(spark, t).filter($"id" === 20L)
      .select($"tag", $"score").as[(String, Long)].head()
    row shouldBe (("fresh", 5L))
    // stored-on-disk, not a read-time fill: the new file's write-time
    // schema CARRIES tag, so the value must come from the parquet
    val st = IcebergInterop.state(spark, t, None)
    val newest = st.files.maxBy(_.seq)
    spark.read.parquet(newest.path).select("tag")
      .collect().head.getString(0) shouldBe "fresh"
  }

  test("rewrites MATERIALIZE the default: after OPTIMIZE the " +
    "pre-existing rows hold the default in-file and reads agree") {
    import spark.implicits._
    val t = defaultedTable()
    IcebergInterop.write(
      Seq((10L, "stored", 99L)).toDF("id", "tag", "score"), t)
    IcebergInterop.optimize(spark, t)
    val out = IcebergInterop.read(spark, t)
    out.filter($"id" <= 5L).select($"tag").distinct()
      .as[String].collect() shouldBe Array("legacy")
    out.filter($"id" === 10L).select($"tag").as[String]
      .head() shouldBe "stored"
  }

  test("addColumnWithDefault (r15): graft DECLARES v3 defaults " +
    "natively — pre-existing rows serve the value, appends omitting " +
    "the column apply it, explicit values win; pre-v3 tables and " +
    "unencodable values refuse by name") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 5L).toDF("id").coalesce(1), t)
    IcebergInterop.upgradeFormat(spark, t)
    IcebergInterop.upgradeFormat(spark, t, 3)
    IcebergInterop.addColumnWithDefault(spark, t, "tag", StringType,
      "legacy")
    IcebergInterop.addColumnWithDefault(spark, t, "score", LongType, 7L)
    val out0 = IcebergInterop.read(spark, t)
    out0.filter($"id" <= 5L).select($"tag", $"score").distinct()
      .as[(String, Long)].collect() shouldBe Array(("legacy", 7L))
    // an append omitting BOTH defaulted columns applies both
    IcebergInterop.write(Seq(10L).toDF("id"), t)
    IcebergInterop.read(spark, t).filter($"id" === 10L)
      .select($"tag", $"score").as[(String, Long)]
      .head() shouldBe (("legacy", 7L))
    // explicit values win
    IcebergInterop.write(
      Seq((11L, "stored", 99L)).toDF("id", "tag", "score"), t)
    IcebergInterop.read(spark, t).filter($"id" === 11L)
      .select($"tag", $"score").as[(String, Long)]
      .head() shouldBe (("stored", 99L))
    // pre-v3 refusal
    val t2 = fresh()
    IcebergInterop.write((1L to 3L).toDF("id"), t2)
    intercept[IcebergInterop.UnsupportedIcebergFeatureException](
      IcebergInterop.addColumnWithDefault(spark, t2, "tag",
        StringType, "x")).getMessage should include("format-version 3")
    // unencodable value refusal
    intercept[IcebergInterop.UnsupportedIcebergFeatureException](
      IcebergInterop.addColumnWithDefault(spark, t, "bad",
        LongType, "not-a-long"))
      .getMessage should include("single-value")
    // write-defaults apply to UPSERT images too: a keyed image
    // omitting both defaulted columns lands with them filled
    IcebergInterop.upsertByKeys(Seq(3L).toDF("id"), t, Seq("id"))
    val up = IcebergInterop.read(spark, t).filter($"id" === 3L)
      .select($"tag", $"score").as[(String, Long)].collect()
    up shouldBe Array(("legacy", 7L))
  }

  test("refusals by name: nested-field defaults, undecodable default " +
    "values, and v3 geometry columns (variant reads natively, r16)") {
    import spark.implicits._
    def craft(fieldsJson: String): String = {
      val t = fresh()
      writeText(t, "metadata/v1.metadata.json",
        s"""{"format-version":3,"table-uuid":"u3d","location":"$t",
           |"last-updated-ms":1,"last-column-id":9,
           |"last-sequence-number":0,"next-row-id":0,
           |"schemas":[{"type":"struct","schema-id":0,
           |"fields":[$fieldsJson]}],
           |"current-schema-id":0,
           |"partition-specs":[{"spec-id":0,"fields":[]}],
           |"default-spec-id":0,"properties":{},
           |"current-snapshot-id":-1,"snapshots":[]
           |}""".stripMargin.replace("\n", ""))
      writeText(t, "metadata/version-hint.text", "1")
      t
    }
    // v3 variant type serves natively since r16 (IcebergV3VariantSpec
    // covers the read); the schema parses to Spark VariantType
    IcebergInterop.state(spark,
      craft("""{"id":1,"name":"v","required":false,"type":"variant"}"""),
      None).schema("v").dataType shouldBe
      org.apache.spark.sql.types.VariantType
    // geometry with a CRS parameter
    intercept[IcebergInterop.UnsupportedIcebergFeatureException](
      IcebergInterop.state(spark,
        craft("""{"id":1,"name":"g","required":false,""" +
          """"type":"geometry(srid:3857)"}"""), None))
      .getMessage should include("geometry")
    // a default on a NESTED struct field
    intercept[IcebergInterop.UnsupportedIcebergFeatureException](
      IcebergInterop.state(spark,
        craft("""{"id":1,"name":"s","required":false,"type":
          |{"type":"struct","fields":[{"id":2,"name":"x",
          |"required":false,"type":"long","initial-default":1}]}}"""
          .stripMargin.replace("\n", "")), None))
      .getMessage should include("NESTED")
    // an initial-default this reader cannot decode under the type
    intercept[IcebergInterop.UnsupportedIcebergFeatureException](
      IcebergInterop.state(spark,
        craft("""{"id":1,"name":"x","required":false,"type":"long",""" +
          """"initial-default":"not-a-number"}"""), None))
      .getMessage should include("cannot decode")
  }
}
