package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** `ALTER TABLE … ADD COLUMNS` on both interops — metadata-only
  * widening (old files serve the new columns as NULL, the next append
  * carries them), the mapped-Delta id/physical-name assignment, the
  * Iceberg new-schema-node shape, SQL on both dialects, and the
  * existing-name refusal. */
class InteropAddColumnsSpec extends AnyFunSuite with Matchers
  with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-addcol").toString + "/t"

  test("Delta addColumns widens metadata-only; appends carry the new " +
    "column; SQL ALTER routes; existing names refuse") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 10L).map(i => (i, i * 2)).toDF("id", "v"), t)
    val filesBefore = DeltaInterop.state(spark, t, None).files
      .map(_.path).toSet
    DeltaInterop.addColumns(spark, t,
      Seq(StructField("note", StringType))) shouldBe 1L
    // metadata-only: same files, new column NULL everywhere
    val st = DeltaInterop.state(spark, t, None)
    st.files.map(_.path).toSet shouldBe filesBefore
    val out = DeltaInterop.read(spark, t)
    out.columns.sorted shouldBe Array("id", "note", "v")
    out.filter($"note".isNotNull).count() shouldBe 0L
    // the next append carries it
    DeltaInterop.write(Seq((11L, 22L, "x")).toDF("id", "v", "note"), t)
    DeltaInterop.read(spark, t).filter($"id" === 11L)
      .select($"note").as[String].head() shouldBe "x"
    // SQL surface
    DeltaSql.register("addcol_d", t)
    try {
      spark.sql(
        "ALTER TABLE graft_delta.addcol_d ADD COLUMNS (score DOUBLE)")
      DeltaInterop.read(spark, t).columns.sorted shouldBe
        Array("id", "note", "score", "v")
    } finally DeltaSql.unregister("addcol_d")
    intercept[IllegalArgumentException] {
      DeltaInterop.addColumns(spark, t, Seq(StructField("id", LongType)))
    }.getMessage should include("already exists")
  }

  test("MAPPED Delta addColumns assigns fresh field ids + physical " +
    "names and bumps maxColumnId; the next append stages physically") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 6L).map(i => (i, i * 2)).toDF("id", "v"), t,
      columnMapping = "name")
    DeltaInterop.addColumns(spark, t,
      Seq(StructField("note", StringType)))
    val st = DeltaInterop.state(spark, t, None)
    val noteField = st.schema("note")
    noteField.metadata.getString("delta.columnMapping.physicalName")
      .should(startWith("col-"))
    noteField.metadata.getLong("delta.columnMapping.id") should be >= 3L
    st.configuration("delta.columnMapping.maxColumnId").toLong should
      be >= noteField.metadata.getLong("delta.columnMapping.id")
    DeltaInterop.write(Seq((7L, 14L, "y")).toDF("id", "v", "note"), t)
    val out = DeltaInterop.read(spark, t)
    out.filter($"id" === 7L).select($"note").as[String].head() shouldBe "y"
    out.filter($"id" <= 6L && $"note".isNotNull).count() shouldBe 0L
    // new data files store ONLY physical names
    DeltaInterop.state(spark, t, None).files.foreach { a =>
      spark.read.parquet(new Path(t, a.path).toString)
        .columns.foreach(_ should startWith("col-"))
    }
  }

  test("Iceberg addColumns publishes a NEW schema node (fresh ids, " +
    "last-column-id bumped); old files serve NULL by id; SQL ALTER " +
    "routes; existing names refuse") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 10L).map(i => (i, i * 2)).toDF("id", "v"), t)
    IcebergInterop.addColumns(spark, t,
      Seq(StructField("note", StringType)))
    val st = IcebergInterop.state(spark, t, None)
    st.schema.fieldNames.sorted shouldBe Array("id", "note", "v")
    st.evo.fieldIds("note") shouldBe 3L
    val out = IcebergInterop.read(spark, t)
    out.filter($"note".isNotNull).count() shouldBe 0L
    IcebergInterop.write(Seq((11L, 22L, "x")).toDF("id", "v", "note"), t)
    val after = IcebergInterop.read(spark, t)
    after.filter($"id" === 11L).select($"note").as[String]
      .head() shouldBe "x"
    after.filter($"id" <= 10L && $"note".isNotNull).count() shouldBe 0L
    IcebergSql.register("addcol_i", t)
    try {
      spark.sql(
        "ALTER TABLE graft_iceberg.addcol_i ADD COLUMNS (score DOUBLE)")
      IcebergInterop.state(spark, t, None).schema.fieldNames.sorted shouldBe
        Array("id", "note", "score", "v")
    } finally IcebergSql.unregister("addcol_i")
    intercept[IllegalArgumentException] {
      IcebergInterop.addColumns(spark, t, Seq(StructField("id", LongType)))
    }.getMessage should include("already exists")
  }
}
