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

  test("Delta RENAME/DROP COLUMN: mapped tables evolve metadata-only " +
    "over stable physical names; unmapped tables refuse by name; SQL " +
    "routes both verbs") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 8L).map(i => (i, i * 2, s"p$i"))
      .toDF("id", "v", "payload"), t, columnMapping = "name")
    DeltaInterop.renameColumn(spark, t, "v", "value")
    val out = DeltaInterop.read(spark, t)
    out.columns.sorted shouldBe Array("id", "payload", "value")
    out.filter($"id" === 3L).select($"value").as[Long].head() shouldBe 6L
    DeltaInterop.dropColumns(spark, t, Seq("payload"))
    val out2 = DeltaInterop.read(spark, t)
    out2.columns.sorted shouldBe Array("id", "value")
    out2.count() shouldBe 8L
    // SQL surface
    DeltaSql.register("evo_d", t)
    try {
      spark.sql(
        "ALTER TABLE graft_delta.evo_d RENAME COLUMN value TO amount")
      spark.sql("SELECT sum(amount) AS s FROM graft_delta.evo_d")
        .as[Long].head() shouldBe (1L to 8L).map(_ * 2).sum
      spark.sql("ALTER TABLE graft_delta.evo_d DROP COLUMN amount")
      DeltaInterop.read(spark, t).columns shouldBe Array("id")
    } finally DeltaSql.unregister("evo_d")
    // unmapped tables refuse both verbs by name
    val t2 = fresh()
    DeltaInterop.write(Seq((1L, 2L)).toDF("id", "v"), t2)
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.renameColumn(spark, t2, "v", "w")
    }.getMessage should include("column mapping")
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.dropColumns(spark, t2, Seq("v"))
    }.getMessage should include("column mapping")
  }

  test("Iceberg RENAME/DROP COLUMN through SQL: by-id resolution keeps " +
    "serving old files under the new name; dropped ids retire") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 8L).map(i => (i, i * 2, s"p$i"))
      .toDF("id", "v", "payload"), t)
    IcebergSql.register("evo_i", t)
    try {
      spark.sql(
        "ALTER TABLE graft_iceberg.evo_i RENAME COLUMN v TO amount")
      spark.sql("SELECT sum(amount) AS s FROM graft_iceberg.evo_i")
        .as[Long].head() shouldBe (1L to 8L).map(_ * 2).sum
      spark.sql("ALTER TABLE graft_iceberg.evo_i DROP COLUMN payload")
      val out = IcebergInterop.read(spark, t)
      out.columns.sorted shouldBe Array("amount", "id")
      out.count() shouldBe 8L
      // re-adding the dropped name takes a FRESH id: old values never
      // resurface
      spark.sql(
        "ALTER TABLE graft_iceberg.evo_i ADD COLUMNS (payload STRING)")
      IcebergInterop.read(spark, t)
        .filter($"payload".isNotNull).count() shouldBe 0L
    } finally IcebergSql.unregister("evo_i")
  }
}
