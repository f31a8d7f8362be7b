package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins Iceberg SCHEMA EVOLUTION end-to-end: metadata-only
  * rename/add/drop commits, field-id-based column resolution on read
  * (the spec's projection rule — a rename keeps the id, a drop+re-add
  * takes a fresh one), parquet footer field ids as the fallback
  * evidence when the adding snapshot has been expired, and time
  * travel serving each snapshot under the schema it was committed
  * with. */
class IcebergEvolutionSpec extends AnyFunSuite with Matchers
  with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-ice-evo").toString + "/t"

  test("rename is metadata-only: old files resolve by field id under " +
    "their physical name, appends use the new name, and time travel " +
    "serves the pre-rename schema") {
    import spark.implicits._
    val t = fresh()
    val s0 = IcebergInterop.write(
      (1L to 50L).map(i => (i, s"v$i")).toDF("id", "val"), t)
    IcebergInterop.renameColumn(spark, t, "val", "payload")
    // current read: renamed column carries the OLD files' values
    val afterRename = IcebergInterop.read(spark, t)
    afterRename.columns.toSeq shouldBe Seq("id", "payload")
    afterRename.filter($"payload".isNull).count() shouldBe 0L
    afterRename.filter($"id" === 7L).select($"payload")
      .as[String].head() shouldBe "v7"
    // append must speak the NEW name
    intercept[IllegalArgumentException] {
      IcebergInterop.write(Seq((51L, "v51")).toDF("id", "val"), t)
    }.getMessage should include("does not match")
    IcebergInterop.write(
      (51L to 60L).map(i => (i, s"v$i")).toDF("id", "payload"), t)
    val mixed = IcebergInterop.read(spark, t)
    mixed.count() shouldBe 60L
    mixed.filter($"payload".isNull).count() shouldBe 0L
    mixed.filter($"id" === 55L).select($"payload")
      .as[String].head() shouldBe "v55"
    // time travel to the pre-rename snapshot serves the OLD name
    IcebergInterop.readSnapshot(spark, t, s0)
      .columns.toSeq shouldBe Seq("id", "val")
  }

  test("addColumn null-fills existing files and requires appends to " +
    "carry it; dropColumn then re-add under the same name never " +
    "resurfaces the dropped values") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 20L).map(i => (i, i * 1.5)).toDF("id", "score"), t)
    IcebergInterop.addColumn(spark, t, "tag", LongType)
    val added = IcebergInterop.read(spark, t)
    added.columns.toSeq shouldBe Seq("id", "score", "tag")
    added.filter($"tag".isNotNull).count() shouldBe 0L
    IcebergInterop.write(
      (21L to 30L).map(i => (i, i * 1.5, i * 10)).toDF("id", "score", "tag"),
      t)
    val mixed = IcebergInterop.read(spark, t)
    mixed.filter($"tag".isNotNull).count() shouldBe 10L
    mixed.filter($"id" === 25L).select($"tag").as[Long].head() shouldBe 250L
    // drop score, re-add a column NAMED score: the fresh field id must
    // NOT bind to the old files' physical score column
    IcebergInterop.dropColumn(spark, t, "score")
    IcebergInterop.read(spark, t).columns.toSeq shouldBe Seq("id", "tag")
    IcebergInterop.addColumn(spark, t, "score", DoubleType)
    val readded = IcebergInterop.read(spark, t)
    readded.filter($"score".isNotNull).count() shouldBe 0L
    // and a new append's score rows DO serve
    IcebergInterop.write(
      Seq((31L, 99L, 3.25)).toDF("id", "tag", "score"), t)
    IcebergInterop.read(spark, t).filter($"score".isNotNull)
      .count() shouldBe 1L
  }

  test("evolution refusals: rename onto an existing name, add a " +
    "duplicate, drop the only column, drop a partition-spec source") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 8L).map(i => (i, s"c${i % 2}")).toDF("id", "cat"), t,
      partitionBy = Seq(IcebergInterop.SpecField("cat", "identity", "cat")))
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.renameColumn(spark, t, "id", "cat")
    }.getMessage should include("already exists")
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.addColumn(spark, t, "cat", LongType)
    }.getMessage should include("already exists")
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.dropColumn(spark, t, "cat")
    }.getMessage should include("partition spec")
    val t2 = fresh()
    IcebergInterop.write((1L to 3L).map(Tuple1(_)).toDF("id"), t2)
    intercept[IllegalArgumentException] {
      IcebergInterop.dropColumn(spark, t2, "id")
    }.getMessage should include("only column")
  }

  test("footer field ids are the fallback: after the adding snapshot " +
    "is expired, renamed columns still resolve (this writer stamps " +
    "parquet field ids)") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 30L).map(i => (i, s"v$i")).toDF("id", "val"), t)
    IcebergInterop.renameColumn(spark, t, "val", "payload")
    IcebergInterop.write(
      (31L to 40L).map(i => (i, s"v$i")).toDF("id", "payload"), t)
    // drop every snapshot but the newest: the gen-1 files' adding
    // snapshot is no longer in the metadata, so resolution must fall
    // back to the ids stamped in their parquet footers
    IcebergInterop.expireSnapshots(spark, t, keepLast = 1)
    val df = IcebergInterop.read(spark, t)
    df.count() shouldBe 40L
    df.filter($"payload".isNull).count() shouldBe 0L
    df.filter($"id" === 3L).select($"payload")
      .as[String].head() shouldBe "v3"
  }

  test("an append with narrower nullability does NOT evolve the " +
    "schema — field ids are stable across plain appends") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L, "a"))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", LongType, nullable = true),
          org.apache.spark.sql.types.StructField("s",
            org.apache.spark.sql.types.StringType, nullable = true)))), t)
    // toDF of a Seq gives non-nullable id — narrower than recorded
    IcebergInterop.write(Seq((2L, "b")).toDF("id", "s"), t)
    val st = IcebergInterop.state(spark, t, None)
    st.evo.schemaFields.size shouldBe 1
    st.evo.evolved shouldBe false
    IcebergInterop.read(spark, t).count() shouldBe 2L
  }

  test("value-bounds pruning survives a rename: bounds are field-id " +
    "keyed, so a predicate on the NEW name still prunes files written " +
    "under the old one") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 4000L).map(i => (i, s"v$i")).toDF("id", "val")
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"), t)
    IcebergInterop.renameColumn(spark, t, "id", "key")
    val pruned = IcebergInterop.readWhere(spark, t,
      Seq(ScanBetween("key", 1L, 500L)))
    pruned.count() shouldBe 500L
    // strictly fewer files scanned than live
    val live = IcebergInterop.state(spark, t, None).files.size
    pruned.inputFiles.length should be < live
  }

  test("type promotion int→long: old files read under their " +
    "write-time type and cast up, new appends land wide, values " +
    "survive exactly") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1 to 100).map(i => (i, i * 10)).toDF("id", "v"), t) // both INT
    IcebergInterop.promoteColumn(spark, t, "v", LongType)
    val st = IcebergInterop.state(spark, t, None)
    st.schema("v").dataType shouldBe LongType
    st.schema("id").dataType shouldBe
      org.apache.spark.sql.types.IntegerType
    // the promoted read serves the OLD int32 file under bigint
    val got = IcebergInterop.read(spark, t)
    got.schema("v").dataType shouldBe LongType
    got.count() shouldBe 100L
    got.agg(sum($"v")).as[Long].head() shouldBe
      (1 to 100).map(_ * 10L).sum
    // an append with the WIDE type composes with the narrow files
    IcebergInterop.write(
      Seq((101, 5000000000L)).toDF("id", "v"), t)
    val all = IcebergInterop.read(spark, t)
    all.count() shouldBe 101L
    all.filter($"id" === 101).select($"v").as[Long]
      .head() shouldBe 5000000000L
    all.filter($"id" === 7).select($"v").as[Long].head() shouldBe 70L
  }

  test("type promotion float→double and decimal precision widening; " +
    "illegal promotions refuse by name") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1 to 20).map(i => (i.toLong, i.toFloat,
        BigDecimal(i).setScale(2))).toDF("id", "f", "d")
        .select($"id", $"f", $"d".cast("decimal(10,2)").as("d")), t)
    IcebergInterop.promoteColumn(spark, t, "f", DoubleType)
    IcebergInterop.promoteColumn(spark, t, "d",
      org.apache.spark.sql.types.DecimalType(20, 2))
    val got = IcebergInterop.read(spark, t)
    got.schema("f").dataType shouldBe DoubleType
    got.schema("d").dataType shouldBe
      org.apache.spark.sql.types.DecimalType(20, 2)
    got.filter($"id" === 3L).select($"f").as[Double]
      .head() shouldBe 3.0d
    got.filter($"id" === 3L).select($"d".cast("string")).as[String]
      .head() shouldBe "3.00"
    // illegal: long→int (narrowing), decimal scale change
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.promoteColumn(spark, t, "id",
        org.apache.spark.sql.types.IntegerType)
    }.getMessage should include("promote")
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.promoteColumn(spark, t, "d",
        org.apache.spark.sql.types.DecimalType(20, 4))
    }.getMessage should include("equal scale")
  }

  test("promotion composes with rename and DML: the id-keyed read " +
    "serves renamed+promoted columns across a copy-on-write delete") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1 to 50).map(i => (i, i)).toDF("k", "v"), t)
    IcebergInterop.promoteColumn(spark, t, "v", LongType)
    IcebergInterop.renameColumn(spark, t, "v", "value")
    IcebergInterop.delete(spark, t, col("k") % 5 === 0)
    val got = IcebergInterop.read(spark, t)
    got.count() shouldBe 40L
    got.schema("value").dataType shouldBe LongType
    got.agg(sum($"value")).as[Long].head() shouldBe
      (1 to 50).filterNot(_ % 5 == 0).map(_.toLong).sum
  }
}
