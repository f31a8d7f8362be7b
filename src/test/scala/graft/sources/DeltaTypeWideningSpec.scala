package graft.sources

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The WRITE side of Delta `typeWidening` (PROTOCOL.md §Type
  * Widening): `ALTER COLUMN … TYPE <wider>` re-types the recorded
  * schema in one metadata-only commit — O(1) at any table size —
  * while existing files keep their narrow physical type and read
  * up-cast under the current schema. The field's
  * `delta.typeWidening.typeChanges` metadata is how foreign readers
  * know the narrow values are legitimate. */
class DeltaTypeWideningSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def fresh(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString + "/t"

  test("widen int->long and float->double: metadata-only commit, " +
    "narrow files read up-cast, wide appends land, typeChanges + " +
    "protocol recorded, SQL door") {
    import spark.implicits._
    val t = fresh("graft-delta-widen")
    DeltaInterop.write(
      (1 to 10).map(i => (i, i * 1.5f, s"s$i")).toDF("id", "f", "s"), t)
    val before = DeltaInterop.state(spark, t, None)
    val filesBefore = before.files.map(_.path).toSet

    val v = DeltaInterop.widenColumnType(spark, t, "id", LongType)
    v shouldBe before.version + 1
    val st = DeltaInterop.state(spark, t, None)
    // metadata-only: no file moved
    st.files.map(_.path).toSet shouldBe filesBefore
    st.schema("id").dataType shouldBe LongType
    // the spec's typeChanges entry, how a foreign reader learns the
    // narrow physical values are legitimate
    val changes = st.schema("id").metadata
      .getMetadataArray("delta.typeWidening.typeChanges")
    changes.length shouldBe 1
    changes(0).getString("fromType") shouldBe "integer"
    changes(0).getString("toType") shouldBe "long"
    // protocol: typeWidening on BOTH sides
    st.minReaderVersion shouldBe 3
    st.readerFeatures should contain("typeWidening")
    st.writerFeatures should contain("typeWidening")
    // the narrow file reads up-cast under the current schema
    val read1 = DeltaInterop.read(spark, t)
    read1.schema("id").dataType shouldBe LongType
    read1.agg(org.apache.spark.sql.functions.sum("id"))
      .head().getLong(0) shouldBe 55L
    // a wide append lands beside the narrow files
    DeltaInterop.write(
      Seq((3000000000L, 9.5f, "wide")).toDF("id", "f", "s"), t)
    DeltaInterop.read(spark, t).count() shouldBe 11L
    DeltaInterop.read(spark, t)
      .filter(col("id") > Int.MaxValue.toLong).count() shouldBe 1L

    // SQL door widens the float column; both narrow-float and
    // wide-double generations serve under double
    DeltaSql.register("widen_t", t)
    spark.sql("ALTER TABLE graft_delta.widen_t ALTER COLUMN f TYPE DOUBLE")
    val st2 = DeltaInterop.state(spark, t, None)
    st2.schema("f").dataType shouldBe DoubleType
    st2.schema("f").metadata
      .getMetadataArray("delta.typeWidening.typeChanges")(0)
      .getString("fromType") shouldBe "float"
    val fs = spark.sql("SELECT f FROM graft_delta.widen_t").collect()
      .map(_.getDouble(0))
    fs.length shouldBe 11
    fs.min shouldBe 1.5
    // a SECOND widening on id appends to the SAME typeChanges array
    DeltaInterop.widenColumnType(spark, t, "f", DoubleType) shouldBe
      st2.version // no-op: already double
  }

  test("refusals by name: narrowing, unsupported pair, partition " +
    "column, unknown column; chained widenings accumulate entries") {
    import spark.implicits._
    val t = fresh("graft-delta-widen2")
    DeltaInterop.write(
      (1 to 6).map(i => (i.toByte, s"p${i % 2}", i.toLong))
        .toDF("b", "p", "l"),
      t, partitionBy = Seq("p"))
    intercept[Exception](DeltaInterop.widenColumnType(spark, t, "l",
      IntegerType)).getMessage should include("not a widening")
    intercept[Exception](DeltaInterop.widenColumnType(spark, t, "b",
      StringType)).getMessage should include("not a widening")
    intercept[Exception](DeltaInterop.widenColumnType(spark, t, "p",
      IntegerType)).getMessage should include("partition column")
    intercept[Exception](DeltaInterop.widenColumnType(spark, t, "nope",
      LongType)).getMessage should include("no column")
    // byte -> short -> int: two entries, in order
    DeltaInterop.widenColumnType(spark, t, "b", ShortType)
    DeltaInterop.widenColumnType(spark, t, "b", IntegerType)
    val st = DeltaInterop.state(spark, t, None)
    st.schema("b").dataType shouldBe IntegerType
    val changes = st.schema("b").metadata
      .getMetadataArray("delta.typeWidening.typeChanges")
    changes.map(c => (c.getString("fromType"), c.getString("toType")))
      .toSeq shouldBe Seq(("byte", "short"), ("short", "integer"))
    DeltaInterop.read(spark, t)
      .agg(org.apache.spark.sql.functions.sum("b")).head()
      .getLong(0) shouldBe 21L
    // time travel BEFORE the widening still serves the narrow schema
    DeltaInterop.readVersion(spark, t, 0L).schema("b")
      .dataType shouldBe ByteType
  }
}
