package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Iceberg v3 VARIANT columns serve natively: the v3 spec adopted the
  * same binary variant encoding Spark 4's parquet reader speaks, so a
  * by-name scan resolves the column and `variant_get` extraction
  * works downstream — the type-parser refusals stay for geometry /
  * geography / unknown / ns timestamps. */
class IcebergV3VariantSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-icev3v").toString + "/t"

  private def writeText(fs: org.apache.hadoop.fs.FileSystem, t: String,
                        rel: String, text: String): Unit = {
    val p = new Path(t, rel)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def metaJson(t: String, fileP: String, rows: Long,
                       bytes: Long, vType: String): String =
    s"""{"format-version":3,"table-uuid":"u3v","location":"$t",
       |"last-updated-ms":1,"last-column-id":2,"last-sequence-number":1,
       |"next-row-id":$rows,
       |"schemas":[{"type":"struct","schema-id":0,"fields":[
       |{"id":1,"name":"id","required":false,"type":"long"},
       |{"id":2,"name":"v","required":false,"type":"$vType"}]}],
       |"current-schema-id":0,
       |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
       |"properties":{},"current-snapshot-id":90,
       |"snapshots":[{"snapshot-id":90,"timestamp-ms":1,
       |"sequence-number":1,"first-row-id":0,"added-rows":$rows,
       |"summary":{"operation":"append"},
       |"manifest-list":"$t/metadata/ml.json","schema-id":0}]
       |}""".stripMargin.replace("\n", "")

  /** Hand-written v3 table over one staged parquet file carrying a
    * real Spark-written VARIANT column. */
  private def build(vType: String): (String, Long) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, parse_json}
    val t = fresh()
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    val stage = fresh()
    (0L until 5L).map(i => (i, s"""{"a":$i,"tag":"t$i"}"""))
      .toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("v"))
      .coalesce(1).write.parquet(stage)
    val part = fs.listStatus(new Path(stage)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new Path(t, "data"))
    val dest = new Path(t, "data/f1.parquet")
    fs.rename(part, dest) shouldBe true
    val len = fs.getFileStatus(dest).getLen
    // ManifestLake-free shape: reuse the avro-less manifest trick is
    // not available — write a real avro manifest pair like the
    // lineage spec does
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"snapshot_id","type":["null","long"],"default":null},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"content","type":"int","default":0},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"partition","type":{"type":"record","name":"rp","fields":[]}},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"}
        |]}}]}""".stripMargin.replace("\n", ""))
    val listSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"},
        |{"name":"content","type":"int","default":0},
        |{"name":"sequence_number","type":"long","default":0},
        |{"name":"added_snapshot_id","type":["null","long"],"default":null}
        |]}""".stripMargin.replace("\n", ""))
    def avro(rel: String, schema: org.apache.avro.Schema,
             rows: Seq[org.apache.avro.generic.GenericRecord])
        : (String, Long) = {
      val p = new Path(t, rel)
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      val w = new org.apache.avro.file.DataFileWriter[
        org.apache.avro.generic.GenericRecord](
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](schema))
      w.create(schema, out)
      try rows.foreach(w.append) finally w.close()
      (p.toString, fs.getFileStatus(p).getLen)
    }
    val e = new org.apache.avro.generic.GenericData.Record(entrySchema)
    e.put("status", 1); e.put("snapshot_id", 90L)
    e.put("sequence_number", 1L)
    val d = new org.apache.avro.generic.GenericData.Record(
      entrySchema.getField("data_file").schema())
    d.put("content", 0); d.put("file_path", dest.toString)
    d.put("file_format", "PARQUET")
    d.put("partition", new org.apache.avro.generic.GenericData.Record(
      entrySchema.getField("data_file").schema()
        .getField("partition").schema()))
    d.put("record_count", 5L); d.put("file_size_in_bytes", len)
    e.put("data_file", d)
    val (m, mLen) = avro("metadata/m0.avro", entrySchema, Seq(e))
    val mf = new org.apache.avro.generic.GenericData.Record(listSchema)
    mf.put("manifest_path", m); mf.put("manifest_length", mLen)
    mf.put("partition_spec_id", 0); mf.put("content", 0)
    mf.put("sequence_number", 1L); mf.put("added_snapshot_id", 90L)
    val (listPath, _) = avro("metadata/ml.avro", listSchema, Seq(mf))
    writeText(fs, t, "metadata/v1.metadata.json",
      metaJson(t, dest.toString, 5L, len, vType)
        .replace(s"$t/metadata/ml.json", listPath))
    writeText(fs, t, "metadata/version-hint.text", "1")
    (t, len)
  }

  test("a v3 variant column reads natively and variant_get extracts " +
    "typed values") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, variant_get}
    val (t, _) = build("variant")
    val df = IcebergInterop.read(spark, t)
    df.schema("v").dataType shouldBe
      org.apache.spark.sql.types.VariantType
    df.count() shouldBe 5L
    df.select(col("id"),
      variant_get(col("v"), "$.a", "long").as("a"),
      variant_get(col("v"), "$.tag", "string").as("tag"))
      .as[(Long, Long, String)].collect().sorted shouldBe
      (0L until 5L).map(i => (i, i, s"t$i")).toArray
    // row lineage rides the same scan (v3 table, stamped origins
    // absent → snapshot-origin inheritance)
    IcebergInterop.readRowLineage(spark, t)
      .filter(col("id") === 3L)
      .select(col("_row_id")).as[Long].head() shouldBe 3L
  }

  test("the OTHER v3 types stay refused by name") {
    Seq("geometry", "unknown", "timestamp_ns").foreach { bad =>
      val (t, _) = build(bad)
      intercept[IcebergInterop.UnsupportedIcebergFeatureException](
        IcebergInterop.read(spark, t))
        .getMessage should include(bad)
    }
  }
}
