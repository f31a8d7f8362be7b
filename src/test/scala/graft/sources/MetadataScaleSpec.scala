package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Synthetic MANY-FILE metadata bounds: a 10⁵-add Delta checkpoint
  * and a 10⁵-entry Iceberg manifest both resolve completely — the
  * streamed replay (`toLocalIterator` over checkpoint rows, one avro
  * stream per manifest) holds the state a 100 TB table's metadata
  * actually produces, pinning that neither path regresses to a
  * driver-materialized copy that dies before the count lands. */
class MetadataScaleSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val N = 100000

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-metascale")
      .toString + "/t"

  private def writeText(table: String, rel: String, text: String): Unit = {
    val p = new Path(table, rel)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  test(s"a $N-add Delta checkpoint resolves: every add survives the " +
    "streamed replay, the JSON tail applies on top") {
    import spark.implicits._
    val t = fresh()
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    val schemaJson =
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":{}}
        |]}""".stripMargin.replace("\n", "")
    val meta = DeltaInterop.CkRow(
      Some(DeltaInterop.CkProtocol(1, 2)),
      Some(DeltaInterop.CkMeta("big", DeltaInterop.CkFormat("parquet",
        Map.empty), schemaJson, Nil, Map.empty, 1L)), None)
    val adds = (0 until N).map(i => DeltaInterop.CkRow(None, None,
      Some(DeltaInterop.CkAdd(f"part-$i%06d.parquet", Map.empty,
        100L, 1L, dataChange = true))))
    val stage = fresh()
    (meta +: adds).toDF().coalesce(1).write.parquet(stage)
    val part = fs.listStatus(new Path(stage)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new Path(t, "_delta_log"))
    fs.rename(part, new Path(t,
      "_delta_log/00000000000000000005.checkpoint.parquet")) shouldBe true
    writeText(t, "_delta_log/_last_checkpoint",
      s"""{"version":5,"size":${N + 2}}""")
    // a JSON tail removing one file and adding another
    writeText(t, "_delta_log/00000000000000000006.json",
      s"""{"commitInfo":{"timestamp":1700000000000,"operation":"DELETE"}}
         |{"remove":{"path":"part-000000.parquet","deletionTimestamp":1,"dataChange":true}}
         |{"add":{"path":"extra.parquet","partitionValues":{},"size":100,"modificationTime":1,"dataChange":true}}
         |""".stripMargin)
    val st = DeltaInterop.state(spark, t, None)
    st.version shouldBe 6L
    st.files should have size (N.toLong - 1 + 1).toInt
    val paths = st.files.map(_.path)
    paths should contain("extra.parquet")
    paths should not contain "part-000000.parquet"
    paths should contain(f"part-${N - 1}%06d.parquet")
  }

  test(s"a $N-entry Iceberg manifest resolves: one avro stream, every " +
    "entry lands with its bounds-free fast shape") {
    val t = fresh()
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"snapshot_id","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
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
        |{"name":"added_snapshot_id","type":["null","long"],"default":null}
        |]}""".stripMargin.replace("\n", ""))
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    val mPath = new Path(t, "metadata/m-big.avro")
    fs.mkdirs(mPath.getParent)
    val out = fs.create(mPath, true)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](entrySchema))
    w.create(entrySchema, out)
    try {
      val dfSchema = entrySchema.getField("data_file").schema()
      val pSchema = dfSchema.getField("partition").schema()
      var i = 0
      while (i < N) { // streamed writer: never a 10⁵ list in memory
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1); e.put("snapshot_id", 7L)
        val d = new GenericData.Record(dfSchema)
        d.put("file_path", f"$t/data/part-$i%06d.parquet")
        d.put("file_format", "PARQUET")
        d.put("partition", new GenericData.Record(pSchema))
        d.put("record_count", 10L)
        d.put("file_size_in_bytes", 100L)
        e.put("data_file", d)
        w.append(e)
        i += 1
      }
    } finally w.close()
    val mLen = fs.getFileStatus(mPath).getLen
    val mf = new GenericData.Record(listSchema)
    mf.put("manifest_path", mPath.toString)
    mf.put("manifest_length", mLen)
    mf.put("partition_spec_id", 0)
    mf.put("added_snapshot_id", 7L)
    val listPath = new Path(t, "metadata/snap-7.avro")
    val out2 = fs.create(listPath, true)
    val w2 = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](listSchema))
    w2.create(listSchema, out2)
    try w2.append(mf) finally w2.close()
    writeText(t, "metadata/v1.metadata.json",
      s"""{"format-version":1,"table-uuid":"u","location":"$t",
         |"last-updated-ms":1,"last-column-id":1,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"id","required":false,"type":"long"}]}],
         |"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
         |"properties":{},"current-snapshot-id":7,
         |"snapshots":[{"snapshot-id":7,"timestamp-ms":1,
         |"summary":{"operation":"append"},
         |"manifest-list":"$listPath","schema-id":0}]
         |}""".stripMargin.replace("\n", ""))
    writeText(t, "metadata/version-hint.text", "1")
    val st = IcebergInterop.state(spark, t, None)
    st.files should have size N
    st.files.map(_.records).sum shouldBe N.toLong * 10
  }
}
