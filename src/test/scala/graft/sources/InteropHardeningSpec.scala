package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the open-format interop hardening: overwrite schema changes
  * republish Delta metaData, appends compare types (not just names),
  * partial multi-part checkpoints are skipped, Iceberg table identity
  * (uuid / field ids / snapshot-log) carries across commits, and
  * commit publication is atomic create-if-absent rather than
  * exists()+rename. */
class InteropHardeningSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def writeText(table: String, rel: String, text: String): Unit = {
    val p = new Path(table, rel)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readText(table: String, rel: String): String = {
    val p = new Path(table, rel)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try {
      val outBytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, outBytes, 65536, false)
      new String(outBytes.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  // ------------------------------------------------------------- Delta

  test("Delta overwrite with a changed schema republishes metaData in " +
    "the same commit — reads serve the NEW schema, not the stale one") {
    import spark.implicits._
    val t = fresh("graft-dh")
    DeltaInterop.write(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"), t)
    DeltaInterop.state(spark, t, None).schema.fieldNames shouldBe
      Array("id", "payload")
    // overwrite with a different column set: qty replaces payload
    DeltaInterop.write(Seq((10L, 5L), (11L, 7L)).toDF("id", "qty"), t,
      overwrite = true)
    val st = DeltaInterop.state(spark, t, None)
    st.schema.fieldNames shouldBe Array("id", "qty")
    DeltaInterop.read(spark, t).select($"id", $"qty").as[(Long, Long)]
      .collect().sorted shouldBe Array((10L, 5L), (11L, 7L))
    // time travel still serves version 0 under ITS schema
    DeltaInterop.readVersion(spark, t, 0L).schema.fieldNames shouldBe
      Array("id", "payload")
  }

  test("Delta append re-typing a same-name column refuses by name " +
    "instead of writing files that disagree with the recorded schema") {
    import spark.implicits._
    val t = fresh("graft-dh")
    DeltaInterop.write(Seq((1L, "a")).toDF("id", "payload"), t)
    intercept[IllegalArgumentException] {
      DeltaInterop.write(Seq((2L, 99L)).toDF("id", "payload"), t)
    }.getMessage should include("re-types")
    // same shape still appends fine
    DeltaInterop.write(Seq((2L, "b")).toDF("id", "payload"), t)
    DeltaInterop.read(spark, t).count() shouldBe 2L
  }

  test("Delta: a partially written multi-part checkpoint (missing " +
    "parts) is skipped — resolution replays the JSON log instead of " +
    "serving an incomplete file set") {
    import spark.implicits._
    val t = fresh("graft-dh")
    DeltaInterop.write(Seq((1L, "a")).toDF("id", "payload"), t)
    DeltaInterop.write(Seq((2L, "b")).toDF("id", "payload"), t)
    // a crashed writer left part 1-of-2 of a v1 checkpoint, never part
    // 2: the file is not even valid parquet, so reading it would throw
    writeText(t, "_delta_log/" +
      "00000000000000000001.checkpoint.0000000001.0000000002.parquet",
      "NOT PARQUET — must never be read")
    DeltaInterop.read(spark, t).select($"id").as[Long]
      .collect().sorted shouldBe Array(1L, 2L)
    // a COMPLETE single-part checkpoint at the same version is still
    // preferred over replay once it exists
    DeltaInterop.checkpoint(spark, t)
    DeltaInterop.read(spark, t).count() shouldBe 2L
  }

  test("Delta deletion vectors are APPLIED on read — file-based (u) and " +
    "inline (i) storage, z85 + roaring round-trips, time travel before " +
    "the DV serves every row; vectored states checkpoint; import refuses") {
    import spark.implicits._
    val t = fresh("graft-ddv")
    val root = new Path(t)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def parquetFile(rel: String, df: org.apache.spark.sql.DataFrame): Long = {
      val stage = fresh("graft-ddv-stage")
      df.coalesce(1).write.parquet(stage)
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      val dest = new Path(t, rel)
      fs.mkdirs(dest.getParent)
      fs.rename(part, dest) shouldBe true
      fs.getFileStatus(dest).getLen
    }
    // the codec round-trips, including multi-container values
    val probe = Seq(0L, 1L, 4095L, 70000L, (1L << 32) + 7L)
    DeltaDv.deserialize(DeltaDv.serialize(probe)).sorted shouldBe
      probe.sorted.toArray
    val s1 = parquetFile("f1.parquet",
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "payload"))
    val s2 = parquetFile("f2.parquet", Seq((9L, "z")).toDF("id", "payload"))
    val schemaJson = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, payload STRING").json
    def meta = s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":${
      DeltaJsonTestUtil.jstr(schemaJson)
    },"partitionColumns":[],"configuration":{},"createdTime":1}}"""
    writeText(t, "_delta_log/00000000000000000000.json",
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}
         |$meta
         |{"add":{"path":"f1.parquet","partitionValues":{},"size":$s1,"modificationTime":1,"dataChange":true}}
         |{"add":{"path":"f2.parquet","partitionValues":{},"size":$s2,"modificationTime":1,"dataChange":true}}
         |""".stripMargin)
    // v1: f1 gains a FILE-based DV killing row positions 1 and 3
    val (dvId, off, size) = DeltaDv.writeDvFile(fs, root, Seq(1L, 3L))
    writeText(t, "_delta_log/00000000000000000001.json",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$s1,"modificationTime":2,"dataChange":false,"deletionVector":{"storageType":"u","pathOrInlineDv":"$dvId","offset":$off,"sizeInBytes":$size,"cardinality":2}}}
         |""".stripMargin)
    DeltaInterop.read(spark, t).select($"id").as[Long]
      .collect().sorted shouldBe Array(1L, 3L, 9L)
    // time travel BEFORE the DV serves every row
    DeltaInterop.readVersion(spark, t, 0L).select($"id").as[Long]
      .collect().sorted shouldBe Array(1L, 2L, 3L, 4L, 9L)
    // a DV-bearing state CHECKPOINTS (per-add deletionVector structs
    // + the table-features protocol row) and replays exactly; the
    // metadata-only import still refuses (the manifest would borrow
    // files whose dead rows it cannot see)
    DeltaInterop.checkpoint(spark, t) shouldBe 1L
    DeltaInterop.read(spark, t).select($"id").as[Long]
      .collect().sorted shouldBe Array(1L, 3L, 9L)
    intercept[IllegalArgumentException] {
      DeltaInterop.importToManifest(spark, t)
    }.getMessage should include("resurrect")
    // v2: the DV is replaced by an INLINE vector killing position 0
    val inlineData = DeltaDv.serialize(Seq(0L))
    writeText(t, "_delta_log/00000000000000000002.json",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$s1,"modificationTime":3,"dataChange":false,"deletionVector":{"storageType":"i","pathOrInlineDv":"${
        DeltaDv.z85EncodePadded(inlineData)
      }","offset":0,"sizeInBytes":${inlineData.length},"cardinality":1}}}
         |""".stripMargin)
    DeltaInterop.read(spark, t).select($"id").as[Long]
      .collect().sorted shouldBe Array(2L, 3L, 4L, 9L)
    // PURGE rewrites the vectored files clean: reads unchanged, the
    // vectors are gone, and the refused maintenance applies again
    DeltaInterop.purgeDeletionVectors(spark, t)
    DeltaInterop.read(spark, t).select($"id").as[Long]
      .collect().sorted shouldBe Array(2L, 3L, 4L, 9L)
    DeltaInterop.state(spark, t, None).files
      .forall(_.dv.isEmpty) shouldBe true
    DeltaInterop.checkpoint(spark, t)
    DeltaInterop.read(spark, t).count() shouldBe 4L
  }

  // ----------------------------------------------------------- Iceberg

  test("Iceberg commits carry table identity forward: stable " +
    "table-uuid, accumulated snapshot-log, schema JSON reused verbatim " +
    "on append and same-shape overwrite") {
    import spark.implicits._
    val t = fresh("graft-ih")
    def meta(v: Long): String = readText(t, s"metadata/v$v.metadata.json")
    IcebergInterop.write(Seq((1L, "a")).toDF("id", "payload"), t)
    val m1 = meta(1)
    val UuidRe = """"table-uuid":"([^"]+)"""".r
    val uuid1 = UuidRe.findFirstMatchIn(m1).get.group(1)
    IcebergInterop.write(Seq((2L, "b")).toDF("id", "payload"), t)
    val m2 = meta(2)
    UuidRe.findFirstMatchIn(m2).get.group(1) shouldBe uuid1
    // snapshot-log accumulates instead of resetting
    def logIds(m: String): Seq[String] =
      """"snapshot-log":\[(.*?)\]""".r.findFirstMatchIn(m).get.group(1)
        .split("\\},\\{").toSeq.filter(_.nonEmpty)
    logIds(m1).length shouldBe 1
    logIds(m2).length shouldBe 2
    // same-shape overwrite keeps identity too
    IcebergInterop.write(Seq((9L, "z")).toDF("id", "payload"), t,
      overwrite = true)
    val m3 = meta(3)
    UuidRe.findFirstMatchIn(m3).get.group(1) shouldBe uuid1
    logIds(m3).length shouldBe 3
    IcebergInterop.read(spark, t).select($"id").as[Long]
      .collect() shouldBe Array(9L)
  }

  test("Iceberg append to a FOREIGN table preserves its original " +
    "(non-positional) field ids — id-based column resolution by a real " +
    "client keeps binding the same columns") {
    import spark.implicits._
    val t = fresh("graft-ih")
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    // one data file
    val stage = fresh("graft-ih-stage")
    Seq((1L, "a")).toDF("id", "payload").coalesce(1).write.parquet(stage)
    val part = fs.listStatus(new Path(stage)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val dataDest = new Path(t, "data/f1.parquet")
    fs.mkdirs(dataDest.getParent)
    fs.rename(part, dataDest) shouldBe true
    // minimal v1 manifest + list, hand-written
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
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
    def avro(rel: String, schema: org.apache.avro.Schema,
             rows: Seq[GenericRecord]): (String, Long) = {
      val p = new Path(t, rel)
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out)
      try rows.foreach(w.append) finally w.close()
      (p.toString, fs.getFileStatus(p).getLen)
    }
    val e = new GenericData.Record(entrySchema)
    e.put("status", 1)
    val d = new GenericData.Record(entrySchema.getField("data_file").schema())
    d.put("file_path", dataDest.toString)
    d.put("file_format", "PARQUET")
    d.put("record_count", 1L)
    d.put("file_size_in_bytes", fs.getFileStatus(dataDest).getLen)
    e.put("data_file", d)
    val (mPath, mLen) = avro("metadata/m1.avro", entrySchema, Seq(e))
    val mf = new GenericData.Record(listSchema)
    mf.put("manifest_path", mPath)
    mf.put("manifest_length", mLen)
    mf.put("partition_spec_id", 0)
    mf.put("added_snapshot_id", 77L)
    val (listPath, _) = avro("metadata/snap-77-1-x.avro", listSchema, Seq(mf))
    // the foreign table's field ids are 11 and 22 — NOT positional
    writeText(t, "metadata/v5.metadata.json",
      s"""{"format-version":1,"table-uuid":"foreign-uuid","location":"$t",
         |"last-updated-ms":1,"last-column-id":22,
         |"schemas":[{"type":"struct","schema-id":3,"fields":[
         |{"id":11,"name":"id","required":false,"type":"long"},
         |{"id":22,"name":"payload","required":true,"type":"string"}]}],
         |"current-schema-id":3,
         |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
         |"properties":{},"current-snapshot-id":77,
         |"snapshots":[{"snapshot-id":77,"timestamp-ms":1,
         |"summary":{"operation":"append"},
         |"manifest-list":"$listPath","schema-id":3}],
         |"snapshot-log":[{"timestamp-ms":1,"snapshot-id":77}]
         |}""".stripMargin.replace("\n", ""))
    writeText(t, "metadata/version-hint.text", "5")
    // append through our writer: id nullable matches, payload must be
    // non-nullable to satisfy required=true
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val appendSchema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("payload", StringType, nullable = false)))
    val nonNull = spark.createDataFrame(
      java.util.Arrays.asList(Row(2L, "b")), appendSchema)
    IcebergInterop.write(nonNull, t)
    val m6 = readText(t, "metadata/v6.metadata.json")
    m6 should include(""""table-uuid":"foreign-uuid"""")
    m6 should include(""""id":11""")
    m6 should include(""""id":22""")
    m6 should include(""""last-column-id":22""")
    m6 should include(""""current-schema-id":3""")
    IcebergInterop.read(spark, t).count() shouldBe 2L
  }

  test("Iceberg v2 position deletes are APPLIED on read: deleted rows " +
    "drop, other files are untouched, time travel before the delete " +
    "still serves them; equality deletes refuse by name") {
    import spark.implicits._
    val t = fresh("graft-ipd")
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    def parquetFile(rel: String, df: org.apache.spark.sql.DataFrame): String = {
      val stage = fresh("graft-ipd-stage")
      df.coalesce(1).write.parquet(stage)
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      val dest = new Path(t, rel)
      fs.mkdirs(dest.getParent)
      fs.rename(part, dest) shouldBe true
      dest.toString
    }
    // two data files; the delete file kills rows 1 and 3 (0-based) of f1
    val f1 = parquetFile("data/f1.parquet",
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "payload"))
    val f2 = parquetFile("data/f2.parquet",
      Seq((9L, "z")).toDF("id", "payload"))
    val del = parquetFile("data/del1.parquet",
      Seq((f1, 1L), (f1, 3L)).toDF("file_path", "pos"))
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"content","type":"int","default":0},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"}
        |]}}]}""".stripMargin.replace("\n", ""))
    val listSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"},
        |{"name":"content","type":"int","default":0},
        |{"name":"added_snapshot_id","type":["null","long"],"default":null}
        |]}""".stripMargin.replace("\n", ""))
    def avro(rel: String, schema: org.apache.avro.Schema,
             rows: Seq[GenericRecord]): (String, Long) = {
      val p = new Path(t, rel)
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out)
      try rows.foreach(w.append) finally w.close()
      (p.toString, fs.getFileStatus(p).getLen)
    }
    def entry(content: Int, path: String, n: Long): GenericRecord = {
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      val d = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      d.put("content", content)
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      d.put("record_count", n)
      d.put("file_size_in_bytes", 1L)
      e.put("data_file", d)
      e
    }
    val (mData, mDataLen) = avro("metadata/m-data.avro", entrySchema,
      Seq(entry(0, f1, 4L), entry(0, f2, 1L)))
    val (mDel, mDelLen) = avro("metadata/m-del.avro", entrySchema,
      Seq(entry(1, del, 2L)))
    def listRow(path: String, len: Long, content: Int): GenericRecord = {
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", path)
      r.put("manifest_length", len)
      r.put("partition_spec_id", 0)
      r.put("content", content)
      r.put("added_snapshot_id", 77L)
      r
    }
    // snapshot 77: data only; snapshot 78: data + position deletes
    val (list77, _) = avro("metadata/snap-77.avro", listSchema,
      Seq(listRow(mData, mDataLen, 0)))
    val (list78, _) = avro("metadata/snap-78.avro", listSchema,
      Seq(listRow(mData, mDataLen, 0), listRow(mDel, mDelLen, 1)))
    val schemaJson =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"payload","required":false,"type":"string"}]}"""
        .stripMargin.replace("\n", "")
    writeText(t, "metadata/v3.metadata.json",
      s"""{"format-version":2,"table-uuid":"u","location":"$t",
         |"last-updated-ms":2,"last-column-id":2,
         |"schemas":[$schemaJson],"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
         |"properties":{},"current-snapshot-id":78,
         |"snapshots":[
         |{"snapshot-id":77,"timestamp-ms":1,
         |"summary":{"operation":"append"},
         |"manifest-list":"$list77","schema-id":0},
         |{"snapshot-id":78,"timestamp-ms":2,
         |"summary":{"operation":"delete"},
         |"manifest-list":"$list78","schema-id":0}]
         |}""".stripMargin.replace("\n", ""))
    writeText(t, "metadata/version-hint.text", "3")
    // head read: rows 2 and 4 of f1 deleted by position, f2 intact
    IcebergInterop.read(spark, t).select($"id").as[Long]
      .collect().sorted shouldBe Array(1L, 3L, 9L)
    // time travel BEFORE the delete still serves every row
    IcebergInterop.readSnapshot(spark, t, 77L).select($"id").as[Long]
      .collect().sorted shouldBe Array(1L, 2L, 3L, 4L, 9L)
    // a metadata-only import would resurrect the deleted rows — refuse
    intercept[IllegalArgumentException] {
      IcebergInterop.importToManifest(spark, t)
    }.getMessage should include("resurrect")
    // COMPACT rewrites the deletes away: reads unchanged, no delete
    // manifests left, and appends apply again
    IcebergInterop.compactDeletes(spark, t)
    IcebergInterop.read(spark, t).select($"id").as[Long]
      .collect().sorted shouldBe Array(1L, 3L, 9L)
    IcebergInterop.state(spark, t, None).posDeletes shouldBe empty
    IcebergInterop.write(Seq((100L, "q")).toDF("id", "payload"), t)
    IcebergInterop.read(spark, t).count() shouldBe 4L
    // equality deletes refuse by name
    val (mEq, mEqLen) = avro("metadata/m-eq.avro", entrySchema,
      Seq(entry(2, del, 1L)))
    val (list79, _) = avro("metadata/snap-79.avro", listSchema,
      Seq(listRow(mData, mDataLen, 0), listRow(mEq, mEqLen, 1)))
    writeText(t, "metadata/v9.metadata.json",
      s"""{"format-version":2,"table-uuid":"u","location":"$t",
         |"last-updated-ms":3,"last-column-id":2,
         |"schemas":[$schemaJson],"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
         |"properties":{},"current-snapshot-id":79,
         |"snapshots":[{"snapshot-id":79,"timestamp-ms":3,
         |"summary":{"operation":"delete"},
         |"manifest-list":"$list79","schema-id":0}]
         |}""".stripMargin.replace("\n", ""))
    writeText(t, "metadata/version-hint.text", "9")
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.read(spark, t)
    }.getMessage should include("equality_ids")
  }

  test("Iceberg v2 EQUALITY deletes apply sequence-number-aware: " +
    "matching rows in older files drop, a re-insert in a NEWER file " +
    "survives, sequence numbers inherit from the manifest list, and " +
    "compaction rewrites the deletes away") {
    import spark.implicits._
    val t = fresh("graft-ieq")
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    def parquetFile(rel: String, df: org.apache.spark.sql.DataFrame): String = {
      val stage = fresh("graft-ieq-stage")
      df.coalesce(1).write.parquet(stage)
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      val dest = new Path(t, rel)
      fs.mkdirs(dest.getParent)
      fs.rename(part, dest) shouldBe true
      dest.toString
    }
    // f1 @ seq 1; an equality delete on id ∈ {2, 4} @ seq 2; f2 @ seq 3
    // RE-INSERTS id 2 — it must survive the older delete
    val f1 = parquetFile("data/f1.parquet",
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "payload"))
    val f2 = parquetFile("data/f2.parquet",
      Seq((2L, "b-again")).toDF("id", "payload"))
    val eqDel = parquetFile("data/eqdel.parquet",
      Seq(Tuple1(2L), Tuple1(4L)).toDF("id"))
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"content","type":"int","default":0},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"},
        |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}
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
             rows: Seq[GenericRecord]): (String, Long) = {
      val p = new Path(t, rel)
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out)
      try rows.foreach(w.append) finally w.close()
      (p.toString, fs.getFileStatus(p).getLen)
    }
    def entry(content: Int, path: String, n: Long,
              seq: Option[Long], eqIds: Seq[Int]): GenericRecord = {
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      seq.foreach(s => e.put("sequence_number", s))
      val d = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      d.put("content", content)
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      d.put("record_count", n)
      d.put("file_size_in_bytes", 1L)
      if (eqIds.nonEmpty) {
        val arr = new java.util.ArrayList[Integer]()
        eqIds.foreach(i => arr.add(i))
        d.put("equality_ids", arr)
      }
      e.put("data_file", d)
      e
    }
    // entry seq inherits from the LIST row for f1/f2 (null entry seq);
    // the delete entry carries its own explicit sequence number
    val (m1, m1Len) = avro("metadata/m1.avro", entrySchema,
      Seq(entry(0, f1, 4L, None, Nil)))
    val (m2, m2Len) = avro("metadata/m2.avro", entrySchema,
      Seq(entry(0, f2, 1L, None, Nil)))
    val (mD, mDLen) = avro("metadata/md.avro", entrySchema,
      Seq(entry(2, eqDel, 2L, Some(2L), Seq(1))))
    def listRow(path: String, len: Long, content: Int,
                seq: Long): GenericRecord = {
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", path)
      r.put("manifest_length", len)
      r.put("partition_spec_id", 0)
      r.put("content", content)
      r.put("sequence_number", seq)
      r.put("added_snapshot_id", 80L)
      r
    }
    val (list80, _) = avro("metadata/snap-80.avro", listSchema, Seq(
      listRow(m1, m1Len, 0, 1L),
      listRow(m2, m2Len, 0, 3L),
      listRow(mD, mDLen, 1, 2L)))
    val schemaJson =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"payload","required":false,"type":"string"}]}"""
        .stripMargin.replace("\n", "")
    writeText(t, "metadata/v3.metadata.json",
      s"""{"format-version":2,"table-uuid":"u","location":"$t",
         |"last-updated-ms":1,"last-column-id":2,
         |"schemas":[$schemaJson],"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
         |"properties":{},"current-snapshot-id":80,
         |"snapshots":[{"snapshot-id":80,"timestamp-ms":1,
         |"summary":{"operation":"delete"},
         |"manifest-list":"$list80","schema-id":0}]
         |}""".stripMargin.replace("\n", ""))
    writeText(t, "metadata/version-hint.text", "3")
    // f1 (seq 1 < 2) loses ids 2 and 4; f2's re-inserted id 2
    // (seq 3 > 2) SURVIVES
    IcebergInterop.read(spark, t)
      .select($"id", $"payload").as[(Long, String)].collect().sorted shouldBe
      Array((1L, "a"), (2L, "b-again"), (3L, "c"))
    // import refuses while deletes are live
    intercept[IllegalArgumentException] {
      IcebergInterop.importToManifest(spark, t)
    }.getMessage should include("resurrect")
    // compaction rewrites the deletes away; reads unchanged, appends OK
    IcebergInterop.compactDeletes(spark, t)
    IcebergInterop.read(spark, t)
      .select($"id", $"payload").as[(Long, String)].collect().sorted shouldBe
      Array((1L, "a"), (2L, "b-again"), (3L, "c"))
    IcebergInterop.state(spark, t, None).eqDeletes shouldBe empty
    IcebergInterop.write(Seq((7L, "g")).toDF("id", "payload"), t)
    IcebergInterop.read(spark, t).count() shouldBe 4L
  }

  test("Iceberg overwrite with a CHANGED schema evolves per spec: new " +
    "schema-id, field ids continue from last-column-id, prior schemas " +
    "stay resolvable; append re-types refuse by name") {
    import spark.implicits._
    val t = fresh("graft-ih")
    IcebergInterop.write(Seq((1L, "a")).toDF("id", "payload"), t)
    intercept[IllegalArgumentException] {
      IcebergInterop.write(Seq((2L, 99L)).toDF("id", "payload"), t)
    }.getMessage should include("re-types")
    IcebergInterop.write(Seq((10L, 5L)).toDF("id", "qty"), t,
      overwrite = true)
    val m2 = readText(t, "metadata/v2.metadata.json")
    // new ids continue from the prior last-column-id (2): qty cols are
    // 3 and 4, schema-id bumps to 1, the old schema-id 0 is retained
    m2 should include(""""current-schema-id":1""")
    m2 should include(""""last-column-id":4""")
    m2 should include(""""schema-id":0""")
    IcebergInterop.read(spark, t).select($"qty").as[Long]
      .collect() shouldBe Array(5L)
  }

  test("MIXED-FORMAT Iceberg table (add_files migration shape): ORC " +
    "and AVRO data files serve by name next to parquet, identity " +
    "tuples fill their missing partition column, DML refuses by " +
    "name") {
    import spark.implicits._
    val t = fresh("graft-ih-mixed")
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    def stageOne(fmt: String, name: String,
                 df: org.apache.spark.sql.DataFrame): (String, Long) = {
      val stage = fresh("graft-ih-mixed-stage")
      if (fmt == "orc") df.coalesce(1).write.orc(stage)
      else df.coalesce(1).write.parquet(stage)
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(s".$fmt")).get
      val dest = new Path(t, s"data/$name")
      fs.mkdirs(dest.getParent)
      fs.rename(part, dest) shouldBe true
      (dest.toString, fs.getFileStatus(dest).getLen)
    }
    // parquet file carries (id, v, pri); the migrated ORC file OMITS
    // the identity-partition source `pri` — the tuple must restore it
    val (pq, pqLen) = stageOne("parquet", "f1.parquet",
      (1L to 5L).map(i => (i, i * 10L, "A")).toDF("id", "v", "pri"))
    val (orc, orcLen) = stageOne("orc", "f2.orc",
      (6L to 10L).map(i => (i, i * 10L)).toDF("id", "v"))
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"partition","type":{"type":"record","name":"rp","fields":[
        |    {"name":"pri","type":["null","string"],"default":null}]}},
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
    def avro(rel: String, schema: org.apache.avro.Schema,
             rows: Seq[GenericRecord]): (String, Long) = {
      val p = new Path(t, rel)
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out)
      try rows.foreach(w.append) finally w.close()
      (p.toString, fs.getFileStatus(p).getLen)
    }
    def entry(path: String, fmt: String, len: Long,
              pri: String): GenericRecord = {
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      val d = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      d.put("file_path", path); d.put("file_format", fmt)
      val p = new GenericData.Record(entrySchema
        .getField("data_file").schema().getField("partition").schema())
      p.put("pri", pri)
      d.put("partition", p)
      d.put("record_count", 5L); d.put("file_size_in_bytes", len)
      e.put("data_file", d)
      e
    }
    val (mPath, mLen) = avro("metadata/m1.avro", entrySchema, Seq(
      entry(pq, "PARQUET", pqLen, "A"), entry(orc, "ORC", orcLen, "B")))
    val mf = new GenericData.Record(listSchema)
    mf.put("manifest_path", mPath); mf.put("manifest_length", mLen)
    mf.put("partition_spec_id", 0); mf.put("added_snapshot_id", 50L)
    val (listPath, _) = avro("metadata/snap-50.avro", listSchema, Seq(mf))
    writeText(t, "metadata/v1.metadata.json",
      s"""{"format-version":1,"table-uuid":"mx","location":"$t",
         |"last-updated-ms":1,"last-column-id":3,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"id","required":false,"type":"long"},
         |{"id":2,"name":"v","required":false,"type":"long"},
         |{"id":3,"name":"pri","required":false,"type":"string"}]}],
         |"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[
         |{"name":"pri","transform":"identity","source-id":3,"field-id":1000}]}],
         |"default-spec-id":0,
         |"properties":{},"current-snapshot-id":50,
         |"snapshots":[{"snapshot-id":50,"timestamp-ms":1,
         |"summary":{"operation":"append"},
         |"manifest-list":"$listPath","schema-id":0}]
         |}""".stripMargin.replace("\n", ""))
    writeText(t, "metadata/version-hint.text", "1")
    val out = IcebergInterop.read(spark, t)
    out.count() shouldBe 10L
    // parquet rows keep their recorded tuple; the ORC file's missing
    // pri column fills from ITS tuple
    out.filter($"pri" === "A").select($"id").as[Long]
      .collect().sorted shouldBe (1L to 5L).toArray
    out.filter($"pri" === "B").select($"id").as[Long]
      .collect().sorted shouldBe (6L to 10L).toArray
    out.filter($"id" === 7L).select($"v").as[Long].head() shouldBe 70L
    // DML over a mixed table refuses by name (no parquet row_index on
    // the ORC side)
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.delete(spark, t, $"id" === 1L)
    }.getMessage should include("ORC")
    // an avro DATA file serves too (r14: jar-less GenericDatumReader
    // scan by name) — write one OMITTING pri like the ORC file, so
    // the identity tuple must fill it
    val avroRowSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"row","fields":[
        |{"name":"id","type":["null","long"],"default":null},
        |{"name":"v","type":["null","long"],"default":null}
        |]}""".stripMargin.replace("\n", ""))
    val (avroData, avroLen) = avro("data/f3.avro", avroRowSchema,
      (11L to 15L).map { i =>
        val r = new GenericData.Record(avroRowSchema)
        r.put("id", i); r.put("v", i * 10L)
        r
      })
    val (mPath2, mLen2) = avro("metadata/m2.avro", entrySchema, Seq(
      entry(pq, "PARQUET", pqLen, "A"),
      entry(orc, "ORC", orcLen, "B"),
      entry(avroData, "AVRO", avroLen, "C")))
    val mf2 = new GenericData.Record(listSchema)
    mf2.put("manifest_path", mPath2); mf2.put("manifest_length", mLen2)
    mf2.put("partition_spec_id", 0); mf2.put("added_snapshot_id", 51L)
    val (listPath2, _) = avro("metadata/snap-51.avro", listSchema, Seq(mf2))
    writeText(t, "metadata/v2.metadata.json",
      s"""{"format-version":1,"table-uuid":"mx","location":"$t",
         |"last-updated-ms":2,"last-column-id":3,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"id","required":false,"type":"long"},
         |{"id":2,"name":"v","required":false,"type":"long"},
         |{"id":3,"name":"pri","required":false,"type":"string"}]}],
         |"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[
         |{"name":"pri","transform":"identity","source-id":3,"field-id":1000}]}],
         |"default-spec-id":0,
         |"properties":{},"current-snapshot-id":51,
         |"snapshots":[{"snapshot-id":51,"timestamp-ms":2,
         |"summary":{"operation":"append"},
         |"manifest-list":"$listPath2","schema-id":0}]
         |}""".stripMargin.replace("\n", ""))
    writeText(t, "metadata/version-hint.text", "2")
    val out2 = IcebergInterop.read(spark, t)
    out2.count() shouldBe 15L
    out2.filter($"pri" === "C").select($"id").as[Long]
      .collect().sorted shouldBe (11L to 15L).toArray
    out2.filter($"id" === 13L).select($"v").as[Long].head() shouldBe 130L
    // DML over the avro-bearing table still refuses by name
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.delete(spark, t, $"id" === 11L)
    }.getMessage should include("AVRO")
  }

  test("rowTracking-shaped Delta logs read: domainMetadata actions and " +
    "baseRowId/defaultRowCommitVersion add fields pass through (writer " +
    "features never gate reads)") {
    import spark.implicits._
    val t = fresh("graft-ih-rt")
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    val stage = fresh("graft-ih-rt-stage")
    (1L to 4L).map(i => (i, s"x$i")).toDF("id", "p")
      .coalesce(1).write.parquet(stage)
    val part = fs.listStatus(new Path(stage)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new Path(t))
    fs.rename(part, new Path(t, "f1.parquet")) shouldBe true
    val schemaJson =
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":{}},
        |{"name":"p","type":"string","nullable":true,"metadata":{}}
        |]}""".stripMargin.replace("\n", "")
    writeText(t, "_delta_log/00000000000000000000.json",
      s"""{"commitInfo":{"timestamp":1,"operation":"WRITE"}}
         |{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["rowTracking","domainMetadata"]}}
         |{"metaData":{"id":"rt","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(schemaJson)
      },"partitionColumns":[],"configuration":{"delta.enableRowTracking":"true"},"createdTime":1}}
         |{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\\"rowIdHighWaterMark\\":3}","removed":false}}
         |{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"baseRowId":0,"defaultRowCommitVersion":0}}
         |""".stripMargin)
    val df = DeltaInterop.read(spark, t)
    df.count() shouldBe 4L
    df.select($"id").as[Long].collect().sorted shouldBe (1L to 4L).toArray
  }

  test("Delta variantType tables serve: variant columns read natively, " +
    "variant_get extracts, and a vectored delete composes; unknown " +
    "reader features still refuse by name") {
    import spark.implicits._
    val t = fresh("graft-ih-var")
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    // variant parquet written by Spark's own writer (what delta-spark
    // on Spark 4 emits for variant columns)
    val stage = fresh("graft-ih-var-stage")
    (1L to 8L).map(i => (i, s"""{"k":$i,"tag":"t$i"}"""))
      .toDF("id", "s")
      .select(col("id"), parse_json(col("s")).as("v"))
      .coalesce(1).write.parquet(stage)
    val part = fs.listStatus(new Path(stage)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new Path(t))
    fs.rename(part, new Path(t, "f1.parquet")) shouldBe true
    val schemaJson =
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":{}},
        |{"name":"v","type":"variant","nullable":true,"metadata":{}}
        |]}""".stripMargin.replace("\n", "")
    writeText(t, "_delta_log/00000000000000000000.json",
      s"""{"commitInfo":{"timestamp":1,"operation":"WRITE"}}
         |{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["variantType"],"writerFeatures":["variantType"]}}
         |{"metaData":{"id":"var","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(schemaJson)
      },"partitionColumns":[],"configuration":{},"createdTime":1}}
         |{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
         |""".stripMargin)
    val df = DeltaInterop.read(spark, t)
    df.schema("v").dataType shouldBe
      org.apache.spark.sql.types.VariantType
    df.count() shouldBe 8L
    df.select(variant_get(col("v"), "$.k", "long").as("k"))
      .as[Long].collect().sorted shouldBe (1L to 8L).toArray
    // a vectored delete over the variant table composes (positions
    // are type-agnostic); the variant column survives the read
    DeltaInterop.delete(spark, t, $"id" === 3L).rowsAffected shouldBe 1L
    val after = DeltaInterop.read(spark, t)
    after.count() shouldBe 7L
    after.select(variant_get(col("v"), "$.tag", "string").as("g"))
      .as[String].collect().sorted should not contain "t3"
    // unknown reader features keep refusing by name
    val t2 = fresh("graft-ih-var2")
    writeText(t2, "_delta_log/00000000000000000000.json",
      s"""{"commitInfo":{"timestamp":1,"operation":"WRITE"}}
         |{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["futureFeatureX"],"writerFeatures":[]}}
         |{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(schemaJson)
      },"partitionColumns":[],"configuration":{},"createdTime":1}}
         |""".stripMargin)
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.state(spark, t2, None)
    }.getMessage should include("futureFeatureX")
  }
}
