package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the Iceberg interop against the OPEN FORMAT: the foreign-table
  * test hand-writes metadata JSON + avro manifests shaped like real
  * Iceberg output — v2 extra fields (sequence numbers, value counts),
  * EXISTING/DELETED entry statuses — and the reader must serve the
  * right rows from the self-describing files alone. */
class IcebergInteropSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-ice").toString + "/t"

  private def writeText(table: String, rel: String, text: String): Unit = {
    val p = new Path(table, rel)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  test("round-trip: write, read back exactly; append carries prior " +
    "manifests (new snapshot, O(new files) metadata); overwrite resets; " +
    "snapshot time travel works") {
    import spark.implicits._
    val t = fresh()
    val base = (1 to 80).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    val s0 = IcebergInterop.write(base, t)
    IcebergInterop.read(spark, t).select($"id").as[Long]
      .collect().sorted shouldBe (1L to 80L).toArray
    val s1 = IcebergInterop.write(
      Seq((81L, "p81")).toDF("id", "payload"), t)
    IcebergInterop.read(spark, t).count() shouldBe 81L
    // time travel to the first snapshot
    IcebergInterop.readSnapshot(spark, t, s0).count() shouldBe 80L
    IcebergInterop.readSnapshot(spark, t, s1).count() shouldBe 81L
    // overwrite: fresh manifest list
    IcebergInterop.write(Seq((999L, "x")).toDF("id", "payload"), t,
      overwrite = true)
    IcebergInterop.read(spark, t).select($"id").as[Long]
      .collect() shouldBe Array(999L)
    // schema guard on append
    intercept[IllegalArgumentException] {
      IcebergInterop.write(Seq((1L, 2L)).toDF("id", "other"), t)
    }.getMessage should include("does not match")
  }

  test("foreign table: hand-written v2-shaped metadata — extra avro " +
    "fields, EXISTING and DELETED statuses — serves the right rows; " +
    "unsupported shapes refuse by name") {
    import spark.implicits._
    val t = fresh()
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    def dataFile(rel: String, rows: Seq[(Long, String)]): (String, Long) = {
      val stage = fresh()
      rows.toDF("id", "payload").coalesce(1).write.parquet(stage)
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      val dest = new Path(t, rel)
      fs.mkdirs(dest.getParent)
      fs.rename(part, dest) shouldBe true
      (dest.toString, rows.length.toLong)
    }
    val (f1, n1) = dataFile("data/f1.parquet", Seq((1L, "a"), (2L, "b")))
    val (f2, _) = dataFile("data/f2.parquet", Seq((3L, "c")))
    val (f3, n3) = dataFile("data/f3.parquet", Seq((9L, "z")))
    // a RICHER manifest-entry schema than the writer's: sequence
    // numbers, content, value_counts — the v2 fields real files carry
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
        |  {"name":"file_size_in_bytes","type":"long"},
        |  {"name":"value_counts","type":["null",{"type":"map","values":"long"}],"default":null}
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
    def entry(status: Int, path: String, n: Long): GenericRecord = {
      val e = new GenericData.Record(entrySchema)
      e.put("status", status)
      e.put("snapshot_id", 77L)
      e.put("sequence_number", 3L)
      val d = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      d.put("content", 0)
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      d.put("partition", new GenericData.Record(
        entrySchema.getField("data_file").schema()
          .getField("partition").schema()))
      d.put("record_count", n)
      d.put("file_size_in_bytes", 1L)
      e.put("data_file", d)
      e
    }
    // f1 EXISTING (0), f2 DELETED (2), f3 ADDED (1)
    val (mPath, mLen) = avro("metadata/m1.avro", entrySchema, Seq(
      entry(0, f1, n1), entry(2, f2, 1L), entry(1, f3, n3)))
    val mf = new GenericData.Record(listSchema)
    mf.put("manifest_path", mPath)
    mf.put("manifest_length", mLen)
    mf.put("partition_spec_id", 0)
    mf.put("content", 0)
    mf.put("sequence_number", 3L)
    mf.put("added_snapshot_id", 77L)
    val (listPath, _) = avro("metadata/snap-77-1-x.avro", listSchema, Seq(mf))
    writeText(t, "metadata/v5.metadata.json",
      s"""{"format-version":2,"table-uuid":"u","location":"$t",
         |"last-updated-ms":1,"last-column-id":2,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"id","required":false,"type":"long"},
         |{"id":2,"name":"payload","required":false,"type":"string"}]}],
         |"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
         |"properties":{},"current-snapshot-id":77,
         |"snapshots":[{"snapshot-id":77,"timestamp-ms":1,
         |"summary":{"operation":"append"},
         |"manifest-list":"$listPath","schema-id":0}]
         |}""".stripMargin.replace("\n", ""))
    writeText(t, "metadata/version-hint.text", "5")
    val got = IcebergInterop.read(spark, t)
    got.schema.fieldNames shouldBe Array("id", "payload")
    // EXISTING + ADDED serve; DELETED does not
    got.select($"id").as[Long].collect().sorted shouldBe Array(1L, 2L, 9L)
    // a delete MANIFEST (content=1 in the list) refuses by name
    val mfDel = new GenericData.Record(listSchema)
    mfDel.put("manifest_path", mPath)
    mfDel.put("manifest_length", mLen)
    mfDel.put("partition_spec_id", 0)
    mfDel.put("content", 1)
    mfDel.put("sequence_number", 4L)
    mfDel.put("added_snapshot_id", 78L)
    val (listPath2, _) = avro("metadata/snap-78-1-x.avro", listSchema,
      Seq(mf, mfDel))
    writeText(t, "metadata/v6.metadata.json",
      s"""{"format-version":2,"table-uuid":"u","location":"$t",
         |"last-updated-ms":2,"last-column-id":2,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"id","required":false,"type":"long"},
         |{"id":2,"name":"payload","required":false,"type":"string"}]}],
         |"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
         |"properties":{},"current-snapshot-id":78,
         |"snapshots":[
         |{"snapshot-id":77,"timestamp-ms":1,
         |"summary":{"operation":"append"},
         |"manifest-list":"$listPath","schema-id":0},
         |{"snapshot-id":78,"timestamp-ms":2,
         |"summary":{"operation":"delete"},
         |"manifest-list":"$listPath2","schema-id":0}]
         |}""".stripMargin.replace("\n", ""))
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.read(spark, t)
    }.getMessage should include("DELETE manifest")
    // the PREVIOUS snapshot still serves via time travel
    IcebergInterop.readSnapshot(spark, t, 77L).count() shouldBe 3L
  }

  test("schema conversion: list and map columns map to Spark array/map " +
    "types; unknown primitives and future format versions refuse by name") {
    val t = fresh()
    // v3 serves READ-ONLY (deletion vectors); beyond-v3 refuses
    writeText(t, "metadata/v1.metadata.json",
      s"""{"format-version":4,"schemas":[],"current-snapshot-id":-1}""")
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.state(spark, t, None)
    }.getMessage should include("format-version 4")
    val t2 = fresh()
    writeText(t2, "metadata/v1.metadata.json",
      s"""{"format-version":2,"current-schema-id":0,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"tags","required":false,
         |"type":{"type":"list","element-id":2,"element":"string",
         |"element-required":false}},
         |{"id":3,"name":"attrs","required":true,
         |"type":{"type":"map","key-id":4,"key":"string",
         |"value-id":5,"value":"long","value-required":true}}]}],
         |"current-snapshot-id":-1}""".stripMargin.replace("\n", ""))
    val st = IcebergInterop.state(spark, t2, None)
    st.schema("tags").dataType shouldBe
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = true)
    st.schema("attrs").dataType shouldBe
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.LongType, valueContainsNull = false)
    st.schema("attrs").nullable shouldBe false
    val t3 = fresh()
    writeText(t3, "metadata/v1.metadata.json",
      s"""{"format-version":2,"current-schema-id":0,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"u","required":false,"type":"uuid"}]}],
         |"current-snapshot-id":-1}""".stripMargin.replace("\n", ""))
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.state(spark, t3, None)
    }.getMessage should include("uuid")
  }

  test("Iceberg → manifest import is metadata-only and unlocks native " +
    "DML on the same files") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1 to 50).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), t)
    IcebergInterop.importToManifest(spark, t) shouldBe 1L
    ManifestLake.read(spark, t).count() shouldBe 50L
    ManifestLake.delete(spark, t, col("id") === 7L)
    ManifestLake.read(spark, t).count() shouldBe 49L
    // the Iceberg view of the table is untouched by the manifest DML
    IcebergInterop.read(spark, t).count() shouldBe 50L
  }

  private def parquetCount(table: String): Int = {
    val p = new Path(table)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet") &&
        !f.getPath.toString.contains("/metadata/") &&
        !f.getPath.toString.contains("_graft_manifest")) n += 1
    }
    n
  }

  test("manifest → Iceberg export is metadata-only and stays in sync: " +
    "the mirror serves the same rows over the SAME files, and a " +
    "re-export after manifest DML follows") {
    import spark.implicits._
    val t = fresh()
    ManifestLake.write(
      (1 to 40).map(i => (i.toLong, i % 3, s"p$i")).toDF("id", "k", "payload"),
      t)
    val before = parquetCount(t)
    IcebergInterop.exportFromManifest(spark, t)
    parquetCount(t) shouldBe before // zero data movement
    val viaIce = IcebergInterop.read(spark, t)
      .select($"id", $"k", $"payload").as[(Long, Int, String)]
      .collect().sorted
    viaIce shouldBe ManifestLake.read(spark, t)
      .select($"id", $"k", $"payload").as[(Long, Int, String)]
      .collect().sorted
    // the mirror references the manifest's own files verbatim
    val root = new Path(t).toUri.getPath.stripSuffix("/") + "/"
    val icePaths = IcebergInterop.state(spark, t, None).files
      .map(f => new Path(f.path).toUri.getPath.stripPrefix(root)).toSet
    icePaths shouldBe ManifestLake.snapshot(spark, t).files.toSet
    // manifest evolves (append + delete), the re-export re-syncs and
    // the PRIOR mirror snapshot stays addressable
    val s0 = IcebergInterop.state(spark, t, None).snapshotId
    ManifestLake.write(Seq((99L, 0, "new")).toDF("id", "k", "payload"),
      t, append = true)
    ManifestLake.delete(spark, t, col("id") <= 5L)
    IcebergInterop.exportFromManifest(spark, t)
    IcebergInterop.read(spark, t).select($"id").as[Long]
      .collect().sorted shouldBe
      ManifestLake.read(spark, t).select($"id").as[Long].collect().sorted
    IcebergInterop.readSnapshot(spark, t, s0).count() shouldBe 40L
  }

  test("export refuses DV files by name; after REORG PURGE it " +
    "succeeds; Hive-partitioned layouts export as identity specs") {
    import spark.implicits._
    val t = fresh()
    ManifestLake.write(
      (1 to 30).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), t,
      statsCol = Some("id"))
    ManifestLake.deleteMor(spark, t, col("id") % 7 === 0)
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.exportFromManifest(spark, t)
    }.getMessage should include("PURGE")
    ManifestLake.purgeDv(spark, t)
    IcebergInterop.exportFromManifest(spark, t)
    IcebergInterop.read(spark, t).count() shouldBe 26L
    // partitioned layout: partition values live in the path, not the
    // files — the export records identity tuples and the Iceberg read
    // reconstructs the column (deeper coverage in IcebergPruneSpec)
    val tp = fresh()
    ManifestLake.write(
      (1 to 20).map(i => (i.toLong, i % 2, s"p$i")).toDF("id", "k", "payload"),
      tp, partitionBy = Seq("k"))
    IcebergInterop.exportFromManifest(spark, tp)
    IcebergInterop.read(spark, tp).filter(col("k") === 1)
      .count() shouldBe 10L
  }

  test("graft_iceberg SQL: reads resolve to the native scan with " +
    "pushdown; VERSION AS OF takes a snapshot id; TIMESTAMP AS OF and " +
    "unknown names refuse by name") {
    import spark.implicits._
    val t = fresh()
    val s0 = IcebergInterop.write(
      (1 to 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), t)
    IcebergInterop.write(
      Seq((101L, "p101")).toDF("id", "payload"), t)
    IcebergSql.register("icesqlspec", t)
    spark.sql("SELECT count(*) AS n FROM graft_iceberg.icesqlspec")
      .as[Long].head() shouldBe 101L
    spark.sql(
      s"SELECT count(*) AS n FROM graft_iceberg.icesqlspec " +
        s"VERSION AS OF $s0").as[Long].head() shouldBe 100L
    spark.sql("SELECT id FROM graft_iceberg.icesqlspec WHERE id > 50")
      .count() shouldBe 51L
    val plan = spark.sql(
      "SELECT id FROM graft_iceberg.icesqlspec WHERE id > 50")
      .queryExecution.executedPlan.toString
    plan should include regex "PushedFilters: \\[.*id".r
    // TIMESTAMP AS OF is served (snapshotAt) — an instant before the
    // first snapshot refuses by name, a current one resolves the head
    intercept[IllegalArgumentException] {
      spark.sql("SELECT * FROM graft_iceberg.icesqlspec TIMESTAMP AS " +
        "OF '2001-01-01'").collect()
    }.getMessage should include("before the first")
    val nowIso = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    spark.sql("SELECT count(*) AS n FROM graft_iceberg.icesqlspec " +
      s"TIMESTAMP AS OF '$nowIso'").as[Long].head() shouldBe 101L
  }

  test("expireSnapshots drops old snapshots and their exclusive files, " +
    "keeps the head readable, refuses expired time travel — and never " +
    "touches a mirror's borrowed files outside data/") {
    import spark.implicits._
    val t = fresh()
    val s0 = IcebergInterop.write(
      (1 to 40).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), t)
    IcebergInterop.write(
      (100 to 120).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), t,
      overwrite = true)
    IcebergInterop.write(Seq((121L, "x")).toDF("id", "payload"), t)
    val before = parquetCount(t)
    val deleted = IcebergInterop.expireSnapshots(spark, t, keepLast = 2)
    deleted should be > 0 // snapshot 0's overwritten files died
    parquetCount(t) shouldBe (before - deleted)
    // head + the retained prior snapshot still serve
    IcebergInterop.read(spark, t).count() shouldBe 22L
    // the dropped snapshot is no longer addressable, by name
    intercept[IllegalArgumentException] {
      IcebergInterop.readSnapshot(spark, t, s0).collect()
    }.getMessage should include("not found")
    // idempotent-ish: nothing left to expire at the same retention
    IcebergInterop.expireSnapshots(spark, t, keepLast = 2) shouldBe 0
    // a manifest-table mirror: expire may prune mirror METADATA but
    // must never delete the manifest table's data files (they live
    // outside the writer-owned data/ dir)
    val m = fresh()
    ManifestLake.write(
      (1 to 30).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), m)
    IcebergInterop.exportFromManifest(spark, m)
    ManifestLake.delete(spark, m, col("id") <= 5L)
    IcebergInterop.exportFromManifest(spark, m) // second mirror snapshot
    val manifestFiles = parquetCount(m)
    IcebergInterop.expireSnapshots(spark, m, keepLast = 1) shouldBe 0
    parquetCount(m) shouldBe manifestFiles
    IcebergInterop.read(spark, m).count() shouldBe 25L
    ManifestLake.read(spark, m).count() shouldBe 25L
  }

  test("expireSnapshots orders by timestamp, not array position: a " +
    "foreign newest-first snapshots array keeps the head and drops " +
    "the old one") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1 to 30).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), t)
    IcebergInterop.write(
      (100 to 110).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), t,
      overwrite = true)
    // hand-publish the next metadata version with the snapshots array
    // REVERSED (newest first) — the spec does not mandate order and
    // foreign writers differ
    val metaDir = new Path(t, "metadata")
    val fs = metaDir.getFileSystem(spark.sessionState.newHadoopConf())
    val v = fs.listStatus(metaDir).map(_.getPath.getName)
      .collect { case n if n.endsWith(".metadata.json") =>
        n.stripPrefix("v").stripSuffix(".metadata.json").toLong }.max
    val in = fs.open(new Path(metaDir, s"v$v.metadata.json"))
    val text = try scala.io.Source.fromInputStream(in).mkString
      finally in.close()
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val ast = JsonMethods.parse(text).transformField {
      case JField("snapshots", JArray(xs)) =>
        JField("snapshots", JArray(xs.reverse))
    }
    writeText(t, s"metadata/v${v + 1}.metadata.json",
      JsonMethods.compact(JsonMethods.render(ast)))
    writeText(t, "metadata/version-hint.text", (v + 1).toString)
    // expiry must keep the newest-BY-TIMESTAMP snapshot (the head),
    // not the last array element (the oldest)
    IcebergInterop.expireSnapshots(spark, t, keepLast = 1) should be > 0
    IcebergInterop.read(spark, t).count() shouldBe 11L
  }

}
