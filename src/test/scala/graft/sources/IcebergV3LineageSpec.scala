package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Iceberg FORMAT-VERSION 3 row lineage, end to end: appends stamp
  * explicit `first_row_id` (data_file field 142 + manifest_file field
  * 520), [[IcebergInterop.readRowLineage]] serves
  * `_row_id`/`_last_updated_sequence_number` by the spec's precedence
  * (materialized value, else `first_row_id + position`; null for rows
  * predating the upgrade), merge-on-read UPDATE **preserves** lineage
  * by materializing `_row_id` in its new images, and the inheritance
  * walk resolves hand-written foreign metadata that never stamped
  * per-file origins. */
class IcebergV3LineageSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-icev3l").toString + "/t"

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
  private def lit(v: Any) = org.apache.spark.sql.functions.lit(v)

  /** A v3 table whose first batch PREDATES the upgrade (null lineage)
    * and whose later batches carry assigned row ids. */
  private def lineagedTable(): String = {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((100L until 105L).toDF("id").coalesce(1), t)
    IcebergInterop.upgradeFormat(spark, t)
    IcebergInterop.upgradeFormat(spark, t, 3)
    IcebergInterop.write((0L until 10L).toDF("id").coalesce(1), t)
    t
  }

  test("v3 appends assign explicit row-id origins and readRowLineage " +
    "serves them: assigned batches count up from next-row-id, " +
    "pre-upgrade rows serve NULL lineage") {
    import spark.implicits._
    val t = lineagedTable()
    IcebergInterop.write((10L until 15L).toDF("id").coalesce(1), t)
    val st = IcebergInterop.state(spark, t, None)
    // the two post-upgrade files carry EXPLICIT origins 0 and 10; the
    // pre-upgrade file resolves none
    st.files.flatMap(_.firstRowId).sorted shouldBe Seq(0L, 10L)
    st.files.count(_.firstRowId.isEmpty) shouldBe 1
    val out = IcebergInterop.readRowLineage(spark, t)
    out.count() shouldBe 20L
    out.filter($"id" >= 100L)
      .filter($"_row_id".isNotNull ||
        $"_last_updated_sequence_number".isNotNull)
      .count() shouldBe 0L
    // coalesce(1) + ordered input ⇒ position == value, so the
    // assigned id IS the row's value
    out.filter($"id" < 15L).select($"id", $"_row_id")
      .as[(Long, Long)].collect().toMap shouldBe
      (0L until 15L).map(i => i -> i).toMap
    // _last_updated_sequence_number inherits the file's data sequence
    val seqOf = st.files.flatMap(f =>
      f.firstRowId.map(_ -> f.seq)).toMap
    out.filter($"id" < 10L)
      .select($"_last_updated_sequence_number").distinct()
      .as[Long].collect() shouldBe Array(seqOf(0L))
    out.filter($"id" >= 10L && $"id" < 15L)
      .select($"_last_updated_sequence_number").distinct()
      .as[Long].collect() shouldBe Array(seqOf(10L))
  }

  test("DV deletes keep survivors' row ids; MOR UPDATE preserves " +
    "_row_id through materialization (twice), bumps " +
    "_last_updated_sequence_number, and assigns a fresh id to " +
    "updated pre-upgrade rows") {
    import spark.implicits._
    val t = lineagedTable()
    // a vectored delete shifts nothing: survivors keep their ids
    IcebergInterop.deleteMor(spark, t, col("id") === 3L)
    val afterDelete = IcebergInterop.readRowLineage(spark, t)
    afterDelete.filter($"id" < 10L).select($"_row_id").as[Long]
      .collect().sorted shouldBe
      Array(0L, 1L, 2L, 4L, 5L, 6L, 7L, 8L, 9L)
    // first update: the new image MATERIALIZES the old row's id
    IcebergInterop.updateMor(spark, t, col("id") === 5L,
      Seq("id" -> lit(500L)))
    val afterU1 = IcebergInterop.readRowLineage(spark, t)
    val u1 = afterU1.filter($"id" === 500L)
      .select($"_row_id", $"_last_updated_sequence_number")
      .as[(Long, Long)].collect()
    u1.length shouldBe 1
    u1.head._1 shouldBe 5L // lineage PRESERVED
    val untouchedLast = afterU1.filter($"id" === 4L)
      .select($"_last_updated_sequence_number").as[Long].head()
    u1.head._2 should be > untouchedLast // sequence bumped
    // second update: the materialized id wins again
    IcebergInterop.updateMor(spark, t, col("id") === 500L,
      Seq("id" -> lit(501L)))
    val afterU2 = IcebergInterop.readRowLineage(spark, t)
    val u2 = afterU2.filter($"id" === 501L)
      .select($"_row_id", $"_last_updated_sequence_number")
      .as[(Long, Long)].collect()
    u2.length shouldBe 1
    u2.head._1 shouldBe 5L
    u2.head._2 should be > u1.head._2
    // a pre-upgrade row (null lineage) updates into a FRESH id — the
    // spec's null-assignment rule on the image file's origin
    IcebergInterop.updateMor(spark, t, col("id") === 100L,
      Seq("id" -> lit(600L)))
    val fresh600 = IcebergInterop.readRowLineage(spark, t)
      .filter($"id" === 600L).select($"_row_id").as[Long].collect()
    fresh600.length shouldBe 1
    fresh600.head should be >= 10L // beyond the first assigned range
    // untouched assigned rows never moved
    IcebergInterop.readRowLineage(spark, t).filter($"id" === 7L)
      .select($"_row_id").as[Long].head() shouldBe 7L
  }

  test("the inheritance walk: hand-written v3 metadata with NO " +
    "per-file stamps resolves first_row_id from the snapshot's " +
    "first-row-id plus preceding record counts, in manifest order") {
    import spark.implicits._
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
    val t = fresh()
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    def stageParquet(name: String, ids: Seq[Long]): String = {
      val stage = fresh()
      ids.toDF("id").coalesce(1).write.parquet(stage)
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      fs.mkdirs(new Path(t, "data"))
      val dest = new Path(t, s"data/$name")
      fs.rename(part, dest) shouldBe true
      dest.toString
    }
    val f1 = stageParquet("f1.parquet", 0L to 9L)
    val f2 = stageParquet("f2.parquet", 10L to 16L)
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
    def dataEntry(path: String, n: Long): GenericRecord = {
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1); e.put("snapshot_id", 90L)
      e.put("sequence_number", 1L)
      val d = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      d.put("content", 0); d.put("file_path", path)
      d.put("file_format", "PARQUET")
      d.put("partition", new GenericData.Record(entrySchema
        .getField("data_file").schema().getField("partition").schema()))
      d.put("record_count", n); d.put("file_size_in_bytes", 1L)
      e.put("data_file", d)
      e
    }
    val (m, mLen) = avro("metadata/m0.avro", entrySchema,
      Seq(dataEntry(f1, 10L), dataEntry(f2, 7L)))
    val mf = new GenericData.Record(listSchema)
    mf.put("manifest_path", m); mf.put("manifest_length", mLen)
    mf.put("partition_spec_id", 0); mf.put("content", 0)
    mf.put("sequence_number", 1L); mf.put("added_snapshot_id", 90L)
    val (listPath, _) = avro("metadata/snap-90.avro", listSchema, Seq(mf))
    def writeText(rel: String, text: String): Unit = {
      val p = new Path(t, rel)
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      try out.write(text.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    writeText("metadata/v1.metadata.json",
      s"""{"format-version":3,"table-uuid":"u3l","location":"$t",
         |"last-updated-ms":1,"last-column-id":1,"last-sequence-number":1,
         |"next-row-id":17,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"id","required":false,"type":"long"}]}],
         |"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
         |"properties":{},"current-snapshot-id":90,
         |"snapshots":[{"snapshot-id":90,"timestamp-ms":1,
         |"sequence-number":1,"first-row-id":0,"added-rows":17,
         |"summary":{"operation":"append"},
         |"manifest-list":"$listPath","schema-id":0}]
         |}""".stripMargin.replace("\n", ""))
    writeText("metadata/version-hint.text", "1")
    val st = IcebergInterop.state(spark, t, None)
    // f1 inherits the snapshot origin 0; f2 follows at 0 + 10
    st.files.sortBy(_.path.contains("f2"))
      .flatMap(_.firstRowId) shouldBe Seq(0L, 10L)
    IcebergInterop.readRowLineage(spark, t)
      .select($"id", $"_row_id").as[(Long, Long)]
      .collect().toMap shouldBe (0L until 17L).map(i => i -> i).toMap
  }

  test("manifest-LEVEL inheritance across SEVERAL data manifests " +
    "(r16): origins assign in manifest-list order from the " +
    "snapshot's first-row-id plus preceding added-rows counts; a " +
    "preceding manifest with NO added-rows count makes later " +
    "origins unknowable — the lineage read refuses by name, the " +
    "plain read is unaffected") {
    import spark.implicits._
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
    def listSchema(withAddedRows: Boolean) =
      new org.apache.avro.Schema.Parser().parse(
        ("""{"type":"record","name":"manifest_file","fields":[
          |{"name":"manifest_path","type":"string"},
          |{"name":"manifest_length","type":"long"},
          |{"name":"partition_spec_id","type":"int"},
          |{"name":"content","type":"int","default":0},
          |{"name":"sequence_number","type":"long","default":0},""" +
          (if (withAddedRows)
            """{"name":"added_rows_count","type":["null","long"],"default":null},"""
          else "") +
          """{"name":"added_snapshot_id","type":["null","long"],"default":null}
          |]}""").stripMargin.replace("\n", ""))
    def build(t: String, withAddedRows: Boolean): Unit = {
      val fs = new Path(t).getFileSystem(
        spark.sessionState.newHadoopConf())
      def stageParquet(name: String, ids: Seq[Long]): String = {
        val stage = fresh()
        ids.toDF("id").coalesce(1).write.parquet(stage)
        val part = fs.listStatus(new Path(stage)).map(_.getPath)
          .find(_.getName.endsWith(".parquet")).get
        fs.mkdirs(new Path(t, "data"))
        val dest = new Path(t, s"data/$name")
        fs.rename(part, dest) shouldBe true
        dest.toString
      }
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
      def dataEntry(path: String, n: Long): GenericRecord = {
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1); e.put("snapshot_id", 90L)
        e.put("sequence_number", 1L)
        val d = new GenericData.Record(
          entrySchema.getField("data_file").schema())
        d.put("content", 0); d.put("file_path", path)
        d.put("file_format", "PARQUET")
        d.put("partition", new GenericData.Record(entrySchema
          .getField("data_file").schema().getField("partition").schema()))
        d.put("record_count", n); d.put("file_size_in_bytes", 1L)
        e.put("data_file", d)
        e
      }
      val f1 = stageParquet("f1.parquet", 0L to 9L)
      val f2 = stageParquet("f2.parquet", 10L to 16L)
      // TWO data manifests of the same snapshot, neither carrying a
      // manifest-level first_row_id
      val (m0, m0Len) = avro("metadata/m0.avro", entrySchema,
        Seq(dataEntry(f1, 10L)))
      val (m1, m1Len) = avro("metadata/m1.avro", entrySchema,
        Seq(dataEntry(f2, 7L)))
      val ls = listSchema(withAddedRows)
      def listRow(p: String, len: Long, added: Long): GenericRecord = {
        val mf = new GenericData.Record(ls)
        mf.put("manifest_path", p); mf.put("manifest_length", len)
        mf.put("partition_spec_id", 0); mf.put("content", 0)
        mf.put("sequence_number", 1L); mf.put("added_snapshot_id", 90L)
        if (withAddedRows) mf.put("added_rows_count", added)
        mf
      }
      val (listPath, _) = avro("metadata/snap-90.avro", ls,
        Seq(listRow(m0, m0Len, 10L), listRow(m1, m1Len, 7L)))
      def writeText(rel: String, text: String): Unit = {
        val p = new Path(t, rel)
        fs.mkdirs(p.getParent)
        val out = fs.create(p, true)
        try out.write(text.getBytes(StandardCharsets.UTF_8))
        finally out.close()
      }
      writeText("metadata/v1.metadata.json",
        s"""{"format-version":3,"table-uuid":"u3m","location":"$t",
           |"last-updated-ms":1,"last-column-id":1,"last-sequence-number":1,
           |"next-row-id":17,
           |"schemas":[{"type":"struct","schema-id":0,"fields":[
           |{"id":1,"name":"id","required":false,"type":"long"}]}],
           |"current-schema-id":0,
           |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
           |"properties":{},"current-snapshot-id":90,
           |"snapshots":[{"snapshot-id":90,"timestamp-ms":1,
           |"sequence-number":1,"first-row-id":0,"added-rows":17,
           |"summary":{"operation":"append"},
           |"manifest-list":"$listPath","schema-id":0}]
           |}""".stripMargin.replace("\n", ""))
      writeText("metadata/version-hint.text", "1")
    }
    // the good shape: added_rows_count advances the walk — m0's file
    // originates at 0, m1's at 0 + 10
    val t1 = fresh()
    build(t1, withAddedRows = true)
    val st = IcebergInterop.state(spark, t1, None)
    st.files.sortBy(_.path.contains("f2"))
      .flatMap(_.firstRowId) shouldBe Seq(0L, 10L)
    IcebergInterop.readRowLineage(spark, t1)
      .select($"id", $"_row_id").as[(Long, Long)]
      .collect().toMap shouldBe (0L until 17L).map(i => i -> i).toMap
    // the unknowable shape: no added_rows_count → m1's origin cannot
    // be derived; the lineage read refuses BY NAME, plain reads serve
    val t2 = fresh()
    build(t2, withAddedRows = false)
    IcebergInterop.read(spark, t2).count() shouldBe 17L
    intercept[IcebergInterop.UnsupportedIcebergFeatureException](
      IcebergInterop.readRowLineage(spark, t2).collect())
      .getMessage should include("added-rows count is unrecorded")
  }

  test("v3 compaction retires deletion vectors WITHOUT reassigning " +
    "ids, and copy-on-write UPDATE/DELETE carry lineage — _last bumps " +
    "only for fired rows, bystanders in rewritten files keep theirs") {
    import spark.implicits._
    val t = lineagedTable()
    IcebergInterop.deleteMor(spark, t, col("id") === 2L)
    IcebergInterop.compactDeletes(spark, t)
    IcebergInterop.state(spark, t, None).dvDeletes shouldBe empty
    val out = IcebergInterop.readRowLineage(spark, t)
    out.count() shouldBe 14L // 5 pre-upgrade + 10 assigned − 1 deleted
    out.filter($"id" < 10L).select($"id", $"_row_id")
      .as[(Long, Long)].collect().toMap shouldBe
      (0L until 10L).filter(_ != 2L).map(i => i -> i).toMap
    val bystanderLast = out.filter($"id" === 5L)
      .select($"_last_updated_sequence_number").as[Long].head()
    // CoW UPDATE is legal now: the fired row keeps its id and takes
    // the commit's sequence; a bystander in the same file keeps both
    IcebergInterop.update(spark, t, col("id") === 4L,
      Seq("id" -> lit(400L)))
    val a = IcebergInterop.readRowLineage(spark, t)
    val fired = a.filter($"id" === 400L)
      .select($"_row_id", $"_last_updated_sequence_number")
      .as[(Long, Long)].collect()
    fired.length shouldBe 1
    fired.head._1 shouldBe 4L
    fired.head._2 should be > bystanderLast
    a.filter($"id" === 5L)
      .select($"_row_id", $"_last_updated_sequence_number")
      .as[(Long, Long)].head() shouldBe ((5L, bystanderLast))
    // CoW DELETE: survivors of the touched file keep their ids
    IcebergInterop.delete(spark, t, col("id") === 6L)
    val b = IcebergInterop.readRowLineage(spark, t)
    b.count() shouldBe 13L
    b.filter($"id" === 7L).select($"_row_id").as[Long]
      .head() shouldBe 7L
  }

  test("OPTIMIZE on v3 materializes lineage: assigned ids survive " +
    "the rewrite; pre-upgrade rows gain ids on their FIRST rewrite " +
    "and keep them through the second") {
    import spark.implicits._
    val t = lineagedTable()
    IcebergInterop.optimize(spark, t)
    val a = IcebergInterop.readRowLineage(spark, t)
    a.filter($"id" < 10L).select($"id", $"_row_id")
      .as[(Long, Long)].collect().toMap shouldBe
      (0L until 10L).map(i => i -> i).toMap
    // pre-upgrade rows were rewritten into a lineage-bearing file —
    // they now HAVE assigned ids, disjoint from the first range
    val preIds = a.filter($"id" >= 100L)
      .select($"id", $"_row_id").as[(Long, Long)].collect().toMap
    preIds.size shouldBe 5
    preIds.values.foreach(_ should be >= 10L)
    // a later append + second optimize keeps every materialized id
    IcebergInterop.write((20L until 25L).toDF("id").coalesce(1), t)
    IcebergInterop.optimize(spark, t)
    val b = IcebergInterop.readRowLineage(spark, t)
    b.filter($"id" < 10L).select($"id", $"_row_id")
      .as[(Long, Long)].collect().toMap shouldBe
      (0L until 10L).map(i => i -> i).toMap
    b.filter($"id" >= 100L).select($"id", $"_row_id")
      .as[(Long, Long)].collect().toMap shouldBe preIds
  }

  test("MERGE on v3 carries lineage: updated rows keep _row_id and " +
    "take the commit's sequence, bystanders in rewritten files keep " +
    "both, inserts inherit fresh ids, and a second merge preserves " +
    "the carried id again") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (100L until 103L).map(k => (k, k)).toDF("k", "v").coalesce(1), t)
    IcebergInterop.upgradeFormat(spark, t)
    IcebergInterop.upgradeFormat(spark, t, 3)
    IcebergInterop.write(
      (0L until 10L).map(k => (k, k)).toDF("k", "v")
        .coalesce(1).sortWithinPartitions("k"), t)
    val before = IcebergInterop.readRowLineage(spark, t)
    val bystanderLast = before.filter($"k" === 7L)
      .select($"_last_updated_sequence_number").as[Long].head()
    IcebergInterop.merge(
      Seq((5L, 500L), (20L, 2000L)).toDF("k", "v"), t, Seq("k"))
    val a = IcebergInterop.readRowLineage(spark, t)
    a.count() shouldBe 14L
    val upd = a.filter($"k" === 5L)
      .select($"v", $"_row_id", $"_last_updated_sequence_number")
      .as[(Long, Long, Long)].head()
    upd._1 shouldBe 500L
    upd._2 shouldBe 5L // carried
    upd._3 should be > bystanderLast // bumped to the merge's sequence
    // bystander in the SAME rewritten file keeps id AND sequence
    a.filter($"k" === 7L)
      .select($"_row_id", $"_last_updated_sequence_number")
      .as[(Long, Long)].head() shouldBe ((7L, bystanderLast))
    // the insert inherits a FRESH id from its file's origin
    val ins = a.filter($"k" === 20L).select($"_row_id").as[Long].head()
    ins should be >= 10L
    // a second merge over the materialized file carries again
    IcebergInterop.merge(Seq((5L, 501L)).toDF("k", "v"), t, Seq("k"))
    IcebergInterop.readRowLineage(spark, t).filter($"k" === 5L)
      .select($"v", $"_row_id").as[(Long, Long)]
      .head() shouldBe ((501L, 5L))
  }

  test("v3 EQUALITY DELETES and keyed upserts: zero-scan deleteByKeys " +
    "drops rows without touching survivors' ids, upsertByKeys appends " +
    "fresh-lineage images, and compactDeletes retires the debt with " +
    "every id preserved") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (100L until 103L).map(k => (k, k)).toDF("k", "v").coalesce(1), t)
    IcebergInterop.upgradeFormat(spark, t)
    IcebergInterop.upgradeFormat(spark, t, 3)
    IcebergInterop.write(
      (0L until 10L).map(k => (k, k)).toDF("k", "v")
        .coalesce(1).sortWithinPartitions("k"), t)
    // zero-scan keyed delete: one equality-delete file, no data IO
    IcebergInterop.deleteByKeys(spark, t, Seq(3L).toDF("k"))
    val a = IcebergInterop.readRowLineage(spark, t)
    a.count() shouldBe 12L
    a.filter($"k" === 7L).select($"_row_id").as[Long].head() shouldBe 7L
    // keyed upsert: the old row dies by key, the image is a NEW row
    // with fresh lineage from its file's stamped origin
    IcebergInterop.upsertByKeys(
      Seq((5L, 500L)).toDF("k", "v"), t, Seq("k"))
    val b = IcebergInterop.readRowLineage(spark, t)
    b.count() shouldBe 12L
    val up = b.filter($"k" === 5L)
      .select($"v", $"_row_id").as[(Long, Long)].collect()
    up.length shouldBe 1
    up.head._1 shouldBe 500L
    up.head._2 should be >= 10L // fresh identity, not the old 5
    val upId = up.head._2
    // compaction retires the eq debt with every id preserved
    IcebergInterop.compactDeletes(spark, t)
    IcebergInterop.state(spark, t, None).eqDeletes shouldBe empty
    val c = IcebergInterop.readRowLineage(spark, t)
    c.count() shouldBe 12L
    c.filter($"k" === 5L).select($"_row_id").as[Long].head() shouldBe upId
    c.filter($"k" === 7L).select($"_row_id").as[Long].head() shouldBe 7L
    // MIXED debt: a deletion vector lands, then an eq-delete NEXT TO
    // it (legal — only DV DML atop parquet debt refuses), and ONE
    // compaction retires both encodings
    IcebergInterop.deleteMor(spark, t, col("k") === 8L)
    IcebergInterop.deleteByKeys(spark, t, Seq(9L).toDF("k"))
    IcebergInterop.compactDeletes(spark, t)
    val stc = IcebergInterop.state(spark, t, None)
    stc.eqDeletes shouldBe empty
    stc.dvDeletes shouldBe empty
    val d = IcebergInterop.readRowLineage(spark, t)
    d.count() shouldBe 10L
    d.filter($"k" === 5L).select($"_row_id").as[Long].head() shouldBe upId
    d.filter($"k" === 7L).select($"_row_id").as[Long].head() shouldBe 7L
  }

  test("compaction is lineage-safe for UNTOUCHED files too (r15): " +
    "kept files carry as EXISTING entries with their original data " +
    "sequence numbers, so bystander rows keep their " +
    "_last_updated_sequence_number through compactDeletes and " +
    "OPTIMIZE instead of inheriting the compaction's sequence") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((100L until 105L).toDF("id").coalesce(1), t)
    IcebergInterop.upgradeFormat(spark, t)
    IcebergInterop.upgradeFormat(spark, t, 3)
    IcebergInterop.write((0L until 10L).toDF("id").coalesce(1), t)
    IcebergInterop.write((50L until 55L).toDF("id").coalesce(1), t)
    val before = IcebergInterop.readRowLineage(spark, t)
      .filter($"id" < 10L)
      .select($"id", $"_row_id", $"_last_updated_sequence_number")
      .as[(Long, Long, Long)].collect().toSet
    // delete touches ONLY the 50..55 file; the 0..10 file is a
    // bystander that never materialized its lineage
    IcebergInterop.deleteMor(spark, t, col("id") === 52L)
    IcebergInterop.compactDeletes(spark, t)
    val after = IcebergInterop.readRowLineage(spark, t)
    after.count() shouldBe 19L
    after.filter($"id" < 10L)
      .select($"id", $"_row_id", $"_last_updated_sequence_number")
      .as[(Long, Long, Long)].collect().toSet shouldBe before
    // pre-upgrade bystanders still serve NULL lineage
    after.filter($"id" >= 100L)
      .filter($"_row_id".isNotNull ||
        $"_last_updated_sequence_number".isNotNull)
      .count() shouldBe 0L
    // OPTIMIZE with a size threshold that leaves a LARGE file kept:
    // the two small files pack, the big one rides as EXISTING and its
    // rows keep their recorded last-updated
    val t2 = fresh()
    IcebergInterop.write((0L until 2000L).toDF("id").coalesce(1), t2)
    IcebergInterop.upgradeFormat(spark, t2)
    IcebergInterop.upgradeFormat(spark, t2, 3)
    IcebergInterop.write((5000L until 5003L).toDF("id").coalesce(1), t2)
    IcebergInterop.write((9000L until 11000L).toDF("id").coalesce(1), t2)
    IcebergInterop.write((6000L until 6003L).toDF("id").coalesce(1), t2)
    val bigBefore = IcebergInterop.readRowLineage(spark, t2)
      .filter($"id" >= 9000L)
      .select($"id", $"_row_id", $"_last_updated_sequence_number")
      .as[(Long, Long, Long)].collect().toSet
    val bigFileBytes = IcebergInterop.state(spark, t2, None)
      .files.map(_.bytes).max
    IcebergInterop.optimize(spark, t2, targetFileBytes = bigFileBytes)
    val st2 = IcebergInterop.state(spark, t2, None)
    // the big file survived verbatim (kept), small ones packed
    st2.files.map(_.records).max shouldBe 2000L
    IcebergInterop.readRowLineage(spark, t2)
      .filter($"id" >= 9000L)
      .select($"id", $"_row_id", $"_last_updated_sequence_number")
      .as[(Long, Long, Long)].collect().toSet shouldBe bigBefore
  }

  test("refusals by name: pre-v3 tables have no row lineage; a data " +
    "column shadowing a reserved lineage name refuses") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((0L until 5L).toDF("id"), t)
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.readRowLineage(spark, t)
    }.getMessage should include("format-version")
    val t2 = fresh()
    IcebergInterop.write((0L until 5L).toDF("_row_id"), t2)
    IcebergInterop.upgradeFormat(spark, t2)
    IcebergInterop.upgradeFormat(spark, t2, 3)
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.readRowLineage(spark, t2)
    }.getMessage should include("reserved")
  }
}
