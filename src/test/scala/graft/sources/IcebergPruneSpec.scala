package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import IcebergInterop._

/** Pins foreign-Iceberg PARTITION PRUNING: the transform evaluation
  * against the Iceberg spec's own Appendix B test vectors (murmur3
  * bucket hashes, truncate, time transforms), and readWhere against
  * hand-authored partitioned metadata — files prune by recorded tuple,
  * results stay exactly `read(...).filter(...)`, and anything the
  * evaluator does not model fails OPEN (kept files, exact residual). */
class IcebergPruneSpec extends AnyFunSuite with Matchers with SparkSpec {

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

  private def le(l: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((l >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  // ------------------------------------------------ transform semantics

  test("bucket hashes match the Iceberg spec's Appendix B test vectors") {
    // int/long/date/timestamp hash as the 8-byte little-endian long;
    // strings hash their UTF-8 bytes (murmur3_x86_32, seed 0)
    murmur3x86(le(34L)) shouldBe 2017239379
    murmur3x86("iceberg".getBytes(StandardCharsets.UTF_8)) shouldBe
      1210000089
    // date 2017-11-16 = 17486 days from epoch
    murmur3x86(le(17486L)) shouldBe -653330422
    // timestamp 2017-11-16T22:31:08 = 1510871468000000 micros
    murmur3x86(le(1510871468000000L)) shouldBe -2047944441
  }

  test("transform evaluation: bucket / truncate / time transforms and " +
    "the fail-open unknowns") {
    import org.apache.spark.sql.types._
    // bucket[16](34) = (2017239379 mod 16) = 3
    transformValue("bucket[16]", Left(34L), LongType) shouldBe
      Some(Left(2017239379L % 16))
    transformValue("bucket[16]", Right("iceberg"), StringType) shouldBe
      Some(Left(1210000089L % 16))
    // truncate: ints floor to the width multiple (negatives too);
    // strings keep the first W code points
    transformValue("truncate[10]", Left(37L), LongType) shouldBe
      Some(Left(30L))
    transformValue("truncate[10]", Left(-3L), LongType) shouldBe
      Some(Left(-10L))
    transformValue("truncate[3]", Right("apple"), StringType) shouldBe
      Some(Right("app"))
    transformValue("truncate[5]", Right("ab"), StringType) shouldBe
      Some(Right("ab"))
    // time transforms on micros: 2017-11-16T22:31:08Z
    val micros = 1510871468000000L
    transformValue("day", Left(micros), TimestampType) shouldBe
      Some(Left(17486L))
    transformValue("hour", Left(micros), TimestampType) shouldBe
      Some(Left(micros / 3600000000L))
    transformValue("month", Left(micros), TimestampType) shouldBe
      Some(Left((2017 - 1970) * 12 + 10L))
    transformValue("year", Left(micros), TimestampType) shouldBe
      Some(Left(47L))
    // on date (epoch days) the same names apply to the day count
    transformValue("day", Left(17486L), DateType) shouldBe Some(Left(17486L))
    transformValue("year", Left(17486L), DateType) shouldBe Some(Left(47L))
    // not modeled → None (pruning fails open): hour(date), void, future
    transformValue("hour", Left(17486L), DateType) shouldBe None
    transformValue("void", Left(1L), LongType) shouldBe None
    transformValue("zorder[2]", Left(1L), LongType) shouldBe None
    // pre-epoch micros floor-divide (no truncation toward zero):
    // 1969-12-31T23:00Z is day -1, not day 0
    transformValue("day", Left(-3600000000L), TimestampType) shouldBe
      Some(Left(-1L))
  }

  // --------------------------------------------------- readWhere pruning

  /** Authors a foreign table at `t` with one spec and one single-row
    * manifest per data file, each carrying the given partition tuple.
    * Returns file path by label. */
  private def authorTable(t: String, schemaJson: String, specJson: String,
      partAvroFields: String,
      files: Seq[(String, org.apache.spark.sql.DataFrame,
        Map[String, Any])]): Map[String, String] = {
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    def parquetFile(rel: String,
                    df: org.apache.spark.sql.DataFrame): String = {
      val stage = fresh("graft-ipr-stage")
      df.coalesce(1).write.parquet(stage)
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      val dest = new Path(t, rel)
      fs.mkdirs(dest.getParent)
      fs.rename(part, dest) shouldBe true
      dest.toString
    }
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int"},
         |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
         |  {"name":"file_path","type":"string"},
         |  {"name":"file_format","type":"string"},
         |  {"name":"partition","type":{"type":"record","name":"r102",
         |    "fields":[$partAvroFields]}},
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
    val paths = files.map { case (label, df, tuple) =>
      val path = parquetFile(s"data/$label.parquet", df)
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      val d = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      val pr = new GenericData.Record(entrySchema
        .getField("data_file").schema().getField("partition").schema())
      tuple.foreach { case (k, v) => pr.put(k, v.asInstanceOf[AnyRef]) }
      d.put("partition", pr)
      d.put("record_count", df.count())
      d.put("file_size_in_bytes", 1L)
      e.put("data_file", d)
      val (mPath, mLen) = avro(s"metadata/m-$label.avro", entrySchema, Seq(e))
      (label, path, mPath, mLen)
    }
    val listRows = paths.map { case (_, _, mPath, mLen) =>
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", mPath)
      r.put("manifest_length", mLen)
      r.put("partition_spec_id", 0)
      r.put("added_snapshot_id", 7L)
      r
    }
    val (list, _) = avro("metadata/snap-7.avro", listSchema, listRows)
    writeText(t, "metadata/v1.metadata.json",
      s"""{"format-version":2,"table-uuid":"u","location":"$t",
         |"last-updated-ms":1,"last-column-id":9,
         |"schemas":[$schemaJson],"current-schema-id":0,
         |"partition-specs":[$specJson],"default-spec-id":0,
         |"properties":{},"current-snapshot-id":7,
         |"snapshots":[{"snapshot-id":7,"timestamp-ms":1,
         |"summary":{"operation":"append"},
         |"manifest-list":"$list","schema-id":0}]
         |}""".stripMargin.replace("\n", ""))
    writeText(t, "metadata/version-hint.text", "1")
    paths.map(p => p._1 -> p._2).toMap
  }

  private def inputFileNames(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.inputFiles.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet

  test("readWhere prunes by day transform: a one-day range reads only " +
    "that day's files, an unmodeled spec field fails open, and rows " +
    "always equal read().filter()") {
    import spark.implicits._
    import java.time.Instant
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.from(Instant.parse(s))
    val t = fresh("graft-ipr-day")
    val schemaJson =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"ts","required":false,"type":"timestamptz"},
        |{"id":3,"name":"payload","required":false,"type":"string"}]}"""
        .stripMargin.replace("\n", "")
    // ts_day = day(ts); a second spec field with a transform this
    // evaluator does not model must never prune
    val specJson =
      """{"spec-id":0,"fields":[
        |{"name":"ts_day","transform":"day","source-id":2,"field-id":1000},
        |{"name":"pay_z","transform":"zorder[2]","source-id":3,
        |"field-id":1001}]}""".stripMargin.replace("\n", "")
    val partAvro =
      """{"name":"ts_day","type":["null","int"],"default":null},
        |{"name":"pay_z","type":["null","string"],"default":null}"""
        .stripMargin.replace("\n", "")
    // 2024-01-01 = epoch day 19723; 2024-01-02 = 19724
    authorTable(t, schemaJson, specJson, partAvro, Seq(
      ("d1", Seq((1L, ts("2024-01-01T10:00:00Z"), "a"),
        (2L, ts("2024-01-01T23:30:00Z"), "b"))
        .toDF("id", "ts", "payload"), Map("ts_day" -> 19723, "pay_z" -> "x")),
      ("d2a", Seq((3L, ts("2024-01-02T00:10:00Z"), "c"))
        .toDF("id", "ts", "payload"), Map("ts_day" -> 19724, "pay_z" -> "x")),
      ("d2b", Seq((4L, ts("2024-01-02T18:00:00Z"), "d"))
        .toDF("id", "ts", "payload"), Map("ts_day" -> 19724, "pay_z" -> "x"))))
    // one-day range: only d1 is scanned, rows exact
    val day1 = IcebergInterop.readWhere(spark, t, Seq(ScanBetween("ts",
      Instant.parse("2024-01-01T00:00:00Z"),
      Instant.parse("2024-01-01T23:59:59Z"))))
    inputFileNames(day1) shouldBe Set("d1.parquet")
    day1.select($"id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    // a range crossing midnight keeps both days' files but filters
    // rows exactly
    val cross = IcebergInterop.readWhere(spark, t, Seq(ScanBetween("ts",
      Instant.parse("2024-01-01T23:00:00Z"),
      Instant.parse("2024-01-02T01:00:00Z"))))
    inputFileNames(cross) shouldBe Set("d1.parquet", "d2a.parquet",
      "d2b.parquet")
    cross.select($"id").as[Long].collect().sorted shouldBe Array(2L, 3L)
    // point equality on the timestamp prunes to its day
    val point = IcebergInterop.readWhere(spark, t,
      Seq(ScanEq("ts", Instant.parse("2024-01-02T00:10:00Z"))))
    inputFileNames(point) shouldBe Set("d2a.parquet", "d2b.parquet")
    point.select($"id").as[Long].collect() shouldBe Array(3L)
    // the unmodeled zorder spec field never prunes: a payload
    // predicate scans everything and filters exactly
    val pay = IcebergInterop.readWhere(spark, t, Seq(ScanEq("payload", "d")))
    inputFileNames(pay) shouldBe Set("d1.parquet", "d2a.parquet",
      "d2b.parquet")
    pay.select($"id").as[Long].collect() shouldBe Array(4L)
    // empty prune result: a day with no files reads zero rows
    IcebergInterop.readWhere(spark, t, Seq(ScanEq("ts",
      Instant.parse("2030-06-06T00:00:00Z")))).count() shouldBe 0L
  }

  test("readWhere prunes by bucket and truncate transforms; a " +
    "present-NULL tuple value prunes equality and range") {
    import spark.implicits._
    val t = fresh("graft-ipr-bkt")
    import org.apache.spark.sql.types.{LongType, StringType}
    def bucket4(id: Long): Int =
      transformValue("bucket[4]", Left(id), LongType)
        .get.swap.getOrElse(-1L).toInt
    def trunc3(s: String): String =
      transformValue("truncate[3]", Right(s), StringType)
        .get.getOrElse("")
    val schemaJson =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"payload","required":false,"type":"string"}]}"""
        .stripMargin.replace("\n", "")
    val specJson =
      """{"spec-id":0,"fields":[
        |{"name":"id_bucket","transform":"bucket[4]","source-id":1,
        |"field-id":1000},
        |{"name":"pay_tr","transform":"truncate[3]","source-id":2,
        |"field-id":1001}]}""".stripMargin.replace("\n", "")
    val partAvro =
      """{"name":"id_bucket","type":["null","int"],"default":null},
        |{"name":"pay_tr","type":["null","string"],"default":null}"""
        .stripMargin.replace("\n", "")
    // one file per id so each file's bucket is exact; fN holds a NULL
    // payload (and a null tuple value for it)
    authorTable(t, schemaJson, specJson, partAvro, Seq(
      ("f10", Seq((10L, "apple")).toDF("id", "payload"),
        Map("id_bucket" -> bucket4(10L), "pay_tr" -> trunc3("apple"))),
      ("f11", Seq((11L, "apric")).toDF("id", "payload"),
        Map("id_bucket" -> bucket4(11L), "pay_tr" -> trunc3("apric"))),
      ("f12", Seq((12L, "zebra")).toDF("id", "payload"),
        Map("id_bucket" -> bucket4(12L), "pay_tr" -> trunc3("zebra"))),
      ("fN", Seq((13L, null.asInstanceOf[String])).toDF("id", "payload"),
        Map("id_bucket" -> bucket4(13L)))))
    // bucket equality: only files sharing bucket4(10) survive
    val expect10 = Seq(10L, 11L, 12L, 13L)
      .filter(i => bucket4(i) == bucket4(10L))
      .map(i => (if (i == 13L) "fN" else s"f$i") + ".parquet").toSet
    val q10 = IcebergInterop.readWhere(spark, t, Seq(ScanEq("id", 10L)))
    inputFileNames(q10) shouldBe expect10
    q10.select($"payload").as[String].collect() shouldBe Array("apple")
    // a bucketed column does NOT prune ranges (hash order ≠ value
    // order) — all files scanned, rows exact
    val qr = IcebergInterop.readWhere(spark, t,
      Seq(ScanBetween("id", 10L, 11L)))
    qr.inputFiles.length shouldBe 4
    qr.select($"id").as[Long].collect().sorted shouldBe Array(10L, 11L)
    // truncate[3] prunes equality to the matching prefix — and the
    // NULL-tuple file drops too (its rows are all null)
    val qe = IcebergInterop.readWhere(spark, t,
      Seq(ScanEq("payload", "apple")))
    inputFileNames(qe) shouldBe Set("f10.parquet")
    // truncate is monotone: a prefix range prunes zebra AND the null
    // file, keeps both ap* files
    val qt = IcebergInterop.readWhere(spark, t,
      Seq(ScanBetween("payload", "aaaaa", "azzzz")))
    inputFileNames(qt) shouldBe Set("f10.parquet", "f11.parquet")
    qt.select($"id").as[Long].collect().sorted shouldBe Array(10L, 11L)
  }

  // ----------------------------------------------- partitioned writes

  test("partitioned writes record the spec and per-file tuples: " +
    "readWhere prunes the writer's own table, appends keep the spec, " +
    "a different append spec refuses, overwrite evolves the spec id") {
    import spark.implicits._
    import java.time.Instant
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.from(Instant.parse(s))
    val t = fresh("graft-ipw")
    val spec = Seq(SpecField("ts_day", "day", "ts"),
      SpecField("cat_tr", "truncate[2]", "cat"))
    IcebergInterop.write(Seq(
      (1L, ts("2024-03-01T08:00:00Z"), "aa-x"),
      (2L, ts("2024-03-01T09:00:00Z"), "ab-y"),
      (3L, ts("2024-03-02T10:00:00Z"), "aa-z"))
      .toDF("id", "ts", "cat"), t, partitionBy = spec)
    // the spec landed in metadata and resolves on read
    val st = IcebergInterop.state(spark, t, None)
    st.specs(st.defaultSpecId) shouldBe spec
    // every file carries a tuple; 3 distinct (day, prefix) pairs
    st.files.foreach(f => f.partition.keySet shouldBe Set("ts_day", "cat_tr"))
    st.files.map(_.partition).toSet should have size 3
    // a one-day equality prunes to that day's files
    val day1 = IcebergInterop.readWhere(spark, t, Seq(ScanBetween("ts",
      Instant.parse("2024-03-01T00:00:00Z"),
      Instant.parse("2024-03-01T23:59:59Z"))))
    day1.inputFiles.length shouldBe 2
    day1.select($"id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    // equality prunes through the truncate tuple AND the recorded
    // value bounds (the writer records footer stats): exactly the one
    // file carrying the value survives
    val aa = IcebergInterop.readWhere(spark, t, Seq(ScanEq("cat", "aa-z")))
    aa.inputFiles.length shouldBe 1
    aa.select($"id").as[Long].collect() shouldBe Array(3L)
    // appends keep the spec; the new day prunes alone
    IcebergInterop.write(Seq((4L, ts("2024-03-03T01:00:00Z"), "zz-q"))
      .toDF("id", "ts", "cat"), t, partitionBy = spec)
    val day3 = IcebergInterop.readWhere(spark, t, Seq(ScanEq("ts",
      Instant.parse("2024-03-03T01:00:00Z"))))
    day3.inputFiles.length shouldBe 1
    day3.select($"id").as[Long].collect() shouldBe Array(4L)
    // an append under a DIFFERENT spec refuses by name
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.write(Seq((5L, ts("2024-03-03T02:00:00Z"), "k"))
        .toDF("id", "ts", "cat"), t,
        partitionBy = Seq(SpecField("ts_hour", "hour", "ts")))
    }.getMessage should include("default spec")
    // and so does an unpartitioned append
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.write(Seq((5L, ts("2024-03-03T02:00:00Z"), "k"))
        .toDF("id", "ts", "cat"), t)
    }.getMessage should include("default spec")
    // overwrite EVOLVES: the unpartitioned spec appends under a new id,
    // the old spec stays listed (old snapshots resolve their tuples)
    IcebergInterop.write(Seq((9L, ts("2024-04-01T00:00:00Z"), "n"))
      .toDF("id", "ts", "cat"), t, overwrite = true)
    val st2 = IcebergInterop.state(spark, t, None)
    st2.defaultSpecId should be > st.defaultSpecId
    st2.specs(st.defaultSpecId) shouldBe spec
    st2.specs(st2.defaultSpecId) shouldBe Nil
    IcebergInterop.read(spark, t).select($"id").as[Long]
      .collect() shouldBe Array(9L)
  }

  test("null partition values and path-hostile strings round-trip " +
    "through the staged write: tuples decode exactly, null tuples " +
    "prune equality") {
    import spark.implicits._
    val t = fresh("graft-ipw-null")
    val spec = Seq(SpecField("cat", "identity", "cat"))
    IcebergInterop.write(Seq(
      (1L, "plain"), (2L, "a/b:c d%2F"), (3L, null.asInstanceOf[String]))
      .toDF("id", "cat"), t, partitionBy = spec)
    val st = IcebergInterop.state(spark, t, None)
    // the hostile value survives Hive path escaping byte-exactly
    st.files.flatMap(_.partition.values).filter(_ != null)
      .map(_.toString).toSet shouldBe Set("plain", "a/b:c d%2F")
    st.files.map(_.partition("cat")).count(_ == null) shouldBe 1
    // equality on the hostile value prunes to its file alone (the
    // null-tuple file drops: identity is null-preserving)
    val q = IcebergInterop.readWhere(spark, t,
      Seq(ScanEq("cat", "a/b:c d%2F")))
    q.inputFiles.length shouldBe 1
    q.select($"id").as[Long].collect() shouldBe Array(2L)
    // the null row is still served by a plain read
    IcebergInterop.read(spark, t).count() shouldBe 3L
  }

  test("Hive-partitioned manifest tables export as identity specs: " +
    "tuples parse from paths, the Iceberg read FILLS the identity " +
    "columns (data files omit them), prunes on them, and the import " +
    "round-trips") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val t = fresh("graft-ipx")
    ManifestLake.write(Seq(
      (1L, "emea", d("2024-01-01"), 10.0),
      (2L, "emea", d("2024-01-02"), 20.0),
      (3L, "apac", d("2024-01-01"), 30.0),
      (4L, null.asInstanceOf[String], d("2024-01-02"), 40.0))
      .toDF("id", "region", "day", "v"), t,
      partitionBy = Seq("region", "day"))
    IcebergInterop.exportFromManifest(spark, t)
    val st = IcebergInterop.state(spark, t, None)
    st.specs(st.defaultSpecId) shouldBe Seq(
      SpecField("region", "identity", "region"),
      SpecField("day", "identity", "day"))
    // tuples carry parsed values: region strings, day as epoch days
    st.files.map(_.partition("day")).toSet shouldBe
      Set(Integer.valueOf(19723), Integer.valueOf(19724))
    st.files.map(_.partition("region")).toSet shouldBe
      Set("emea", "apac", null)
    // the Iceberg read reconstructs the identity columns from tuples —
    // the Hive-layout data files do NOT carry them
    val full = IcebergInterop.read(spark, t)
    full.count() shouldBe 4L
    full.filter($"region".isNull).select($"id").as[Long]
      .collect() shouldBe Array(4L)
    full.select($"id", $"region", $"day").as[(Long, String, java.sql.Date)]
      .collect().sortBy(_._1) shouldBe Array(
      (1L, "emea", d("2024-01-01")), (2L, "emea", d("2024-01-02")),
      (3L, "apac", d("2024-01-01")), (4L, null, d("2024-01-02")))
    // identity pruning: one (region, day) cell reads one file
    val cell = IcebergInterop.readWhere(spark, t, Seq(
      ScanEq("region", "emea"),
      ScanBetween("day", java.time.LocalDate.parse("2024-01-02"),
        java.time.LocalDate.parse("2024-01-02"))))
    cell.inputFiles.length shouldBe 1
    cell.select($"id").as[Long].collect() shouldBe Array(2L)
    // metadata-only import back: paths carry the values, so it lands,
    // and the lake read reconstructs the same rows
    IcebergInterop.importToManifest(spark, t)
    ManifestLake.read(spark, t)
      .select($"id", $"region").as[(Long, String)]
      .collect().sortBy(_._1) shouldBe Array(
      (1L, "emea"), (2L, "emea"), (3L, "apac"), (4L, null))
  }

  test("a foreign migrated identity table whose paths do NOT carry " +
    "the tuple values refuses metadata-only import by name (the lake " +
    "would read the column back wrong)") {
    import spark.implicits._
    val t = fresh("graft-ipx-ref")
    val schemaJson =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"region","required":false,"type":"string"}]}"""
        .stripMargin.replace("\n", "")
    val specJson =
      """{"spec-id":0,"fields":[
        |{"name":"region","transform":"identity","source-id":2,
        |"field-id":1000}]}""".stripMargin.replace("\n", "")
    val partAvro =
      """{"name":"region","type":["null","string"],"default":null}"""
    // the data file carries ONLY id — the migrated shape — and lives
    // under a flat path with no region=… segment
    authorTable(t, schemaJson, specJson, partAvro, Seq(
      ("flat", Seq(Tuple1(1L)).toDF("id"), Map("region" -> "emea"))))
    // the read serves the identity value from the tuple
    IcebergInterop.read(spark, t).select($"id", $"region")
      .as[(Long, String)].collect() shouldBe Array((1L, "emea"))
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.importToManifest(spark, t)
    }.getMessage should include("Hive-style")
  }

  test("SQL WHERE prunes through the IcebergSqlRule: the relation " +
    "swaps for the pruned file set, the original filter stays, rows " +
    "match the unpruned read") {
    import spark.implicits._
    import java.sql.Timestamp
    import java.time.Instant
    def ts(s: String) = Timestamp.from(Instant.parse(s))
    val t = fresh("graft-ipr-sql")
    IcebergInterop.write(Seq(
      (1L, ts("2024-03-01T08:00:00Z"), 5.0),
      (2L, ts("2024-03-02T09:00:00Z"), 6.0),
      (3L, ts("2024-03-03T10:00:00Z"), 7.0))
      .toDF("id", "ts", "v"), t,
      partitionBy = Seq(SpecField("ts_day", "day", "ts")))
    IcebergSql.register("iprsql", t)
    val pruned = spark.sql(
      """SELECT id, v FROM graft_iceberg.iprsql
        |WHERE ts >= TIMESTAMP '2024-03-02 00:00:00'
        |  AND ts <= TIMESTAMP '2024-03-02 23:59:59'""".stripMargin)
    pruned.inputFiles.length shouldBe 1
    pruned.as[(Long, Double)].collect() shouldBe Array((2L, 6.0))
    // equality point: one day's file; other conjuncts ride along
    val eq = spark.sql(
      """SELECT id FROM graft_iceberg.iprsql
        |WHERE ts = TIMESTAMP '2024-03-03 10:00:00' AND v > 1.0""".stripMargin)
    eq.inputFiles.length shouldBe 1
    eq.as[Long].collect() shouldBe Array(3L)
    // a shape the extractor cannot read (OR at top) stays unpruned
    // and exact
    val or = spark.sql(
      """SELECT id FROM graft_iceberg.iprsql
        |WHERE ts = TIMESTAMP '2024-03-01 08:00:00'
        |   OR ts = TIMESTAMP '2024-03-03 10:00:00'""".stripMargin)
    or.inputFiles.length shouldBe 3
    or.as[Long].collect().sorted shouldBe Array(1L, 3L)
  }

  test("recorded column bounds prune files with NO partition layout: " +
    "the manifest-level analog of footer skipping, one-sided bounds " +
    "prune one-sidedly, absent bounds fail open") {
    import spark.implicits._
    val t = fresh("graft-ipr-bounds")
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    def parquetFile(rel: String,
                    df: org.apache.spark.sql.DataFrame): String = {
      val stage = fresh("graft-iprb-stage")
      df.coalesce(1).write.parquet(stage)
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      val dest = new Path(t, rel)
      fs.mkdirs(dest.getParent)
      fs.rename(part, dest) shouldBe true
      dest.toString
    }
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"},
        |  {"name":"lower_bounds","type":["null",{"type":"array","items":
        |    {"type":"record","name":"k126","fields":[
        |    {"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],
        |    "default":null},
        |  {"name":"upper_bounds","type":["null",{"type":"array","items":
        |    {"type":"record","name":"k128","fields":[
        |    {"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],
        |    "default":null}
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
    def leLong(l: Long): java.nio.ByteBuffer = {
      val b = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putLong(l); b.flip(); b
    }
    def utf8(s: String): java.nio.ByteBuffer =
      java.nio.ByteBuffer.wrap(s.getBytes(StandardCharsets.UTF_8))
    def boundsArr(schemaField: org.apache.avro.Schema,
                  vs: Map[Int, java.nio.ByteBuffer]): AnyRef = {
      val itemSchema = schemaField.getTypes.get(1).getElementType
      val arr = new java.util.ArrayList[GenericRecord]()
      vs.foreach { case (k, v) =>
        val r = new GenericData.Record(itemSchema)
        r.put("key", k); r.put("value", v)
        arr.add(r)
      }
      arr
    }
    def entry(path: String, n: Long, lo: Map[Int, java.nio.ByteBuffer],
              hi: Map[Int, java.nio.ByteBuffer]): GenericRecord = {
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      val d = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      d.put("record_count", n)
      d.put("file_size_in_bytes", 1L)
      val dfSchema = entrySchema.getField("data_file").schema()
      if (lo.nonEmpty)
        d.put("lower_bounds",
          boundsArr(dfSchema.getField("lower_bounds").schema(), lo))
      if (hi.nonEmpty)
        d.put("upper_bounds",
          boundsArr(dfSchema.getField("upper_bounds").schema(), hi))
      e.put("data_file", d)
      e
    }
    // field ids: 1 = id (long), 2 = name (string)
    val f1 = parquetFile("data/f1.parquet",
      (1L to 10L).map(i => (i, s"a$i")).toDF("id", "name"))
    val f2 = parquetFile("data/f2.parquet",
      (11L to 20L).map(i => (i, s"m$i")).toDF("id", "name"))
    val f3 = parquetFile("data/f3.parquet",
      (21L to 30L).map(i => (i, s"z$i")).toDF("id", "name"))
    val (m1, l1) = avro("metadata/m1.avro", entrySchema, Seq(
      entry(f1, 10, Map(1 -> leLong(1L), 2 -> utf8("a1")),
        Map(1 -> leLong(10L), 2 -> utf8("a9")))))
    val (m2, l2) = avro("metadata/m2.avro", entrySchema, Seq(
      entry(f2, 10, Map(1 -> leLong(11L), 2 -> utf8("m11")),
        Map(1 -> leLong(20L), 2 -> utf8("m20")))))
    // f3: only a LOWER id bound (one-sided), no name bounds
    val (m3, l3) = avro("metadata/m3.avro", entrySchema, Seq(
      entry(f3, 10, Map(1 -> leLong(21L)), Map.empty)))
    def listRow(p: String, len: Long): GenericRecord = {
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", p)
      r.put("manifest_length", len)
      r.put("partition_spec_id", 0)
      r.put("added_snapshot_id", 7L)
      r
    }
    val (list, _) = avro("metadata/snap-7.avro", listSchema,
      Seq(listRow(m1, l1), listRow(m2, l2), listRow(m3, l3)))
    val schemaJson =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"name","required":false,"type":"string"}]}"""
        .stripMargin.replace("\n", "")
    writeText(t, "metadata/v1.metadata.json",
      s"""{"format-version":2,"table-uuid":"u","location":"$t",
         |"last-updated-ms":1,"last-column-id":2,
         |"schemas":[$schemaJson],"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
         |"properties":{},"current-snapshot-id":7,
         |"snapshots":[{"snapshot-id":7,"timestamp-ms":1,
         |"summary":{"operation":"append"},
         |"manifest-list":"$list","schema-id":0}]
         |}""".stripMargin.replace("\n", ""))
    writeText(t, "metadata/version-hint.text", "1")
    // range inside f2's id bounds: one file scanned
    val r = IcebergInterop.readWhere(spark, t,
      Seq(ScanBetween("id", 12L, 15L)))
    inputFileNames(r) shouldBe Set("f2.parquet")
    r.select($"id").as[Long].collect().sorted shouldBe (12L to 15L).toArray
    // string equality prunes on utf8 bounds; f3 has none → kept
    val s = IcebergInterop.readWhere(spark, t, Seq(ScanEq("name", "z25")))
    inputFileNames(s) shouldBe Set("f3.parquet")
    s.select($"id").as[Long].collect() shouldBe Array(25L)
    // one-sided: f3's lower bound 21 prunes an id <= 20 range…
    val low = IcebergInterop.readWhere(spark, t,
      Seq(ScanBetween("id", 1L, 9L)))
    inputFileNames(low) shouldBe Set("f1.parquet")
    // …but cannot prune an UNBOUNDED-above equality beyond it
    val hi = IcebergInterop.readWhere(spark, t, Seq(ScanEq("id", 99L)))
    inputFileNames(hi) shouldBe Set("f3.parquet")
    hi.count() shouldBe 0L
  }

  test("the writer records footer bounds in its manifests: an " +
    "UNPARTITIONED own table prunes ranges, and appended snapshots " +
    "keep earlier files' bounds") {
    import spark.implicits._
    val t = fresh("graft-ipw-stats")
    IcebergInterop.write(
      (1L to 10L).map(i => (i, s"a$i")).toDF("id", "name"), t)
    IcebergInterop.write(
      (11L to 20L).map(i => (i, s"m$i")).toDF("id", "name"), t)
    IcebergInterop.write(
      (21L to 30L).map(i => (i, s"z$i")).toDF("id", "name"), t)
    val st = IcebergInterop.state(spark, t, None)
    // each append may split into several part files — every one must
    // carry both columns' bounds
    st.files.size should be >= 3
    st.files.foreach { f =>
      f.lower.keySet shouldBe Set("id", "name")
      f.upper.keySet shouldBe Set("id", "name")
    }
    val q = IcebergInterop.readWhere(spark, t,
      Seq(ScanBetween("id", 12L, 15L)))
    q.inputFiles.length should be < st.files.size
    q.select($"id").as[Long].collect().sorted shouldBe (12L to 15L).toArray
    val s = IcebergInterop.readWhere(spark, t, Seq(ScanEq("name", "z25")))
    s.inputFiles.length shouldBe 1
    s.select($"id").as[Long].collect() shouldBe Array(25L)
  }

  test("legacy flat partition-spec field parses as spec 0, and " +
    "specless tables never prune") {
    import spark.implicits._
    val t = fresh("graft-ipr-legacy")
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    // a v1 table written by our own writer: unpartitioned — readWhere
    // degrades to read().filter() with every file kept
    IcebergInterop.write(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"), t)
    val q = IcebergInterop.readWhere(spark, t, Seq(ScanEq("id", 2L)))
    q.select($"payload").as[String].collect() shouldBe Array("b")
    q.inputFiles.length should be >= 1
    // the legacy flat field parses: rewrite the metadata naming a
    // truncate spec (the tuple is absent from the manifests, so
    // pruning STILL fails open — absent ≠ provably excluded)
    val metaDir = new Path(t, "metadata")
    val v1 = new Path(metaDir, "v1.metadata.json")
    val in = fs.open(v1)
    val txt = try {
      val o = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, o, 65536, false)
      new String(o.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val patched = txt
      .replace(""""partition-specs":[{"spec-id":0,"fields":[]}]""",
        """"partition-specs":[]""")
      .replace(""""partition-spec":[]""",
        """"partition-spec":[{"name":"id_tr","transform":"truncate[10]",
          |"source-id":1,"field-id":1000}]""".stripMargin.replace("\n", ""))
    writeText(t, "metadata/v1.metadata.json", patched)
    val st = IcebergInterop.state(spark, t, None)
    st.specs(0) shouldBe Seq(SpecField("id_tr", "truncate[10]", "id"))
    // tuple absent from the manifest → fail open, exact rows
    IcebergInterop.readWhere(spark, t, Seq(ScanEq("id", 1L)))
      .select($"payload").as[String].collect() shouldBe Array("a")
  }
}
