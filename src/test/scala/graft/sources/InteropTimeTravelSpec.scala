package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** `TIMESTAMP AS OF` on both interop dialects, plus the ancient
  * pre-manifest-list Iceberg layout:
  *
  *   - Delta resolves the latest commit whose MONOTONICALLY ADJUSTED
  *     commitInfo timestamp is ≤ the instant (clock-skewed logs stay
  *     well-defined); before-first and after-latest refuse by name;
  *   - Iceberg resolves through the snapshot-log (the sequence of
  *     CURRENT snapshots over time — a rollback resolves the way a
  *     reader at that instant saw the table);
  *   - a hand-written v1 metadata whose snapshot carries an inline
  *     `manifests` array (no manifest-list file) serves reads.
  */
class InteropTimeTravelSpec extends AnyFunSuite with Matchers
  with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-ttas").toString + "/t"

  private def writeText(table: String, rel: String, text: String): Unit = {
    val p = new Path(table, rel)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private val schemaJson =
    """{"type":"struct","fields":[
      |{"name":"id","type":"long","nullable":true,"metadata":{}}
      |]}""".stripMargin.replace("\n", "")

  /** A three-commit Delta table with HAND-CONTROLLED commitInfo
    * timestamps (f1 at t0, +f2 at t1, +f3 at t2). */
  private def deltaAt(ts: Seq[Long]): String = {
    import spark.implicits._
    val t = fresh()
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    Seq("f1", "f2", "f3").zipWithIndex.foreach { case (name, i) =>
      val stage = fresh()
      Seq(i.toLong * 10).toDF("id").coalesce(1).write.parquet(stage)
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      fs.mkdirs(new Path(t))
      fs.rename(part, new Path(t, s"$name.parquet")) shouldBe true
    }
    writeText(t, "_delta_log/00000000000000000000.json",
      s"""{"commitInfo":{"timestamp":${ts(0)},"operation":"WRITE"}}
         |{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"tt","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(schemaJson)
      },"partitionColumns":[],"configuration":{},"createdTime":1}}
         |{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
         |""".stripMargin)
    Seq(1, 2).foreach { v =>
      writeText(t, f"_delta_log/$v%020d.json",
        s"""{"commitInfo":{"timestamp":${ts(v)},"operation":"WRITE"}}
           |{"add":{"path":"f${v + 1}.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
           |""".stripMargin)
    }
    t
  }

  test("Delta TIMESTAMP AS OF: boundary-exact resolution, named " +
    "refusals outside the retained range, SQL surface") {
    val t = deltaAt(Seq(1700000001000L, 1700000002000L, 1700000003000L))
    DeltaInterop.versionAt(spark, t, 1700000001000L) shouldBe 0L
    DeltaInterop.versionAt(spark, t, 1700000001999L) shouldBe 0L
    DeltaInterop.versionAt(spark, t, 1700000002000L) shouldBe 1L
    DeltaInterop.versionAt(spark, t, 1700000003000L) shouldBe 2L
    DeltaInterop.readTimestamp(spark, t, 1700000002500L)
      .count() shouldBe 2L
    intercept[IllegalArgumentException] {
      DeltaInterop.versionAt(spark, t, 1700000000999L)
    }.getMessage should include("before the first")
    intercept[IllegalArgumentException] {
      DeltaInterop.versionAt(spark, t, 1700000003001L)
    }.getMessage should include("after the latest")
    // SQL: ts(1) = 2023-11-14T22:13:22Z (UTC session)
    DeltaSql.register("ttas_d", t)
    spark.sql("SELECT count(*) AS n FROM graft_delta.ttas_d " +
      "TIMESTAMP AS OF '2023-11-14 22:13:22'")
      .collect().head.getLong(0) shouldBe 2L
  }

  test("Delta clock skew: a commit recorded EARLIER than its " +
    "predecessor adjusts monotonically — resolution stays " +
    "well-defined") {
    val t = deltaAt(Seq(1700000005000L, 1700000004000L, 1700000004500L))
    // adjusted: v0=5000, v1=5001, v2=5002
    DeltaInterop.versionAt(spark, t, 1700000005000L) shouldBe 0L
    DeltaInterop.versionAt(spark, t, 1700000005001L) shouldBe 1L
    DeltaInterop.versionAt(spark, t, 1700000005002L) shouldBe 2L
    intercept[IllegalArgumentException] {
      DeltaInterop.versionAt(spark, t, 1700000004999L)
    }
  }

  test("Delta inCommitTimestamps: resolution follows the commit's OWN " +
    "monotonic clock when present — wall-clock commitInfo timestamps " +
    "that disagree are ignored — and graft DML on an ICT table emits " +
    "the field monotonically") {
    import spark.implicits._
    val t = fresh()
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    Seq("f1", "f2").zipWithIndex.foreach { case (name, i) =>
      val stage = fresh()
      Seq(i.toLong * 10, i.toLong * 10 + 1).toDF("id")
        .coalesce(1).write.parquet(stage)
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      fs.mkdirs(new Path(t))
      fs.rename(part, new Path(t, s"$name.parquet")) shouldBe true
    }
    // hand-written ICT log: the wall-clock `timestamp` fields are
    // DELIBERATELY wrong (v1's is far in the past) — delta-spark
    // resolves through inCommitTimestamp on such tables, and so must
    // this reader
    writeText(t, "_delta_log/00000000000000000000.json",
      s"""{"commitInfo":{"inCommitTimestamp":1700000001000,"timestamp":1600000000000,"operation":"WRITE"}}
         |{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["inCommitTimestamps"]}}
         |{"metaData":{"id":"ict","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(schemaJson)
      },"partitionColumns":[],"configuration":{"delta.enableInCommitTimestamps":"true"},"createdTime":1}}
         |{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
         |""".stripMargin)
    writeText(t, "_delta_log/00000000000000000001.json",
      s"""{"commitInfo":{"inCommitTimestamp":1700000002000,"timestamp":1500000000000,"operation":"WRITE"}}
         |{"add":{"path":"f2.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
         |""".stripMargin)
    DeltaInterop.versionAt(spark, t, 1700000001000L) shouldBe 0L
    DeltaInterop.versionAt(spark, t, 1700000001999L) shouldBe 0L
    DeltaInterop.versionAt(spark, t, 1700000002000L) shouldBe 1L
    intercept[IllegalArgumentException] {
      DeltaInterop.versionAt(spark, t, 1600000000000L)
    }.getMessage should include("before the first")
    // graft DML on the ICT table: the new commit must carry its own
    // inCommitTimestamp, strictly after the previous commit's
    DeltaInterop.delete(spark, t, org.apache.spark.sql.functions
      .col("id") === 0L).rowsAffected shouldBe 1L
    val v2Text = new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(
        fs.open(new Path(t, "_delta_log/00000000000000000002.json"))),
      StandardCharsets.UTF_8)
    val firstLine = v2Text.split('\n').head
    firstLine should startWith("""{"commitInfo":{"inCommitTimestamp":""")
    val ict = firstLine
      .stripPrefix("""{"commitInfo":{"inCommitTimestamp":""")
      .takeWhile(_.isDigit).toLong
    ict should be > 1700000002000L
    // and resolution at the new head follows it
    DeltaInterop.versionAt(spark, t, ict) shouldBe 2L
  }

  test("Iceberg TIMESTAMP AS OF resolves through the snapshot-log — " +
    "including a rollback (the log is the sequence of CURRENT " +
    "snapshots); SQL surface; pre-first refuses") {
    import spark.implicits._
    val t = fresh()
    val s1 = IcebergInterop.write(Seq(1L, 2L).toDF("id"), t)
    Thread.sleep(5)
    val s2 = IcebergInterop.write(Seq(3L).toDF("id"), t)
    Thread.sleep(5)
    IcebergInterop.rollbackTo(spark, t, s1)
    val hist = IcebergInterop.history(spark, t)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val (t1, t2) = (hist(s1), hist(s2))
    IcebergInterop.snapshotAt(spark, t, t1) shouldBe s1
    IcebergInterop.snapshotAt(spark, t, t2) shouldBe s2
    // after the rollback's log entry, the CURRENT snapshot is s1 again
    IcebergInterop.snapshotAt(spark, t,
      System.currentTimeMillis() + 1000L) shouldBe s1
    IcebergInterop.readTimestamp(spark, t, t2).count() shouldBe 3L
    intercept[IllegalArgumentException] {
      IcebergInterop.snapshotAt(spark, t, t1 - 1000L)
    }.getMessage should include("before the first")
    // SQL: a literal in the UTC session resolves the same instant
    IcebergSql.register("ttas_i", t)
    val iso = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(t2))
    spark.sql("SELECT count(*) AS n FROM graft_iceberg.ttas_i " +
      s"TIMESTAMP AS OF '$iso'").collect().head.getLong(0) shouldBe 3L
  }

  test("Delta typeWidening tables serve: old int32/float files read " +
    "under the WIDENED current schema (Spark's parquet reader widens " +
    "natively), the feature accepted by name") {
    import spark.implicits._
    val t = fresh()
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    // f1 written NARROW (int/float), f2 wide (long/double)
    val stage1 = fresh()
    Seq((1, 1.5f), (2, 2.5f)).toDF("id", "x").coalesce(1)
      .write.parquet(stage1)
    val p1 = fs.listStatus(new Path(stage1)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new Path(t))
    fs.rename(p1, new Path(t, "f1.parquet")) shouldBe true
    val stage2 = fresh()
    Seq((5000000000L, 3.5d)).toDF("id", "x").coalesce(1)
      .write.parquet(stage2)
    val p2 = fs.listStatus(new Path(stage2)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.rename(p2, new Path(t, "f2.parquet")) shouldBe true
    val wideSchema =
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":{}},
        |{"name":"x","type":"double","nullable":true,"metadata":{}}
        |]}""".stripMargin.replace("\n", "")
    writeText(t, "_delta_log/00000000000000000000.json",
      s"""{"commitInfo":{"timestamp":1,"operation":"WRITE"}}
         |{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}
         |{"metaData":{"id":"tw","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(wideSchema)
      },"partitionColumns":[],"configuration":{},"createdTime":1}}
         |{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
         |{"add":{"path":"f2.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
         |""".stripMargin)
    val got = DeltaInterop.read(spark, t)
    got.schema("id").dataType shouldBe
      org.apache.spark.sql.types.LongType
    got.count() shouldBe 3L
    got.select($"id").as[Long].collect().sorted shouldBe
      Array(1L, 2L, 5000000000L)
    got.filter($"id" === 1L)
      .select($"x").as[Double].head() shouldBe 1.5d
    // an UNKNOWN feature still refuses by name
    writeText(t, "_delta_log/00000000000000000001.json",
      """{"commitInfo":{"timestamp":2,"operation":"WRITE"}}
        |{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["weirdFutureThing"],"writerFeatures":[]}}
        |""".stripMargin)
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.read(spark, t).count()
    }.getMessage should include("weirdFutureThing")
  }

  test("pre-manifest-list layout: a snapshot carrying an inline " +
    "`manifests` array (no manifest-list file) serves reads") {
    import org.apache.avro.file.DataFileStream
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(Seq(1L, 2L, 3L).toDF("id"), t)
    val metaDir = new Path(t, "metadata")
    val fs = metaDir.getFileSystem(spark.sessionState.newHadoopConf())
    val metaPath = new Path(metaDir, "v1.metadata.json")
    val text = {
      val in = fs.open(metaPath)
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        new String(out.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
    }
    // pull the manifest paths out of the list file, then rewrite the
    // snapshot to the ancient inline-manifests shape
    val ListRe = """"manifest-list":"([^"]+)"""".r
    val listPath = ListRe.findFirstMatchIn(text).get.group(1)
    val manifests = {
      val in = fs.open(new Path(listPath))
      try {
        val stream = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        try {
          val b = Seq.newBuilder[String]
          while (stream.hasNext) b += stream.next()
            .get("manifest_path").toString
          b.result()
        } finally stream.close()
      } finally in.close()
    }
    manifests should not be empty
    val spliced = ListRe.replaceFirstIn(text,
      "\"manifests\":[" +
        manifests.map(m => "\"" + m + "\"").mkString(",") + "]")
    val out = fs.create(metaPath, true)
    try out.write(spliced.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val got = IcebergInterop.read(spark, t)
    got.count() shouldBe 3L
    got.as[Long].collect().sorted shouldBe Array(1L, 2L, 3L)
  }
}
