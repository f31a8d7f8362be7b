package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the Delta transaction-log interop against the OPEN FORMAT, not
  * against this module's own writer alone: the foreign-table test
  * hand-writes a `_delta_log` shaped exactly like delta-spark output
  * (commitInfo first, txn actions, URL-encoded paths, data files that
  * do NOT carry partition columns or live under hive dirs) and the
  * reader must serve it correctly from the log alone. */
class DeltaInteropSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-delta").toString + "/t"

  private def writeText(table: String, rel: String, text: String): Unit = {
    val p = new Path(table, rel)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  test("round-trip: write partitioned, read back exactly; appends land " +
    "as new versions; overwrite removes the old files but time travel " +
    "still reads them") {
    import spark.implicits._
    val t = fresh()
    val base = (1 to 100).map(i => (i.toLong, i % 4, s"p$i"))
      .toDF("id", "bucket", "payload")
    DeltaInterop.write(base, t, partitionBy = Seq("bucket")) shouldBe 0L
    val got = DeltaInterop.read(spark, t)
    got.schema.fieldNames shouldBe Array("id", "bucket", "payload")
    got.select($"id", $"bucket", $"payload").as[(Long, Int, String)]
      .collect().sorted shouldBe
      (1 to 100).map(i => (i.toLong, i % 4, s"p$i")).sorted
    // append
    DeltaInterop.write(
      Seq((101L, 1, "p101")).toDF("id", "bucket", "payload"), t,
      partitionBy = Seq("bucket")) shouldBe 1L
    DeltaInterop.read(spark, t).count() shouldBe 101L
    // overwrite: only the new rows remain at head...
    DeltaInterop.write(
      Seq((999L, 0, "fresh")).toDF("id", "bucket", "payload"), t,
      partitionBy = Seq("bucket"), overwrite = true) shouldBe 2L
    DeltaInterop.read(spark, t).select($"id").as[Long]
      .collect() shouldBe Array(999L)
    // ...but the log remembers: version 1 still serves 101 rows
    DeltaInterop.readVersion(spark, t, 1L).count() shouldBe 101L
    DeltaInterop.readVersion(spark, t, 0L).count() shouldBe 100L
  }

  test("foreign table: a hand-written delta-spark-shaped log is served " +
    "from the log alone — partition values from add actions (files " +
    "carry neither the column nor hive dirs), URL-encoded paths, txn " +
    "and commitInfo ignored, remove drops, time travel works") {
    import spark.implicits._
    val t = fresh()
    // data files: DATA schema only (no partition column), flat layout
    // with a URL-encodable name
    def dataFile(rel: String, rows: Seq[(Long, String)]): Long = {
      val stage = fresh()
      rows.toDF("id", "payload").coalesce(1).write.parquet(stage)
      val fs = new Path(stage).getFileSystem(
        spark.sessionState.newHadoopConf())
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      val dest = new Path(t, rel)
      fs.mkdirs(dest.getParent)
      fs.rename(part, dest) shouldBe true
      fs.getFileStatus(dest).getLen
    }
    val s1 = dataFile("part one.parquet", Seq((1L, "a"), (2L, "b")))
    val s2 = dataFile("part-2.parquet", Seq((3L, "c")))
    val s3 = dataFile("part-3.parquet", Seq((9L, "z")))
    val schemaJson = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, payload STRING, region INT").json
    // exactly the line shapes delta-spark emits (PROTOCOL.md)
    writeText(t, "_delta_log/00000000000000000000.json",
      s"""{"commitInfo":{"timestamp":1700000000000,"operation":"WRITE","operationParameters":{"mode":"ErrorIfExists"},"engineInfo":"Apache-Spark/3.5.0 Delta-Lake/3.1.0"}}
         |{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"11111111-2222-3333-4444-555555555555","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(schemaJson)
      },"partitionColumns":["region"],"configuration":{},"createdTime":1700000000000}}
         |{"txn":{"appId":"someStream","version":7,"lastUpdated":1700000000000}}
         |{"add":{"path":"part%20one.parquet","partitionValues":{"region":"10"},"size":$s1,"modificationTime":1700000000000,"dataChange":true}}
         |{"add":{"path":"part-2.parquet","partitionValues":{"region":"20"},"size":$s2,"modificationTime":1700000000000,"dataChange":true}}
         |""".stripMargin)
    writeText(t, "_delta_log/00000000000000000001.json",
      s"""{"commitInfo":{"timestamp":1700000100000,"operation":"MERGE","operationParameters":{}}}
         |{"remove":{"path":"part-2.parquet","deletionTimestamp":1700000100000,"dataChange":true,"extendedFileMetadata":true,"partitionValues":{"region":"20"},"size":$s2}}
         |{"add":{"path":"part-3.parquet","partitionValues":{"region":null},"size":$s3,"modificationTime":1700000100000,"dataChange":true}}
         |""".stripMargin)
    val head = DeltaInterop.read(spark, t)
    head.schema.fieldNames shouldBe Array("id", "payload", "region")
    head.select($"id", $"payload", $"region".cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)).orNull)).toSet shouldBe Set(
      (1L, "a", "10"), (2L, "b", "10"), (9L, "z", null))
    // typed partition column: region is INT from the schemaString
    head.schema("region").dataType.typeName shouldBe "integer"
    head.filter($"region" === 10).count() shouldBe 2L
    // version 0: the removed file is still live, the v1 add absent
    DeltaInterop.readVersion(spark, t, 0L)
      .select($"id").as[Long].collect().sorted shouldBe
      Array(1L, 2L, 3L)
  }

  test("checkpoint: the reader starts from the newest checkpoint at or " +
    "below the target and replays only the JSON tail — even with the " +
    "pre-checkpoint commits vacuumed away") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(Seq((1L, "a")).toDF("id", "payload"), t)
    DeltaInterop.write(Seq((2L, "b")).toDF("id", "payload"), t)
    DeltaInterop.checkpoint(spark, t) shouldBe 1L
    DeltaInterop.write(Seq((3L, "c")).toDF("id", "payload"), t)
    DeltaInterop.read(spark, t).select($"id").as[Long]
      .collect().sorted shouldBe Array(1L, 2L, 3L)
    // vacuum the compacted commits: state must come from the checkpoint
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(t, "_delta_log/00000000000000000000.json"), false)
    fs.delete(new Path(t, "_delta_log/00000000000000000001.json"), false)
    DeltaInterop.read(spark, t).select($"id").as[Long]
      .collect().sorted shouldBe Array(1L, 2L, 3L)
    // time travel BELOW the checkpoint still works when its json exists
    DeltaInterop.readVersion(spark, t, 2L).count() shouldBe 3L
  }

  test("unsupported protocol requirements fail by name, never a wrong " +
    "read: reader features, reader version > 1, deletion vectors, " +
    "column mapping") {
    import spark.implicits._
    def tableWith(extraActions: String): String = {
      val t = fresh()
      val stage = fresh()
      Seq((1L, "a")).toDF("id", "payload").coalesce(1).write.parquet(stage)
      val fs = new Path(stage).getFileSystem(
        spark.sessionState.newHadoopConf())
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      fs.mkdirs(new Path(t))
      fs.rename(part, new Path(t, "f1.parquet")) shouldBe true
      val schemaJson = org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, payload STRING").json
      writeText(t, "_delta_log/00000000000000000000.json",
        s"""$extraActions
           |{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":${
          DeltaJsonTestUtil.jstr(schemaJson)
        },"partitionColumns":[],"configuration":{},"createdTime":1}}
           |{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
           |""".stripMargin)
      t
    }
    // reader version 3 with ONLY deletionVectors is now a supported
    // surface — the (DV-less) table serves its row
    DeltaInterop.read(spark, tableWith(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}"""))
      .count() shouldBe 1L
    // an UNKNOWN reader feature still refuses by name (v2Checkpoint,
    // timestampNtz and typeWidening moved to the supported set)
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.read(spark, tableWith(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["variantType-preview"],"writerFeatures":["variantType-preview"]}}"""))
    }.getMessage should include("variantType-preview")
    // reader version 2 (column mapping) is served too: without
    // physicalName metadata the physical schema IS the logical one
    DeltaInterop.read(spark, tableWith(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""))
      .count() shouldBe 1L
    // version 4+ has no published semantics — refuse by name
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.read(spark, tableWith(
        """{"protocol":{"minReaderVersion":4,"minWriterVersion":7}}"""))
    }.getMessage should include("minReaderVersion=4")
    val schemaJson = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT").json
    // column mapping is now SERVED: a mapped table's data files carry
    // physical names, the read resolves them back to logical names
    import spark.implicits._
    val cmTable = fresh()
    val fsCm = new Path(cmTable).getFileSystem(
      spark.sessionState.newHadoopConf())
    val stage = fresh()
    Seq((1L, "a"), (2L, "b")).toDF("col-9f2", "col-a71")
      .coalesce(1).write.parquet(stage)
    val part = fsCm.listStatus(new Path(stage)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fsCm.mkdirs(new Path(cmTable))
    fsCm.rename(part, new Path(cmTable, "f1.parquet")) shouldBe true
    val mappedSchema =
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":
        |  {"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-9f2"}},
        |{"name":"payload","type":"string","nullable":true,"metadata":
        |  {"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-a71"}}
        |]}""".stripMargin.replace("\n", "")
    writeText(cmTable, "_delta_log/00000000000000000000.json",
      s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
         |{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(mappedSchema)
      },"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":1}}
         |{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
         |""".stripMargin)
    val got = DeltaInterop.read(spark, cmTable)
    got.schema.fieldNames shouldBe Array("id", "payload")
    got.select($"id", $"payload").as[(Long, String)]
      .collect().sorted shouldBe Array((1L, "a"), (2L, "b"))
    // a checkpoint on a mapped table preserves the mapping config —
    // the replay-from-checkpoint state must equal replay-from-JSON
    DeltaInterop.checkpoint(spark, cmTable) shouldBe 0L
    val ckSt = DeltaInterop.state(spark, cmTable, None)
    ckSt.columnMappingMode shouldBe "name"
    ckSt.metaId shouldBe Some("x")
  }

  test("write guards: append schema mismatch and partitioning changes " +
    "fail fast; a lost commit race raises by name and leaves the log " +
    "clean; null partition values round-trip") {
    import spark.implicits._
    val t = fresh()
    val withNull = Seq((1L, Some("x"), "a"), (2L, None, "b"))
      .toDF("id", "k", "payload")
    DeltaInterop.write(withNull, t, partitionBy = Seq("k"))
    val back = DeltaInterop.read(spark, t)
      .select($"id", $"k").as[(Long, Option[String])].collect().toMap
    back shouldBe Map(1L -> Some("x"), 2L -> None)
    intercept[IllegalArgumentException] {
      DeltaInterop.write(Seq((3L, "y")).toDF("id", "k"), t,
        partitionBy = Seq("k"))
    }.getMessage should include("does not match")
    intercept[IllegalArgumentException] {
      DeltaInterop.write(withNull, t)
    }.getMessage should include("cannot change partitioning")
    // a racing writer publishes the SAME version between this write's
    // version choice and its publication — deterministic via the seam
    DeltaInterop.commitRaceHook.set(() =>
      writeText(t, "_delta_log/00000000000000000001.json",
        """{"commitInfo":{"timestamp":1,"operation":"WRITE","operationParameters":{}}}""" + "\n"))
    intercept[DeltaInterop.ConcurrentDeltaCommitException] {
      DeltaInterop.write(withNull, t, partitionBy = Seq("k"),
        overwrite = true)
    }
    // the loser's commit never landed: head is still the racer's 1
    DeltaInterop.state(spark, t, None).version shouldBe 1L
  }
}

class DeltaConversionSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-convert").toString + "/t"

  private def parquetCount(table: String): Int = {
    val p = new Path(table)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet") &&
        !f.getPath.toString.contains("_delta_log") &&
        !f.getPath.toString.contains("_graft_manifest")) n += 1
    }
    n
  }

  test("manifest → Delta export is metadata-only and stays in sync: " +
    "the mirror serves the same rows over the SAME files, and a " +
    "re-export after manifest commits diffs instead of rewriting") {
    import spark.implicits._
    val t = fresh()
    ManifestLake.write(
      (1 to 40).map(i => (i.toLong, i % 3, s"p$i")).toDF("id", "k", "payload"),
      t, partitionBy = Seq("k"))
    val before = parquetCount(t)
    DeltaInterop.exportFromManifest(spark, t) shouldBe 0L
    parquetCount(t) shouldBe before // zero data movement
    val viaDelta = DeltaInterop.read(spark, t)
      .select($"id", $"k", $"payload").as[(Long, Int, String)]
      .collect().sorted
    viaDelta shouldBe ManifestLake.read(spark, t)
      .select($"id", $"k", $"payload").as[(Long, Int, String)]
      .collect().sorted
    // the mirror references the manifest's own files verbatim
    val deltaPaths = DeltaInterop.state(spark, t, None).files.map(_.path).toSet
    val manifestPaths = ManifestLake.snapshot(spark, t).files.toSet
    deltaPaths shouldBe manifestPaths
    // manifest evolves (append + delete), the re-export diffs
    ManifestLake.write(
      Seq((99L, 0, "new")).toDF("id", "k", "payload"), t,
      partitionBy = Seq("k"))
    ManifestLake.delete(spark, t, col("id") <= 5L)
    DeltaInterop.exportFromManifest(spark, t) shouldBe 1L
    DeltaInterop.read(spark, t).select($"id").as[Long].collect().sorted shouldBe
      ManifestLake.read(spark, t).select($"id").as[Long].collect().sorted
  }

  test("export refuses deletion-vector files by name; after REORG " +
    "PURGE it succeeds") {
    import spark.implicits._
    val t = fresh()
    ManifestLake.write(
      (1 to 30).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), t,
      statsCol = Some("id"))
    ManifestLake.deleteMor(spark, t, col("id") % 7 === 0)
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.exportFromManifest(spark, t)
    }.getMessage should include("PURGE")
    ManifestLake.purgeDv(spark, t)
    DeltaInterop.exportFromManifest(spark, t)
    DeltaInterop.read(spark, t).count() shouldBe 26L
  }

  test("Delta → manifest import registers the live files in place and " +
    "the native surface (stats DML) applies without a rewrite; a " +
    "layout that disagrees with the log refuses by name") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1 to 50).map(i => (i.toLong, i % 2, s"p$i")).toDF("id", "k", "payload"),
      t, partitionBy = Seq("k"))
    val before = parquetCount(t)
    DeltaInterop.importToManifest(spark, t) shouldBe 1L
    parquetCount(t) shouldBe before
    ManifestLake.read(spark, t).count() shouldBe 50L
    ManifestLake.read(spark, t).schema.fieldNames.toSet shouldBe
      Set("id", "k", "payload")
    // native DML now applies to the imported table
    ManifestLake.delete(spark, t, col("id") === 7L)
    ManifestLake.read(spark, t).count() shouldBe 49L
    // a foreign table whose files are NOT hive-laid-out refuses
    val flat = fresh()
    val stage = fresh()
    Seq((1L, "a")).toDF("id", "payload").coalesce(1).write.parquet(stage)
    val fs = new Path(stage).getFileSystem(spark.sessionState.newHadoopConf())
    val part = fs.listStatus(new Path(stage)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new Path(flat))
    fs.rename(part, new Path(flat, "f1.parquet")) shouldBe true
    val schemaJson = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, payload STRING, region INT").json
    val logLine =
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(schemaJson)
      },"partitionColumns":["region"],"configuration":{},"createdTime":1}}
         |{"add":{"path":"f1.parquet","partitionValues":{"region":"10"},"size":1,"modificationTime":1,"dataChange":true}}
         |""".stripMargin
    val lp = new Path(flat, "_delta_log/00000000000000000000.json")
    fs.mkdirs(lp.getParent)
    val out = fs.create(lp, true)
    try out.write(logLine.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    intercept[IllegalArgumentException] {
      DeltaInterop.importToManifest(spark, flat)
    }.getMessage should include("re-layout")
  }

  test("vacuum keeps the newest versions readable, drops the rest by " +
    "name, deletes only their exclusive files — and refuses a " +
    "manifest-owned mirror") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-delta-vac")
      .toString + "/t"
    DeltaInterop.write(
      (1 to 40).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), t)
    DeltaInterop.write(
      (100 to 120).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), t,
      overwrite = true)
    DeltaInterop.write(Seq((121L, "x")).toDF("id", "payload"), t)
    val before = parquetCount(t)
    val deleted = DeltaInterop.vacuum(spark, t, keepLast = 2)
    deleted should be > 0 // version 0's overwritten files died
    parquetCount(t) shouldBe (before - deleted)
    DeltaInterop.read(spark, t).count() shouldBe 22L
    DeltaInterop.readVersion(spark, t, 1L).count() shouldBe 21L
    intercept[IllegalArgumentException] {
      DeltaInterop.readVersion(spark, t, 0L).collect()
    }
    // nothing more to collect at the same retention
    DeltaInterop.vacuum(spark, t, keepLast = 2) shouldBe 0
    // _last_checkpoint names a SURVIVING checkpoint (external readers
    // resolve through the hint; pointing at a deleted file strands them)
    val lcPath = new Path(t, "_delta_log/_last_checkpoint")
    val lfs = lcPath.getFileSystem(spark.sessionState.newHadoopConf())
    val lcIn = lfs.open(lcPath)
    val lcText = try scala.io.Source.fromInputStream(lcIn).mkString
      finally lcIn.close()
    val lcV = """"version":(\d+)""".r.findFirstMatchIn(lcText)
      .get.group(1).toLong
    lfs.exists(new Path(t,
      f"_delta_log/$lcV%020d.checkpoint.parquet")) shouldBe true
    // an exported manifest mirror refuses: the manifest owns the files
    val m = java.nio.file.Files.createTempDirectory("graft-delta-vac-m")
      .toString + "/t"
    ManifestLake.write(
      (1 to 20).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), m)
    DeltaInterop.exportFromManifest(spark, m)
    intercept[IllegalArgumentException] {
      DeltaInterop.vacuum(spark, m)
    }.getMessage should include("manifest")
  }
}

class DeltaSqlSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("graft_delta SQL: reads resolve to the native parquet scan with " +
    "pushdown, VERSION AS OF works, TIMESTAMP AS OF and unknown names " +
    "fail clearly") {
    import spark.implicits._
    val t = java.nio.file.Files
      .createTempDirectory("graft-deltasql").toString + "/t"
    DeltaInterop.write(
      (1 to 60).map(i => (i.toLong, i % 3, s"p$i")).toDF("id", "k", "payload"),
      t, partitionBy = Seq("k"))
    DeltaInterop.write(
      Seq((61L, 1, "p61")).toDF("id", "k", "payload"), t,
      partitionBy = Seq("k"))
    DeltaSql.register("sqlspec", t)
    spark.sql("SELECT count(*) AS n FROM graft_delta.sqlspec")
      .as[Long].head() shouldBe 61L
    spark.sql(
      "SELECT count(*) AS n FROM graft_delta.sqlspec VERSION AS OF 0")
      .as[Long].head() shouldBe 60L
    // the rewrite lands on the native scan and the filter pushes down
    val plan = spark.sql(
      "SELECT id FROM graft_delta.sqlspec WHERE id > 50")
      .queryExecution.executedPlan.toString
    plan should include("FileScan parquet")
    plan should include("PushedFilters: [IsNotNull(id), GreaterThan(id,50)")
    spark.sql("SELECT id FROM graft_delta.sqlspec WHERE id > 50")
      .as[Long].collect().sorted shouldBe (51L to 61L).toArray
    // TIMESTAMP AS OF is served (versionAt) — an instant before the
    // first retained commit refuses by name, a current one resolves
    intercept[IllegalArgumentException] {
      spark.sql("SELECT * FROM graft_delta.sqlspec TIMESTAMP AS OF " +
        "'2001-01-01'").collect()
    }.getMessage should include("before the first")
    // SQL must resolve the same version the API resolves for the
    // same instant (raw max can land mid-adjustment when two commits
    // share a millisecond, so derive the expectation from versionAt)
    val lastTs = DeltaInterop.history(spark, t)
      .agg(org.apache.spark.sql.functions.max("timestamp_ms"))
      .head().getLong(0)
    val iso = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(lastTs))
    spark.sql("SELECT count(*) AS n FROM graft_delta.sqlspec " +
      s"TIMESTAMP AS OF '$iso'").as[Long].head() shouldBe
      DeltaInterop.readVersion(spark, t,
        DeltaInterop.versionAt(spark, t, lastTs)).count()
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_delta.nope").collect()
    }.getMessage.toLowerCase should include("not")
  }
}

private object DeltaJsonTestUtil {
  def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    } + "\""
}
