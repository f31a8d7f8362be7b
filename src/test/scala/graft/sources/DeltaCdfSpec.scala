package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the Delta CHANGE DATA FEED surface: derived inserts/deletes
  * from add/remove actions, cdc actions as the authoritative source
  * when present (the protocol's rule for partial-file changes),
  * dataChange=false maintenance commits emitting nothing, the
  * disabled-range and schema-change refusals, and the table's stable
  * metaData id across republishing commits. */
class DeltaCdfSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-delta-cdf").toString + "/t"

  private def writeText(table: String, rel: String, text: String): Unit = {
    val p = new Path(table, rel)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  test("derived feed: appends are inserts, overwrite is delete-all + " +
    "insert; the enabling commit and pre-range versions stay out") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 40L).map(i => (i, s"a$i")).toDF("id", "p"), t)
    DeltaInterop.enableChangeDataFeed(spark, t) shouldBe 1L
    DeltaInterop.write((41L to 50L).map(i => (i, s"b$i")).toDF("id", "p"), t)
    DeltaInterop.write((100L to 104L).map(i => (i, s"c$i")).toDF("id", "p"),
      t, overwrite = true)
    val cf = DeltaInterop.changeFeed(spark, t, 1L, 3L).cache()
    cf.columns should contain allOf
      ("_change_type", "_commit_version", "_commit_timestamp")
    // v1 metadata-only: nothing; v2: 10 inserts; v3: 50 deletes + 5 inserts
    cf.filter($"_commit_version" === 1L).count() shouldBe 0L
    cf.filter($"_commit_version" === 2L &&
      $"_change_type" === "insert").count() shouldBe 10L
    cf.filter($"_commit_version" === 3L &&
      $"_change_type" === "delete").count() shouldBe 50L
    cf.filter($"_commit_version" === 3L &&
      $"_change_type" === "insert").count() shouldBe 5L
    // the deleted rows carry real values from the removed files
    cf.filter($"_change_type" === "delete").select($"id")
      .as[Long].collect().sorted shouldBe ((1L to 50L).toArray)
    cf.unpersist()
  }

  test("a data-changing commit before the feed was enabled refuses by " +
    "name; a range past the enable works") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 5L).map(i => (i, i * 2)).toDF("id", "v"), t)
    DeltaInterop.enableChangeDataFeed(spark, t)
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.changeFeed(spark, t, 0L, 1L).count()
    }.getMessage should include("not enabled")
    DeltaInterop.changeFeed(spark, t, 1L, 1L).count() shouldBe 0L
  }

  test("cdc actions are authoritative: a commit carrying them serves " +
    "ONLY the _change_data rows, not its add/remove derivation") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 10L).map(i => (i, s"x$i")).toDF("id", "p"), t)
    DeltaInterop.enableChangeDataFeed(spark, t)
    // hand-write an UPDATE-shaped commit: one cdc file with pre/post
    // images, plus the add/remove pair a real engine would also emit
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    def stageParquet(rel: String, df: org.apache.spark.sql.DataFrame): Long = {
      val stage = fresh()
      df.coalesce(1).write.parquet(stage)
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      val dest = new Path(t, rel)
      fs.mkdirs(dest.getParent)
      fs.rename(part, dest) shouldBe true
      fs.getFileStatus(dest).getLen
    }
    val cdcLen = stageParquet("_change_data/cdc-0.parquet",
      Seq((3L, "x3", "update_preimage"), (3L, "X3", "update_postimage"))
        .toDF("id", "p", "_change_type"))
    val addLen = stageParquet("rewritten-0.parquet",
      ((1L to 10L).filterNot(_ == 3L).map(i => (i, s"x$i")) :+ (3L, "X3"))
        .toDF("id", "p"))
    val priorFile = DeltaInterop.state(spark, t, None).files.head.path
    writeText(t, "_delta_log/00000000000000000002.json",
      s"""{"commitInfo":{"timestamp":1700000000000,"operation":"UPDATE"}}
         |{"cdc":{"path":"_change_data/cdc-0.parquet","partitionValues":{},"size":$cdcLen,"dataChange":false}}
         |{"add":{"path":"rewritten-0.parquet","partitionValues":{},"size":$addLen,"modificationTime":1700000000000,"dataChange":true}}
         |{"remove":{"path":"$priorFile","deletionTimestamp":1700000000000,"dataChange":true}}
         |""".stripMargin)
    val cf = DeltaInterop.changeFeed(spark, t, 2L, 2L)
    cf.count() shouldBe 2L
    cf.select($"_change_type").as[String].collect().sorted shouldBe
      Array("update_postimage", "update_preimage")
    cf.filter($"_change_type" === "update_postimage")
      .select($"p").as[String].head() shouldBe "X3"
    // and the post-update snapshot still reads normally
    DeltaInterop.read(spark, t).filter($"id" === 3L)
      .select($"p").as[String].head() shouldBe "X3"
  }

  test("dataChange=false maintenance commits emit nothing; a schema " +
    "change inside the range refuses by name") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 6L).map(i => (i, s"x$i")).toDF("id", "p"), t)
    DeltaInterop.enableChangeDataFeed(spark, t)
    // hand-written compaction: same content re-added, dataChange=false
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    val stage = fresh()
    (1L to 6L).map(i => (i, s"x$i")).toDF("id", "p")
      .coalesce(1).write.parquet(stage)
    val part = fs.listStatus(new Path(stage)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new Path(t, "compacted-0.parquet")) shouldBe true
    val priorFile = DeltaInterop.state(spark, t, None).files.head.path
    writeText(t, "_delta_log/00000000000000000002.json",
      s"""{"commitInfo":{"timestamp":1700000000000,"operation":"OPTIMIZE"}}
         |{"add":{"path":"compacted-0.parquet","partitionValues":{},"size":${
        fs.getFileStatus(new Path(t, "compacted-0.parquet")).getLen
      },"modificationTime":1700000000000,"dataChange":false}}
         |{"remove":{"path":"$priorFile","deletionTimestamp":1700000000000,"dataChange":false}}
         |""".stripMargin)
    DeltaInterop.changeFeed(spark, t, 2L, 2L).count() shouldBe 0L
    // schema change (overwrite with a new shape) inside the range
    DeltaInterop.write(Seq((1L, 2L)).toDF("id", "n"), t, overwrite = true)
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.changeFeed(spark, t, 2L, 3L).count()
    }.getMessage should include("schema")
  }

  test("metaData id and configuration survive a schema-changing " +
    "overwrite — the table keeps its identity for foreign clients") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 4L).map(i => (i, s"x$i")).toDF("id", "p"), t)
    DeltaInterop.enableChangeDataFeed(spark, t)
    val before = DeltaInterop.state(spark, t, None)
    before.metaId.isDefined shouldBe true
    DeltaInterop.write(Seq((1L, 2.5)).toDF("id", "score"), t,
      overwrite = true)
    val after = DeltaInterop.state(spark, t, None)
    after.metaId shouldBe before.metaId
    after.configuration.get("delta.enableChangeDataFeed") shouldBe
      Some("true")
  }

  test("a checkpoint preserves configuration, metaData id and the " +
    "recorded minWriterVersion — checkpoint + later DML keeps the " +
    "change feed exact") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 20L).map(i => (i, s"x$i")).toDF("id", "p"), t)
    DeltaInterop.enableChangeDataFeed(spark, t)
    val before = DeltaInterop.state(spark, t, None)
    before.minWriterVersion shouldBe 4
    DeltaInterop.checkpoint(spark, t) shouldBe 1L
    // DML after the checkpoint still emits cdc and the feed serves it
    DeltaInterop.delete(spark, t, $"id" <= 3).rowsAffected shouldBe 3L
    // drop the JSON commits the checkpoint covers, so the replay can
    // ONLY come from checkpoint rows — any dropped metadata shows
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    Seq(0L, 1L).foreach(v => fs.delete(
      new Path(t, f"_delta_log/$v%020d.json"), false))
    val after = DeltaInterop.state(spark, t, None)
    after.configuration.get("delta.enableChangeDataFeed") shouldBe
      Some("true")
    after.metaId shouldBe before.metaId
    // the checkpoint-only resolution at v1 keeps the recorded
    // minWriterVersion=4 — no protocol downgrade
    val atCk = DeltaInterop.state(spark, t, Some(1L))
    atCk.minWriterVersion shouldBe 4
    atCk.minReaderVersion shouldBe 1
    val cf = DeltaInterop.changeFeed(spark, t, 2L, 2L)
    cf.filter($"_change_type" === "delete").count() shouldBe 3L
  }

  test("a later commit may remove a file added by a dataChange=false " +
    "maintenance commit inside the feed range — the optimize stays " +
    "CDF-exact end-to-end") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 12L).map(i => (i, s"x$i")).toDF("id", "p").repartition(3), t)
    DeltaInterop.enableChangeDataFeed(spark, t)
    // v2: real OPTIMIZE (dataChange=false adds + removes)
    DeltaInterop.optimize(spark, t) shouldBe 2L
    // v3: overwrite — removes the COMPACTED file the optimize added
    DeltaInterop.write(
      (100L to 102L).map(i => (i, s"y$i")).toDF("id", "p"), t,
      overwrite = true)
    val cf = DeltaInterop.changeFeed(spark, t, 2L, 3L).cache()
    cf.filter($"_commit_version" === 2L).count() shouldBe 0L
    cf.filter($"_commit_version" === 3L &&
      $"_change_type" === "delete").count() shouldBe 12L
    cf.filter($"_commit_version" === 3L &&
      $"_change_type" === "insert").count() shouldBe 3L
    cf.unpersist()
  }

  test("protocol fidelity on foreign shapes: a (1,7) writer-features " +
    "table checkpoints VERBATIM and enables CDF without a reader " +
    "bump — readerFeatures never materialize below reader 3") {
    import spark.implicits._
    val t = fresh()
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    val stage = fresh()
    (1L to 6L).map(i => (i, s"x$i")).toDF("id", "p")
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
         |{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly"]}}
         |{"metaData":{"id":"wf","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(schemaJson)
      },"partitionColumns":[],"configuration":{},"createdTime":1}}
         |{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
         |""".stripMargin)
    // enableCDF: writer side gains changeDataFeed, reader side STAYS 1
    DeltaInterop.enableChangeDataFeed(spark, t) shouldBe 1L
    val st = DeltaInterop.state(spark, t, None)
    st.minReaderVersion shouldBe 1
    st.minWriterVersion shouldBe 7
    st.readerFeatures shouldBe Nil
    st.writerFeatures.sorted shouldBe Seq("appendOnly", "changeDataFeed")
    // checkpoint: the recorded protocol survives replay VERBATIM
    DeltaInterop.checkpoint(spark, t) shouldBe 1L
    DeltaInterop.delete(spark, t, $"id" === 1L) // v2 tail after the ck
    fs.delete(new Path(t, "_delta_log/00000000000000000000.json"), false)
    fs.delete(new Path(t, "_delta_log/00000000000000000001.json"), false)
    val atCk = DeltaInterop.state(spark, t, Some(1L))
    atCk.minReaderVersion shouldBe 1
    atCk.minWriterVersion shouldBe 7
    atCk.writerFeatures.sorted shouldBe Seq("appendOnly", "changeDataFeed")
  }

  test("legacy→(3,7) DV upgrade carries IMPLIED writer features: a " +
    "CDF-enabled legacy table's first vectored delete declares " +
    "changeDataFeed (and the v2 implieds) in writerFeatures") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 8L).map(i => (i, s"x$i")).toDF("id", "p"), t)
    // legacy writer: enableCDF bumps minWriterVersion to 4, no
    // feature lists yet
    DeltaInterop.enableChangeDataFeed(spark, t) shouldBe 1L
    val pre = DeltaInterop.state(spark, t, None)
    pre.minWriterVersion shouldBe 4
    pre.writerFeatures shouldBe Nil
    // first MOR delete converts the protocol to (3,7); the implied
    // legacy capabilities must survive the conversion or delta-spark
    // rejects a table whose CDF property requires an undeclared
    // feature
    DeltaInterop.delete(spark, t, $"id" === 2L).rowsAffected shouldBe 1L
    val st = DeltaInterop.state(spark, t, None)
    st.minReaderVersion shouldBe 3
    st.minWriterVersion shouldBe 7
    st.readerFeatures should contain("deletionVectors")
    st.writerFeatures should contain allOf
      ("changeDataFeed", "appendOnly", "invariants", "checkConstraints",
        "generatedColumns", "deletionVectors")
    // and the feed still serves the vectored delete row-level
    val feed = DeltaInterop.changeFeed(spark, t, 2L, 2L)
    feed.filter($"_change_type" === "delete").select($"id")
      .as[Long].collect() shouldBe Array(2L)

    // the implication table applies to LEGACY versions only: a table
    // ALREADY at writer 7 with explicit features must NOT gain
    // capabilities it never declared (foreign writers would have to
    // implement them)
    val t2 = fresh()
    val fs2 = new Path(t2).getFileSystem(spark.sessionState.newHadoopConf())
    val stage2 = fresh()
    (1L to 6L).map(i => (i, s"x$i")).toDF("id", "p")
      .coalesce(1).write.parquet(stage2)
    val part2 = fs2.listStatus(new Path(stage2)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs2.mkdirs(new Path(t2))
    fs2.rename(part2, new Path(t2, "f1.parquet")) shouldBe true
    val schemaJson2 =
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":{}},
        |{"name":"p","type":"string","nullable":true,"metadata":{}}
        |]}""".stripMargin.replace("\n", "")
    writeText(t2, "_delta_log/00000000000000000000.json",
      s"""{"commitInfo":{"timestamp":1,"operation":"WRITE"}}
         |{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz"],"writerFeatures":["timestampNtz"]}}
         |{"metaData":{"id":"wf7","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(schemaJson2)
      },"partitionColumns":[],"configuration":{},"createdTime":1}}
         |{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
         |""".stripMargin)
    DeltaInterop.delete(spark, t2, $"id" === 1L).rowsAffected shouldBe 1L
    val st2 = DeltaInterop.state(spark, t2, None)
    st2.writerFeatures.sorted shouldBe
      Seq("deletionVectors", "timestampNtz")
    st2.readerFeatures.sorted shouldBe
      Seq("deletionVectors", "timestampNtz")
  }

  test("RESTORE rolls the table configuration back to the target " +
    "version's, not only its schema") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 5L).map(i => (i, s"x$i")).toDF("id", "p"), t)
    DeltaInterop.enableChangeDataFeed(spark, t) shouldBe 1L
    DeltaInterop.state(spark, t, None).configuration
      .get("delta.enableChangeDataFeed") shouldBe Some("true")
    DeltaInterop.restore(spark, t, 0L) shouldBe 2L
    val st = DeltaInterop.state(spark, t, None)
    st.configuration.get("delta.enableChangeDataFeed") shouldBe None
    // and rolling FORWARD restores it again
    DeltaInterop.restore(spark, t, 1L) shouldBe 3L
    DeltaInterop.state(spark, t, None).configuration
      .get("delta.enableChangeDataFeed") shouldBe Some("true")
  }
}
