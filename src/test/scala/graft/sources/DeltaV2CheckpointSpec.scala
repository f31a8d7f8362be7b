package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** V2 CHECKPOINT reads (`checkpointPolicy = v2`, what newer Delta
  * writers emit): a `<v>.checkpoint.<uuid>.{json|parquet}` top-level
  * file whose add/remove rows may live in SIDECAR parquet files under
  * `_delta_log/_sidecars/`. Both shapes are hand-written here the way
  * a foreign writer lays them down; the reader must resolve state
  * from the checkpoint alone (covered JSON commits deleted) and then
  * replay the JSON tail on top. */
class DeltaV2CheckpointSpec extends AnyFunSuite with Matchers
  with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-delta-v2ck")
      .toString + "/t"

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
      |{"name":"id","type":"long","nullable":true,"metadata":{}},
      |{"name":"p","type":"string","nullable":true,"metadata":{}}
      |]}""".stripMargin.replace("\n", "")

  /** Build a two-file table body and return (table, fs). The data
    * files land as f1.parquet (ids 1-10) and f2.parquet (ids 11-20). */
  private def tableBody(): (String, org.apache.hadoop.fs.FileSystem) = {
    import spark.implicits._
    val t = fresh()
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    Seq(("f1.parquet", 1L to 10L), ("f2.parquet", 11L to 20L)).foreach {
      case (name, ids) =>
        val stage = fresh()
        ids.map(i => (i, s"p$i")).toDF("id", "p")
          .coalesce(1).write.parquet(stage)
        val part = fs.listStatus(new Path(stage)).map(_.getPath)
          .find(_.getName.endsWith(".parquet")).get
        fs.mkdirs(new Path(t))
        fs.rename(part, new Path(t, name)) shouldBe true
    }
    (t, fs)
  }

  /** One sidecar parquet under _delta_log/_sidecars holding the two
    * add rows, written through the same case-class rows the reader
    * parses. */
  private def writeSidecar(t: String,
      fs: org.apache.hadoop.fs.FileSystem): String = {
    import spark.implicits._
    val rows = Seq(
      DeltaInterop.CkRow(None, None, Some(DeltaInterop.CkAdd(
        "f1.parquet", Map.empty, 1L, 1L, dataChange = true))),
      DeltaInterop.CkRow(None, None, Some(DeltaInterop.CkAdd(
        "f2.parquet", Map.empty, 1L, 1L, dataChange = true))))
    val stage = fresh()
    rows.toDF().coalesce(1).write.parquet(stage)
    val part = fs.listStatus(new Path(stage)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val name = "sc-001.parquet"
    fs.mkdirs(new Path(t, "_delta_log/_sidecars"))
    fs.rename(part, new Path(t, s"_delta_log/_sidecars/$name")) shouldBe true
    name
  }

  test("JSON v2 checkpoint + sidecar: state resolves from the " +
    "checkpoint alone, the JSON tail replays on top, time travel to " +
    "the checkpoint version works") {
    import spark.implicits._
    val (t, fs) = tableBody()
    val sidecar = writeSidecar(t, fs)
    // hand-written v2 checkpoint at version 1 (as if commits 0-1 were
    // cleaned): protocol + metaData inline, adds via the sidecar
    // a real checkpointPolicy=v2 table declares the v2Checkpoint
    // reader feature — the reader must accept it by name
    writeText(t, "_delta_log/00000000000000000001.checkpoint.abc-123.json",
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}
         |{"metaData":{"id":"v2ck","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(schemaJson)
      },"partitionColumns":[],"configuration":{"k":"v"},"createdTime":1}}
         |{"checkpointMetadata":{"version":1}}
         |{"sidecar":{"path":"$sidecar","sizeInBytes":1}}
         |""".stripMargin)
    // the JSON tail: version 2 removes f1
    writeText(t, "_delta_log/00000000000000000002.json",
      """{"commitInfo":{"timestamp":1700000000000,"operation":"DELETE"}}
        |{"remove":{"path":"f1.parquet","deletionTimestamp":1700000000000,"dataChange":true}}
        |""".stripMargin)
    val st = DeltaInterop.state(spark, t, None)
    st.version shouldBe 2L
    st.readerFeatures shouldBe Seq("v2Checkpoint")
    st.metaId shouldBe Some("v2ck")
    st.configuration.get("k") shouldBe Some("v")
    st.files.map(_.path) shouldBe Seq("f2.parquet")
    DeltaInterop.read(spark, t).select($"id").as[Long]
      .collect().sorted shouldBe (11L to 20L).toArray
    // time travel TO the checkpoint version serves both files
    DeltaInterop.readVersion(spark, t, 1L).count() shouldBe 20L
  }

  test("parquet v2 checkpoint with a sidecar column resolves the " +
    "same; a nested sidecar refuses by name") {
    import spark.implicits._
    val (t, fs) = tableBody()
    val sidecar = writeSidecar(t, fs)
    // top-level parquet checkpoint: protocol + metaData rows and one
    // sidecar row (the sidecar struct column is the v2 addition)
    val rows = Seq(
      V2CkRow(Some(DeltaInterop.CkProtocol(1, 2)), None, None, None),
      V2CkRow(None, Some(DeltaInterop.CkMeta("v2ckp",
        DeltaInterop.CkFormat("parquet", Map.empty), schemaJson,
        Nil, Map("k2" -> "v2"), 1L)), None, None),
      V2CkRow(None, None, None, Some(V2Sidecar(sidecar, 1L))))
    val stage = fresh()
    rows.toDF().coalesce(1).write.parquet(stage)
    val part = fs.listStatus(new Path(stage)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new Path(t,
      "_delta_log/00000000000000000001.checkpoint.u-42.parquet")) shouldBe
      true
    writeText(t, "_delta_log/00000000000000000002.json",
      """{"commitInfo":{"timestamp":1700000000001,"operation":"WRITE"}}
        |""".stripMargin)
    val st = DeltaInterop.state(spark, t, None)
    st.metaId shouldBe Some("v2ckp")
    st.configuration.get("k2") shouldBe Some("v2")
    st.files.map(_.path).sorted shouldBe Seq("f1.parquet", "f2.parquet")
    DeltaInterop.read(spark, t).count() shouldBe 20L
  }

  test("a v2 checkpoint without sidecars (adds inline) also serves; " +
    "vacuum deletes dropped-version v2 checkpoint files") {
    import spark.implicits._
    val (t, _) = tableBody()
    writeText(t, "_delta_log/00000000000000000001.checkpoint.solo.json",
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"solo","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(schemaJson)
      },"partitionColumns":[],"configuration":{},"createdTime":1}}
         |{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
         |{"add":{"path":"f2.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
         |""".stripMargin)
    // checkpoints complement commits: the JSON at the checkpoint
    // version still exists until log cleanup drops it
    writeText(t, "_delta_log/00000000000000000001.json",
      s"""{"commitInfo":{"timestamp":1700000000001,"operation":"WRITE"}}
         |{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"solo","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(schemaJson)
      },"partitionColumns":[],"configuration":{},"createdTime":1}}
         |{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
         |{"add":{"path":"f2.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
         |""".stripMargin)
    writeText(t, "_delta_log/00000000000000000002.json",
      """{"commitInfo":{"timestamp":1700000000002,"operation":"WRITE"}}
        |""".stripMargin)
    DeltaInterop.read(spark, t).count() shouldBe 20L
    // two more commits, then vacuum keepLast=2: version 1-2 drop and
    // the v2 checkpoint file goes with them
    DeltaInterop.write(Seq((21L, "x")).toDF("id", "p"), t)
    DeltaInterop.write(Seq((22L, "y")).toDF("id", "p"), t)
    DeltaInterop.vacuum(spark, t, keepLast = 2)
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(new Path(t,
      "_delta_log/00000000000000000001.checkpoint.solo.json")) shouldBe false
    DeltaInterop.read(spark, t).count() shouldBe 22L
  }

  test("NATIVE v2 checkpoint WRITE (r14): enableV2Checkpoints " +
    "upgrades the protocol on both sides, checkpoint() emits the " +
    "sidecar-bearing form, the own reader resolves from it after log " +
    "cleanup, and txn high-water marks survive") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 40L).map(i => (i, s"p${i % 4}")).toDF("id", "p")
        .repartition(4), t)
    DeltaInterop.appendTxnBatch(
      Seq((41L, "x")).toDF("id", "p"), 3L, t, Nil, "appV2") shouldBe true
    DeltaInterop.enableV2Checkpoints(spark, t)
    val st = DeltaInterop.state(spark, t, None)
    st.minReaderVersion shouldBe 3
    st.readerFeatures should contain("v2Checkpoint")
    st.writerFeatures should contain("v2Checkpoint")
    st.configuration("delta.checkpointPolicy") shouldBe "v2"
    // force several sidecars with a tiny per-sidecar bound
    val logDir = new Path(t, "_delta_log")
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    DeltaInterop.checkpointV2(spark, fs, logDir, st, None,
      rowsPerSidecar = 2) shouldBe st.version
    val names = fs.listStatus(logDir).map(_.getPath.getName)
    names.count(_.matches(
      f"${st.version}%020d\\.checkpoint\\.[A-Za-z0-9-]+\\.parquet")) shouldBe 1
    fs.listStatus(new Path(logDir, "_sidecars"))
      .count(_.getPath.getName.endsWith(".parquet")) should be >= 2
    // drop the whole JSON tail below the checkpoint: state resolves
    // from the v2 checkpoint + sidecars alone
    DeltaInterop.vacuum(spark, t, keepLast = 1)
    DeltaInterop.read(spark, t).count() shouldBe 41L
    DeltaInterop.lastTxnVersion(spark, t, "appV2") shouldBe 3L
    DeltaInterop.appendTxnBatch(
      Seq((41L, "x")).toDF("id", "p"), 3L, t, Nil, "appV2") shouldBe false
    // the POLICY routes checkpoint() itself to the v2 form for later
    // versions
    DeltaInterop.write(Seq((42L, "y")).toDF("id", "p"), t)
    DeltaInterop.checkpoint(spark, t)
    val head = DeltaInterop.state(spark, t, None).version
    fs.listStatus(logDir).map(_.getPath.getName).count(_.matches(
      f"$head%020d\\.checkpoint\\.[A-Za-z0-9-]+\\.parquet")) shouldBe 1
    DeltaInterop.read(spark, t).count() shouldBe 42L
  }
}

/** v2 checkpoint parquet rows: the classic action structs plus the
  * `sidecar` column. Test-local — the engine only READS this shape. */
private final case class V2Sidecar(path: String, sizeInBytes: Long)
private final case class V2CkRow(protocol: Option[DeltaInterop.CkProtocol],
                                 metaData: Option[DeltaInterop.CkMeta],
                                 add: Option[DeltaInterop.CkAdd],
                                 sidecar: Option[V2Sidecar])
