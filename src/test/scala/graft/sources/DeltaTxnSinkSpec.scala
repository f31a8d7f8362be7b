package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the EXACTLY-ONCE Delta streaming sink — the protocol's `txn`
  * action as replay guard: every sink commit stamps
  * `(appId, batchId)`, [[DeltaInterop.lastTxnVersion]] reads the
  * high-water mark back from log replay, a crash-replayed epoch
  * commits NOTHING twice, the mark survives checkpoints + log
  * cleanup (txn rows are preserved in graft checkpoints), and
  * foreign delta-spark-shaped txn actions are honored identically.
  * End-to-end: [[DeltaInterop.streamToDelta]] (append) and
  * [[DeltaInterop.streamUpsertToDelta]] (merge) over a file source
  * with AvailableNow drains sharing one engine checkpoint. */
class DeltaTxnSinkSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-txn").toString + "/t"

  test("appendTxnBatch commits each epoch exactly once: replayed " +
    "epochs are detected via the txn high-water mark and commit " +
    "nothing; the mark survives checkpoint + log cleanup") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.lastTxnVersion(spark, t, "app1") shouldBe -1L
    DeltaInterop.appendTxnBatch(
      Seq((1L, "a")).toDF("id", "s"), 0L, t, Nil, "app1") shouldBe true
    DeltaInterop.appendTxnBatch(
      Seq((2L, "b")).toDF("id", "s"), 1L, t, Nil, "app1") shouldBe true
    DeltaInterop.lastTxnVersion(spark, t, "app1") shouldBe 1L
    DeltaInterop.lastTxnVersion(spark, t, "other") shouldBe -1L
    val v = DeltaInterop.state(spark, t, None).version
    // crash-replay of epoch 1: nothing commits
    DeltaInterop.appendTxnBatch(
      Seq((2L, "b")).toDF("id", "s"), 1L, t, Nil, "app1") shouldBe false
    DeltaInterop.state(spark, t, None).version shouldBe v
    DeltaInterop.read(spark, t).count() shouldBe 2L
    // a second app's epochs are independent
    DeltaInterop.appendTxnBatch(
      Seq((3L, "c")).toDF("id", "s"), 0L, t, Nil, "app2") shouldBe true
    DeltaInterop.read(spark, t).count() shouldBe 3L
    // checkpoint + drop the JSON tail below it: the mark survives
    DeltaInterop.checkpoint(spark, t)
    DeltaInterop.vacuum(spark, t, keepLast = 1)
    DeltaInterop.lastTxnVersion(spark, t, "app1") shouldBe 1L
    DeltaInterop.lastTxnVersion(spark, t, "app2") shouldBe 0L
    DeltaInterop.appendTxnBatch(
      Seq((2L, "b")).toDF("id", "s"), 1L, t, Nil, "app1") shouldBe false
    DeltaInterop.appendTxnBatch(
      Seq((4L, "d")).toDF("id", "s"), 2L, t, Nil, "app1") shouldBe true
    DeltaInterop.read(spark, t).count() shouldBe 4L
  }

  test("foreign delta-spark-shaped txn actions are honored: a " +
    "hand-written commit's (appId, version) guards graft epochs") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(Seq((1L, "a")).toDF("id", "s"), t)
    val logDir = new Path(t, "_delta_log")
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new Path(logDir, f"${1L}%020d.json"), false)
    try out.write(
      ("""{"commitInfo":{"timestamp":0,"operation":"STREAMING UPDATE"}}""" +
        "\n" +
        """{"txn":{"appId":"foreign-query-7","version":41,""" +
        """"lastUpdated":0}}""" + "\n")
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    DeltaInterop.lastTxnVersion(spark, t, "foreign-query-7") shouldBe 41L
    DeltaInterop.appendTxnBatch(Seq((2L, "b")).toDF("id", "s"),
      41L, t, Nil, "foreign-query-7") shouldBe false
    DeltaInterop.appendTxnBatch(Seq((2L, "b")).toDF("id", "s"),
      42L, t, Nil, "foreign-query-7") shouldBe true
    DeltaInterop.read(spark, t).count() shouldBe 2L
  }

  test("streamToDelta: two AvailableNow drains over one checkpoint " +
    "append exactly the new files; a replayed epoch after restart " +
    "commits nothing") {
    import spark.implicits._
    val t = fresh()
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-txn-src").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-txn-ck").toString
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v").write.parquet(s"$srcDir/b0")
    def drain(): Unit = DeltaInterop.streamToDelta(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, v BIGINT"))
        .parquet(s"$srcDir/*"),
      t, ckpt).awaitTermination()
    drain()
    DeltaInterop.read(spark, t).count() shouldBe 2L
    Seq((3L, 30L)).toDF("id", "v").write.parquet(s"$srcDir/b1")
    drain()
    DeltaInterop.read(spark, t).count() shouldBe 3L
    // the sink's txn stamps carry the checkpoint path as appId
    DeltaInterop.lastTxnVersion(spark, t, ckpt) should be >= 1L
    // crash-replay of epoch 0 (engine checkpoint lost after the
    // Delta commit): detected, nothing commits
    val v = DeltaInterop.state(spark, t, None).version
    DeltaInterop.appendTxnBatch(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"),
      0L, t, Nil, ckpt) shouldBe false
    DeltaInterop.state(spark, t, None).version shouldBe v
    DeltaInterop.read(spark, t).count() shouldBe 3L
  }

  test("streamUpsertToDelta: keyed micro-batch upserts land exactly " +
    "once — updates rewrite touched files only, inserts append, and " +
    "a crash-replayed epoch is a no-op") {
    import spark.implicits._
    val t = fresh()
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-txn-upsrc").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-txn-upck").toString
    val initDir = java.nio.file.Files
      .createTempDirectory("graft-txn-upinit").toString
    (1L to 10L).map(i => (i, i * 10)).toDF("id", "v")
      .write.mode("overwrite").parquet(initDir)
    DeltaInterop.write(spark.read.parquet(initDir), t)
    Seq((3L, 333L), (11L, 110L)).toDF("id", "v")
      .write.parquet(s"$srcDir/b0")
    def drain(): Unit = DeltaInterop.streamUpsertToDelta(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, v BIGINT"))
        .parquet(s"$srcDir/*"),
      t, Seq("id"), ckpt).awaitTermination()
    drain()
    DeltaInterop.read(spark, t).count() shouldBe 11L
    DeltaInterop.read(spark, t).filter($"id" === 3L)
      .select($"v").as[Long].head() shouldBe 333L
    Seq((3L, 444L)).toDF("id", "v").write.parquet(s"$srcDir/b1")
    drain()
    DeltaInterop.read(spark, t).filter($"id" === 3L)
      .select($"v").as[Long].head() shouldBe 444L
    DeltaInterop.read(spark, t).count() shouldBe 11L
    // crash-replay of epoch 0 commits nothing
    val v = DeltaInterop.state(spark, t, None).version
    DeltaInterop.upsertTxnBatch(Seq((3L, 999L)).toDF("id", "v"),
      0L, t, Seq("id"), ckpt) shouldBe false
    DeltaInterop.state(spark, t, None).version shouldBe v
    DeltaInterop.read(spark, t).filter($"id" === 3L)
      .select($"v").as[Long].head() shouldBe 444L
  }
}
