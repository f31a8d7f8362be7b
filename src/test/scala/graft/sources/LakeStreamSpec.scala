package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins [[LakeStreamProvider]] — the lake as a streaming source:
  * versions arrive as micro-batches, a restarted query resumes from its
  * checkpointed version watermark without re-emitting, and rewrite
  * commits are refused unless opted into (the Delta-source contract). */
class LakeStreamSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(n: Range): DataFrame = {
    import spark.implicits._
    n.map(i => (i.toLong, s"payload_$i")).toDF("id", "payload")
  }

  /** Run the lake stream to completion (AvailableNow) through a
    * foreachBatch collector — a sink that SUPPORTS checkpoint recovery,
    * so a rerun with the same checkpoint dir genuinely resumes. Returns
    * the ids this run emitted. */
  private def runStream(table: String, checkpoint: String,
                        options: Map[String, String] = Map.empty): Set[Long] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-lake").options(options).load(table)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach(r => got.add(r.getLong(0))); ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    got.asScala.toSet
  }

  test("appended versions arrive as batches; restart resumes from the " +
    "checkpointed watermark without re-emitting") {
    val t = freshDir("graft-lstream") + "/t"
    val ck = freshDir("graft-lstream-ck")
    ManifestLake.write(rows(1 to 100), t)
    ManifestLake.write(rows(101 to 150), t)
    // first run: both committed versions stream
    runStream(t, ck) shouldBe (1L to 150L).toSet
    // no new commits: a resumed run emits nothing
    runStream(t, ck) shouldBe Set.empty
    // two more commits: ONLY they stream on resume — the engine restores
    // the version watermark from the checkpoint, not from the sink
    ManifestLake.write(rows(151 to 170), t)
    ManifestLake.write(rows(171 to 180), t)
    runStream(t, ck) shouldBe (151L to 180L).toSet
  }

  test("maintenance commits (compaction, bin-packing) are net-zero: the " +
    "stream skips them — no error, no re-emission — and later appends " +
    "still arrive; the change feed skips them too") {
    val t = freshDir("graft-lstream-mx") + "/t"
    val ck = freshDir("graft-lstream-mx-ck")
    ManifestLake.write(rows(1 to 100), t)
    runStream(t, ck) shouldBe (1L to 100L).toSet
    // maintenance between stream runs: plain compaction AND bin-packing
    (0 until 3).foreach(i =>
      ManifestLake.write(rows(200 + i * 10 to 200 + i * 10 + 9), t))
    ManifestLake.binPack(spark, t,
      targetFileBytes = 10L * 1024 * 1024, smallFileBytes = 100L * 1024)
    ManifestLake.compact(spark, t)
    // the three real appends arrive; the two maintenance versions are
    // silently skipped (without the marker they would throw or, with
    // ignoreChanges, re-emit all 130 rows)
    runStream(t, ck) shouldBe
      ((200L to 209L) ++ (210L to 219L) ++ (220L to 229L)).toSet
    ManifestLake.write(rows(300 to 305), t)
    runStream(t, ck) shouldBe (300L to 305L).toSet
    // the batch change feed across the maintenance versions agrees
    val head = ManifestLake.currentVersion(spark, t).get
    val feed = ManifestLake.changeFeed(spark, t, 1L, head)
      .select("_change_type", "id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    feed.map(_._1).toSet shouldBe Set("insert")
    feed.map(_._2).toSet shouldBe
      ((200L to 229L) ++ (300L to 305L)).toSet
  }

  test("a fresh checkpoint replays from earliest; startingVersion bounds " +
    "the replay; latest skips history") {
    val t = freshDir("graft-lstream") + "/t"
    ManifestLake.write(rows(1 to 10), t)
    ManifestLake.write(rows(11 to 20), t)
    ManifestLake.write(rows(21 to 30), t)
    runStream(t, freshDir("ck")) shouldBe (1L to 30L).toSet
    runStream(t, freshDir("ck"),
      Map("startingVersion" -> "2")) shouldBe (11L to 30L).toSet
    runStream(t, freshDir("ck"),
      Map("startingVersion" -> "latest")) shouldBe Set.empty
  }

  test("exactly-once into a lake sink: replaying the source versions " +
    "through writeBatch commits nothing twice") {
    val src = freshDir("graft-lstream") + "/src"
    val dst = freshDir("graft-lstream") + "/dst"
    val ck = freshDir("graft-lstream-ck")
    ManifestLake.write(rows(1 to 50), src)
    ManifestLake.write(rows(51 to 80), src)
    def pump(): Unit = {
      val q = spark.readStream.format("graft-lake").load(src)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          ManifestLake.writeBatch(batch, dst, id, appId = ck): Unit
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    pump()
    ManifestLake.read(spark, dst).count() shouldBe 80
    // a second pump with no new source commits must not duplicate —
    // and neither must a batch replay (writeBatch's epoch guard)
    pump()
    ManifestLake.read(spark, dst).count() shouldBe 80
    ManifestLake.write(rows(81 to 90), src)
    pump()
    ManifestLake.read(spark, dst).count() shouldBe 90
  }

  test("the source reports versionsBehind in streaming progress (the " +
    "consumer-lag metric)") {
    val t = freshDir("graft-lstream") + "/t"
    ManifestLake.write(rows(1 to 10), t)
    ManifestLake.write(rows(11 to 20), t)
    val q = spark.readStream.format("graft-lake").load(t)
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) => () }
      .option("checkpointLocation", freshDir("ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progress = q.recentProgress.filter(_.sources.nonEmpty)
    progress should not be empty
    // the final progress entry has drained everything: lag 0
    progress.last.sources.head.metrics
      .get("versionsBehind") shouldBe "0"
  }

  test("maxVersionsPerTrigger bounds a catch-up run into several " +
    "batches without losing or duplicating rows") {
    val t = freshDir("graft-lstream") + "/t"
    (0 until 5).foreach(i =>
      ManifestLake.write(rows(i * 10 + 1 to i * 10 + 10), t))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q = spark.readStream.format("graft-lake")
      .option("maxVersionsPerTrigger", "2").load(t)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ids = batch.collect().map(_.getLong(0))
        batchSizes.add(ids.length)
        ids.foreach(got.add); ()
      }
      .option("checkpointLocation", freshDir("ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    got.asScala.toSet shouldBe (1L to 50L).toSet
    got.asScala.size shouldBe 50 // no duplicates either
    // 5 versions at ≤2 per trigger: 3 data batches of 20/20/10 rows
    batchSizes.asScala.toSeq.filter(_ > 0).sorted shouldBe Seq(10, 20, 20)
  }

  test("a consumer lagging past vacuum retention fails with the named " +
    "error instead of silently skipping versions") {
    val t = freshDir("graft-lstream") + "/t"
    val ck = freshDir("graft-lstream-ck")
    ManifestLake.write(rows(1 to 10), t)
    runStream(t, ck) shouldBe (1L to 10L).toSet
    // three more versions, then drop retention to the last one — the
    // consumer's checkpointed position (v1) now points into the
    // vacuumed log range
    ManifestLake.write(rows(11 to 20), t)
    ManifestLake.write(rows(21 to 30), t)
    ManifestLake.write(rows(31 to 40), t)
    ManifestLake.vacuum(spark, t, keepLast = 1)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runStream(t, ck)
    }
    err.getMessage should include("vacuumed past an incremental consumer")
  }

  test("readChangeFeed streams row-level changes: appends as inserts, " +
    "recorded merge sidecars verbatim, resume without re-emission, and " +
    "unrecorded rewrites refused") {
    import spark.implicits._
    val t = freshDir("graft-lstream") + "/t"
    val ck = freshDir("graft-lstream-ck")
    ManifestLake.writeClustered(
      (1 to 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload"),
      t, "id", nFiles = 2)
    def runCdc(checkpoint: String): Set[(String, Long, Long)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
      val q = spark.readStream.format("graft-lake")
        .option("readChangeFeed", "true").load(t)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select("_change_type", "_commit_version", "id").collect()
            .foreach(r => got.add((r.getString(0), r.getLong(1),
              r.getLong(2)))); ()
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      got.asScala.toSet
    }
    // v1: the initial data streams as inserts
    runCdc(ck) shouldBe (1 to 100)
      .map(i => ("insert", 1L, i.toLong)).toSet
    // v2: a recorded merge streams its exact operation log on resume
    ManifestLake.merge(
      Seq((5L, "updated_5"), (500L, "new_500")).toDF("id", "payload"),
      t, Seq("id"), statsCol = Some("id"), recordChangeFeed = true)
    runCdc(ck) shouldBe Set(
      ("delete", 2L, 5L), ("insert", 2L, 5L), ("insert", 2L, 500L))
    // nothing new: nothing re-emits
    runCdc(ck) shouldBe Set.empty
    // an UNRECORDED rewrite cannot stream as changes
    ManifestLake.delete(spark, t,
      org.apache.spark.sql.functions.col("id") === 6L)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runCdc(ck)
    }.getMessage should include("without a recorded change feed")
  }

  test("rewrite commits are refused by default and opted into with " +
    "ignoreChanges") {
    val t = freshDir("graft-lstream") + "/t"
    // one file per version, so the delete's rewrite shape is fixed:
    // v2 removes the single v1 file and adds one survivors file
    ManifestLake.write(rows(1 to 20).coalesce(1), t)
    runStream(t, freshDir("ck")) shouldBe (1L to 20L).toSet
    ManifestLake.delete(spark, t,
      org.apache.spark.sql.functions.col("id") <= 5)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runStream(t, freshDir("ck"))
    }
    err.getMessage should include("not incrementally streamable")
    // ignoreChanges from the rewrite version on: the rewritten file's
    // surviving rows emit (at-least-once on rewrites, as documented)
    runStream(t, freshDir("ck"),
      Map("ignoreChanges" -> "true", "startingVersion" -> "2")) shouldBe
      (6L to 20L).toSet
    // an overwrite (base commit) likewise needs the opt-in
    ManifestLake.write(rows(100 to 110).coalesce(1), t, append = false)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runStream(t, freshDir("ck"))
    }.getMessage should include("not incrementally streamable")
    runStream(t, freshDir("ck"),
      Map("ignoreChanges" -> "true", "startingVersion" -> "3")) shouldBe
      (100L to 110L).toSet
  }

  test("an ignoreChanges re-emission of a deletion-vectored file serves " +
    "only its LIVE rows") {
    val t = freshDir("graft-lstream") + "/t"
    ManifestLake.write(rows(1 to 20).coalesce(1), t)
    // v2: MOR delete — same file re-added with a dv= annotation
    ManifestLake.deleteMor(spark, t,
      org.apache.spark.sql.functions.col("id") <= 5)
    // the batch covering ONLY the DV commit re-emits the file's live
    // rows — the deleted five never appear
    runStream(t, freshDir("ck"),
      Map("ignoreChanges" -> "true", "startingVersion" -> "2")) shouldBe
      (6L to 20L).toSet
  }
}
