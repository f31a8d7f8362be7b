package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.sources.ManifestLake

/** Pins the exactly-once contract of the ManifestLake streaming sink:
  * restarts resume from the checkpoint without reprocessing, and a
  * replayed micro-batch (same epoch re-executed after a crash) commits
  * nothing twice. */
class LakeStreamSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def writeBatchFile(dir: String, name: String, ids: Range): Unit = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ls-stage")
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
    java.nio.file.Files.copy(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(dir, name))
  }

  test("streaming into the lake is exactly-once across restarts") {
    import org.apache.spark.sql.types._
    val src = java.nio.file.Files.createTempDirectory("graft-ls-src").toString
    val table = java.nio.file.Files.createTempDirectory("graft-ls-t").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ls-ck").toString
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    def run(): Unit = {
      val q = Streaming.streamToLake(
        spark.readStream.schema(schema).parquet(src), table, ckpt)
      q.awaitTermination()
    }

    writeBatchFile(src, "b1.parquet", 1 to 100)
    run()
    ManifestLake.read(spark, table).count() shouldBe 100

    // restart with the same checkpoint and a new file: only the new file
    // is processed — the old one is not re-committed
    writeBatchFile(src, "b2.parquet", 101 to 150)
    run()
    val after = ManifestLake.read(spark, table)
    after.count() shouldBe 150
    after.select("id").distinct().count() shouldBe 150 // no duplicates

    // a third restart with nothing new commits nothing
    val vBefore = ManifestLake.currentVersion(spark, table)
    run()
    ManifestLake.currentVersion(spark, table) shouldBe vBefore
  }

  test("streaming ingest into a time-partitioned table: epochs land " +
    "under day partitions, the generation constraint gates them, and " +
    "ts-range reads prune to the streamed days") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, date_format}
    import spark.implicits._
    def ts(day: Int, h: Int) = java.sql.Timestamp.from(
      java.time.LocalDateTime.of(2024, 7, day, h, 0)
        .toInstant(java.time.ZoneOffset.UTC))
    val src = java.nio.file.Files.createTempDirectory("graft-tp-src").toString
    val table = java.nio.file.Files
      .createTempDirectory("graft-tp-t").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tp-ck").toString
    // batch bootstrap records the day generation (and its CHECK)
    ManifestLake.writeTimePartitioned(
      Seq((1L, ts(1, 8), "seed")).toDF("event_id", "ts", "tag"),
      table, "ts")
    def stage(name: String, rows: Seq[(Long, java.sql.Timestamp, String)])
        : Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-tp-stage")
      rows.toDF("event_id", "ts", "tag").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(src, name)): Unit
    }
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("tag", StringType)))
    def run(): Unit =
      Streaming.streamToLake(
        spark.readStream.schema(schema).parquet(src)
          .withColumn("p_day", date_format(col("ts"), "yyyy-MM-dd")),
        table, ckpt, partitionBy = Seq("p_day")).awaitTermination()
    stage("e0.parquet", Seq((2L, ts(2, 1), "a"), (3L, ts(3, 2), "b")))
    run()
    stage("e1.parquet", Seq((4L, ts(3, 9), "c"), (5L, ts(4, 5), "d")))
    run()
    // day partitions from BOTH the bootstrap and the stream epochs
    val snap = ManifestLake.snapshot(spark, table)
    snap.entries.flatMap(_.path.split('/').find(_.startsWith("p_day=")))
      .distinct.sorted shouldBe Seq("p_day=2024-07-01", "p_day=2024-07-02",
      "p_day=2024-07-03", "p_day=2024-07-04")
    // a ts-range read prunes to the matching streamed days
    val out = ManifestLake.readTsRange(spark, table, "ts", ts(3, 0), ts(4, 23))
    out.collect().map(_.getLong(0)).sorted shouldBe Array(3L, 4L, 5L)
    val scanned = out.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    scanned should not include "p_day=2024-07-01"
    // an epoch violating the recorded generation aborts and commits
    // nothing: the constraint gates STREAMING appends like batch ones
    val vBefore = ManifestLake.currentVersion(spark, table)
    stage("e2.parquet", Seq((6L, ts(5, 0), "bad")))
    val q = Streaming.streamToLake(
      spark.readStream.schema(schema).parquet(src)
        .withColumn("p_day",
          org.apache.spark.sql.functions.lit("1999-01-01")),
      table, java.nio.file.Files
        .createTempDirectory("graft-tp-ck2").toString,
      partitionBy = Seq("p_day"))
    val failed = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] { q.awaitTermination() }
    Iterator.iterate(failed: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("p_day_gen")))
      .shouldBe(true)
    ManifestLake.currentVersion(spark, table) shouldBe vBefore
  }

  test("a replayed micro-batch id is skipped, a fresh one commits") {
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("graft-ls-r").toString + "/t"
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    ManifestLake.writeBatch(batch, table, batchId = 0L) shouldBe true
    // crash-replay of epoch 0: skipped, nothing committed twice
    ManifestLake.writeBatch(batch, table, batchId = 0L) shouldBe false
    ManifestLake.read(spark, table).count() shouldBe 2
    ManifestLake.writeBatch(batch, table, batchId = 1L) shouldBe true
    ManifestLake.read(spark, table).count() shouldBe 4
    ManifestLake.snapshot(spark, table).batchId shouldBe Some(1L)
    // compaction carries the high-water mark forward: a replay of epoch 1
    // after a compaction still commits nothing
    ManifestLake.compact(spark, table)
    ManifestLake.snapshot(spark, table).batchId shouldBe Some(1L)
    ManifestLake.writeBatch(batch, table, batchId = 1L) shouldBe false
    ManifestLake.read(spark, table).count() shouldBe 4
  }

  test("a fresh checkpoint (new app identity) is not mistaken for a replay") {
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("graft-ls-a").toString + "/t"
    val batch = Seq((1L, "a")).toDF("id", "v")
    ManifestLake.writeBatch(batch, table, batchId = 5L,
      appId = "ckpt-A") shouldBe true
    // stream restarted with a NEW checkpoint renumbers epochs from 0 —
    // these are new data, not replays of ckpt-A's epochs
    ManifestLake.writeBatch(batch, table, batchId = 0L,
      appId = "ckpt-B") shouldBe true
    ManifestLake.read(spark, table).count() shouldBe 2
    // a genuine replay within ckpt-B is still skipped
    ManifestLake.writeBatch(batch, table, batchId = 0L,
      appId = "ckpt-B") shouldBe false
    ManifestLake.read(spark, table).count() shouldBe 2
  }

  test("streaming CDC upserts merge by key across micro-batches and " +
    "survive a replay unchanged") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-cdc-src").toString
    val table = java.nio.file.Files.createTempDirectory("graft-cdc-t").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ck").toString
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    def run(): Unit = {
      val q = Streaming.streamMergeToLake(
        spark.readStream.schema(schema).parquet(src), table,
        keyCols = Seq("id"), checkpoint = ckpt)
      q.awaitTermination()
    }

    writeBatchFile(src, "b1.parquet", 1 to 100)
    run()
    ManifestLake.read(spark, table).count() shouldBe 100

    // second batch: updates keys 50-60, inserts 101-110 → merged by key
    val upd = ((50 to 60) ++ (101 to 110)).map(i => (i.toLong, s"UPD_$i"))
      .toDF("id", "v")
    val tmp = java.nio.file.Files.createTempDirectory("graft-cdc-stage")
    upd.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
    java.nio.file.Files.copy(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(src, "b2.parquet"))
    run()
    val after = ManifestLake.read(spark, table).as[(Long, String)]
      .collect().toMap
    after should have size 110 // 100 originals + 10 inserts, no dup keys
    after(55L) shouldBe "UPD_55"
    after(105L) shouldBe "UPD_105"
    after(49L) shouldBe "v49"

    // crash-replay model for foreachBatch: the LAST epoch re-executes
    // with the identical update set — versions advance but the snapshot
    // content is bit-identical (merge is content-idempotent)
    ManifestLake.merge(upd, table, Seq("id"))
    ManifestLake.read(spark, table).as[(Long, String)]
      .collect().toMap shouldBe after

    // restart with the same checkpoint and nothing new: no reprocessing
    val vBefore = ManifestLake.currentVersion(spark, table)
    run()
    ManifestLake.currentVersion(spark, table) shouldBe vBefore
  }

  test("deduplicating streaming ingest admits each unique doc to the " +
    "corpus and index exactly once — across epochs, within a batch, " +
    "and under a crash-replay of an epoch") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    import graft.text.DedupIndex
    val src = java.nio.file.Files.createTempDirectory("graft-dd-src").toString
    val root = java.nio.file.Files.createTempDirectory("graft-dd").toString
    val corpus = s"$root/corpus"
    val index = s"$root/index"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dd-ck").toString
    def doc(tag: String) = (0 until 30).map(t => s"${tag}_$t").mkString(" ")
    def stage(name: String, docs: Seq[(Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-dd-stage")
      docs.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(src, name)): Unit
    }
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def run(): Unit = {
      val q = Streaming.streamDedupToLake(
        spark.readStream.schema(schema).parquet(src), corpus, index, ckpt)
      q.awaitTermination()
    }
    // epoch 0 BOOTSTRAPS the index (no buildIndex ran): an exact and a
    // near within-batch dup are rejected, the keepers admitted
    stage("b1.parquet", Seq(
      (1L, doc("a")),
      (2L, doc("a")),                                         // exact dup of 1
      (3L, "qqq " + (1 until 30).map(t => s"a_$t").mkString(" ")), // near dup of 1
      (4L, doc("b"))))
    run()
    ManifestLake.read(spark, corpus).select("doc_id").as[Long]
      .collect().toSet shouldBe Set(1L, 4L)
    ManifestLake.snapshot(spark, DedupIndex.signaturesTable(index))
      .bloomCols shouldBe Seq("content_hash") // bootstrap set the blooms
    // epoch 1: a fresh doc, a CROSS-EPOCH exact dup of corpus doc 4,
    // and a within-batch dup of the fresh doc — only the fresh doc lands
    val b2 = Seq((9L, doc("c")), (10L, doc("b")), (11L, doc("c")))
    stage("b2.parquet", b2)
    run()
    ManifestLake.read(spark, corpus).select("doc_id").as[Long]
      .collect().toSet shouldBe Set(1L, 4L, 9L)
    ManifestLake.read(spark, DedupIndex.signaturesTable(index))
      .count() shouldBe 3L
    // crash-replay of epoch 1: the re-executed body classifies
    // bit-stably and every commit is skipped by the epoch guard
    val vC = ManifestLake.currentVersion(spark, corpus)
    val vS = ManifestLake.currentVersion(spark,
      DedupIndex.signaturesTable(index))
    val vP = ManifestLake.currentVersion(spark,
      DedupIndex.postingsTable(index))
    Streaming.dedupIngestBatch(b2.toDF("doc_id", "text"), 1L, corpus,
      index, ckpt, "doc_id", "text", DedupIndex.Config())
    ManifestLake.currentVersion(spark, corpus) shouldBe vC
    ManifestLake.currentVersion(spark,
      DedupIndex.signaturesTable(index)) shouldBe vS
    ManifestLake.currentVersion(spark,
      DedupIndex.postingsTable(index)) shouldBe vP
    ManifestLake.read(spark, corpus).select("doc_id").as[Long]
      .collect().toSet shouldBe Set(1L, 4L, 9L)
  }
}
