package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins OPTIMIZE on both open-format interops (bin-pack + Z-ORDER)
  * and the change-data-feed STREAMING mode: maintenance rewrites
  * change no rows, collapse the file count, tighten stats pruning on
  * the z dimensions, and stay invisible to the change feed. */
class InteropOptimizeSpec extends AnyFunSuite with Matchers
  with SparkSpec {

  private def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("Delta bin-pack: small files per partition collapse, rows are " +
    "unchanged, the commit is dataChange=false so the change feed " +
    "emits nothing for it") {
    import spark.implicits._
    val t = fresh("graft-dopt")
    DeltaInterop.write(
      (1L to 300L).map(i => (i, s"c${i % 2}", s"p$i")).toDF("id", "cat", "p")
        .repartition(12),
      t, partitionBy = Seq("cat"))
    DeltaInterop.enableChangeDataFeed(spark, t)
    val before = DeltaInterop.state(spark, t, None).files.size
    before should be >= 12
    DeltaInterop.optimize(spark, t)
    val after = DeltaInterop.state(spark, t, None)
    after.files.size should be < before
    after.files.size shouldBe 2 // one packed file per partition
    DeltaInterop.read(spark, t).select($"id").as[Long]
      .collect().sorted shouldBe (1L to 300L).toArray
    // pure maintenance: nothing in the feed
    DeltaInterop.changeFeed(spark, t, after.version, after.version)
      .count() shouldBe 0L
  }

  test("Delta Z-ORDER: rewritten stats prune a two-dimensional range " +
    "on either dimension, rows exact") {
    import spark.implicits._
    val t = fresh("graft-dzopt")
    // anti-clustered: row order correlates with NEITHER dimension
    DeltaInterop.write(
      (1L to 4000L).map(i => ((i * 2654435761L) % 4096, (i * 40503L) % 4096, i))
        .toDF("x", "y", "id").repartition(8),
      t)
    DeltaInterop.optimize(spark, t, targetFileBytes = 8L * 1024,
      zorderBy = Seq("x", "y"))
    val live = DeltaInterop.state(spark, t, None).files.size
    live should be >= 4
    val pruned = DeltaInterop.readWhere(spark, t,
      Seq(ScanBetween("x", 0L, 500L)))
    pruned.inputFiles.length should be < live
    pruned.count() shouldBe
      DeltaInterop.read(spark, t).filter($"x".between(0L, 500L)).count()
    val prunedY = DeltaInterop.readWhere(spark, t,
      Seq(ScanBetween("y", 0L, 500L)))
    prunedY.inputFiles.length should be < live
  }

  test("Iceberg bin-pack + Z-ORDER: per-tuple rewrite keeps partition " +
    "tuples, bounds re-record and prune, time travel still serves the " +
    "pre-optimize snapshot") {
    import spark.implicits._
    val t = fresh("graft-iopt")
    // the partitioned stager lands one file per tuple per write, so
    // small files accumulate across APPENDS (the real-world shape)
    val spec = Seq(IcebergInterop.SpecField("cat", "identity", "cat"))
    def gen(r: Range) = r.map(i => ((i * 2654435761L) % 1024,
      (i * 40503L) % 1024, s"c${i % 2}", i.toLong))
      .toDF("x", "y", "cat", "id")
    val s0 = IcebergInterop.write(gen(1 to 400), t, partitionBy = spec)
    (1 to 4).foreach(k =>
      IcebergInterop.write(gen(400 * k + 1 to 400 * (k + 1)), t,
        partitionBy = spec))
    val before = IcebergInterop.state(spark, t, None).files.size
    before should be >= 10
    IcebergInterop.optimize(spark, t, targetFileBytes = 8L * 1024,
      zorderBy = Seq("x", "y"))
    val st = IcebergInterop.state(spark, t, None)
    IcebergInterop.read(spark, t).select($"id").as[Long]
      .collect().sorted shouldBe (1L to 2000L).toArray
    // tuples carried: partition pruning still works after the rewrite
    val cat = IcebergInterop.readWhere(spark, t, Seq(ScanEq("cat", "c1")))
    cat.count() shouldBe 1000L
    cat.inputFiles.length should be < st.files.size
    // z-bounds recorded: a range on x prunes
    val xr = IcebergInterop.readWhere(spark, t,
      Seq(ScanBetween("x", 0L, 100L)))
    xr.inputFiles.length should be < st.files.size
    xr.count() shouldBe
      IcebergInterop.read(spark, t).filter($"x".between(0L, 100L)).count()
    // history intact: the first append's snapshot still serves
    IcebergInterop.readSnapshot(spark, t, s0).count() shouldBe 400L
  }

  test("the delta change feed STREAMS: readChangeFeed=true emits " +
    "row-level changes per commit with version stamps, resumes from " +
    "the checkpoint, and skips maintenance commits") {
    import spark.implicits._
    val t = fresh("graft-cdfstream")
    val ck = java.nio.file.Files
      .createTempDirectory("graft-cdfstream-ck").toString
    DeltaInterop.write((1L to 20L).map(i => (i, s"a$i")).toDF("id", "p"), t)
    DeltaInterop.enableChangeDataFeed(spark, t)
    DeltaInterop.write((21L to 30L).map(i => (i, s"b$i")).toDF("id", "p"), t)
    DeltaInterop.write((100L to 104L).map(i => (i, s"c$i")).toDF("id", "p"),
      t, overwrite = true)
    def drain(): Seq[(Long, String, Long)] = {
      val got = new java.util.concurrent
        .ConcurrentLinkedQueue[(Long, String, Long)]()
      val q = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load(t)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select("id", "_change_type", "_commit_version").collect()
            .foreach(r => got.add((r.getLong(0), r.getString(1),
              r.getLong(2)))); ()
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      got.asScala.toSeq
    }
    val first = drain()
    first.count(_._2 == "insert") shouldBe 15 // v2 appends + v3 adds
    first.count(_._2 == "delete") shouldBe 30 // v3 removed both gens
    first.filter(_._3 == 2L).map(_._1).toSet shouldBe (21L to 30L).toSet
    // nothing re-emits; a maintenance commit stays silent
    DeltaInterop.optimize(spark, t)
    drain() shouldBe empty
    // a new append streams as inserts only
    DeltaInterop.write(Seq((200L, "z")).toDF("id", "p"), t)
    val next = drain()
    next.map(_._2).toSet shouldBe Set("insert")
    next.map(_._1) shouldBe Seq(200L)
  }
}
