package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins [[DeltaStreamProvider]] — subscribe to a Delta-log table:
  * commits arrive as micro-batches with log-sourced partition values,
  * a restarted query resumes from its checkpointed version watermark,
  * and remove-carrying commits are refused unless opted into (Delta's
  * own source contract). */
class DeltaStreamSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(n: Range, k: Int = 0): DataFrame = {
    import spark.implicits._
    n.map(i => (i.toLong, k, s"payload_$i")).toDF("id", "k", "payload")
  }

  private def runStream(table: String, checkpoint: String,
                        options: Map[String, String] = Map.empty)
      : Seq[(Long, Int)] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()
    val q = spark.readStream.format("graft-delta").options(options)
      .load(table)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("id", "k").collect()
          .foreach(r => got.add((r.getLong(0), r.getInt(1)))); ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    got.asScala.toSeq
  }

  test("delta commits arrive as batches with log-sourced partition " +
    "values; a restart resumes from the checkpointed watermark") {
    val t = freshDir("graft-dstream") + "/t"
    val ck = freshDir("graft-dstream-ck")
    DeltaInterop.write(rows(1 to 40, k = 1), t, partitionBy = Seq("k"))
    DeltaInterop.write(rows(41 to 60, k = 2), t, partitionBy = Seq("k"))
    val first = runStream(t, ck)
    first.map(_._1).toSet shouldBe (1L to 60L).toSet
    // partition values came from the LOG (the data files don't carry k)
    first.toMap.view.filterKeys(_ <= 40L).values.toSet shouldBe Set(1)
    first.toMap.view.filterKeys(_ > 40L).values.toSet shouldBe Set(2)
    // no new commits → nothing re-emits
    runStream(t, ck) shouldBe empty
    // only the new commit streams on resume
    DeltaInterop.write(rows(61 to 70, k = 1), t, partitionBy = Seq("k"))
    runStream(t, ck).map(_._1).toSet shouldBe (61L to 70L).toSet
  }

  test("a remove-carrying commit refuses by name; ignoreChanges emits " +
    "its added files; startingVersion skips history") {
    val t = freshDir("graft-dstream-rw") + "/t"
    DeltaInterop.write(rows(1 to 30), t)
    DeltaInterop.write(rows(1 to 10), t, overwrite = true)
    DeltaInterop.write(rows(11 to 15), t)
    val ck1 = freshDir("graft-dstream-rw-ck1")
    val ex = intercept[StreamingQueryException] {
      runStream(t, ck1)
    }
    ex.getCause.getMessage should include("ignoreChanges")
    // opted in: every commit's added files emit (rewrite rows re-emit)
    val ck2 = freshDir("graft-dstream-rw-ck2")
    runStream(t, ck2, Map("ignoreChanges" -> "true"))
      .map(_._1).toSet shouldBe (1L to 30L).toSet
    // startingVersion past the overwrite: only the later append
    val ck3 = freshDir("graft-dstream-rw-ck3")
    runStream(t, ck3, Map("startingVersion" -> "2"))
      .map(_._1).toSet shouldBe (11L to 15L).toSet
    // latest: nothing until a NEW commit lands
    val ck4 = freshDir("graft-dstream-rw-ck4")
    runStream(t, ck4, Map("startingVersion" -> "latest")) shouldBe empty
  }

  test("maxVersionsPerTrigger bounds each catch-up batch; the " +
    "AvailableNow run still drains everything in several batches") {
    val t = freshDir("graft-dstream-mv") + "/t"
    val ck = freshDir("graft-dstream-mv-ck")
    (0 until 5).foreach(i =>
      DeltaInterop.write(rows(i * 10 + 1 to i * 10 + 10), t))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q = spark.readStream.format("graft-delta")
      .option("maxVersionsPerTrigger", "2").load(t)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches.add(batch.count().toInt); ()
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches.asScala.sum shouldBe 50
    // 5 versions at ≤2 per trigger → at least 3 batches
    batches.asScala.count(_ > 0) should be >= 3
    all(batches.asScala.filter(_ > 0)) should be <= 20
  }
}
