package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import IcebergInterop.SpecField

/** Pins [[IcebergStreamProvider]] — subscribe to an Iceberg table:
  * snapshots arrive as micro-batches in snapshot-log order (ids are
  * random longs; lineage position is the clock), partitioned appends
  * carry their tuples through the read kernel, a restart resumes from
  * the checkpointed snapshot id, rewrite/delete-carrying snapshots
  * refuse unless opted into, and an expired restart point refuses by
  * name. */
class IcebergStreamSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(n: Range, k: Int = 0): DataFrame = {
    import spark.implicits._
    n.map(i => (i.toLong, k.toLong, s"payload_$i")).toDF("id", "k", "payload")
  }

  private def runStream(table: String, checkpoint: String,
                        options: Map[String, String] = Map.empty)
      : Seq[(Long, Long)] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = spark.readStream.format("graft-iceberg").options(options)
      .load(table)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("id", "k").collect()
          .foreach(r => got.add((r.getLong(0), r.getLong(1)))); ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    got.asScala.toSeq
  }

  test("iceberg snapshots arrive as batches in lineage order; " +
    "partition tuples ride through; a restart resumes from the " +
    "checkpointed snapshot") {
    val t = freshDir("graft-istream") + "/t"
    val ck = freshDir("graft-istream-ck")
    val spec = Seq(SpecField("k", "identity", "k"))
    IcebergInterop.write(rows(1 to 40, k = 1), t, partitionBy = spec)
    IcebergInterop.write(rows(41 to 60, k = 2), t, partitionBy = spec)
    val first = runStream(t, ck)
    first.map(_._1).toSet shouldBe (1L to 60L).toSet
    first.toMap.view.filterKeys(_ <= 40L).values.toSet shouldBe Set(1L)
    first.toMap.view.filterKeys(_ > 40L).values.toSet shouldBe Set(2L)
    // no new snapshots → nothing re-emits
    runStream(t, ck) shouldBe empty
    // only the new snapshot streams on resume
    IcebergInterop.write(rows(61 to 70, k = 3), t, partitionBy = spec)
    runStream(t, ck).map(_._1).toSet shouldBe (61L to 70L).toSet
  }

  test("a rewriting snapshot refuses by name; ignoreChanges emits its " +
    "appended files; startingSnapshot=latest skips history; an " +
    "expired restart point refuses") {
    val t = freshDir("graft-istream-rw") + "/t"
    IcebergInterop.write(rows(1 to 30), t)
    IcebergInterop.write(rows(1 to 10), t, overwrite = true)
    IcebergInterop.write(rows(11 to 15), t)
    val ck1 = freshDir("graft-istream-rw-ck1")
    val ex = intercept[StreamingQueryException] { runStream(t, ck1) }
    ex.getCause.getMessage should include("ignoreChanges")
    // opted in: every snapshot's appended files emit
    val ck2 = freshDir("graft-istream-rw-ck2")
    runStream(t, ck2, Map("ignoreChanges" -> "true"))
      .map(_._1).toSet shouldBe (1L to 30L).toSet
    // latest with no history behind it: nothing streams (and with no
    // committed offset, a restart re-anchors at the CURRENT head —
    // Delta's own "latest" contract)
    val t2 = freshDir("graft-istream-latest") + "/t"
    val s0 = IcebergInterop.write(rows(1 to 20), t2)
    val ck3 = freshDir("graft-istream-rw-ck3")
    runStream(t2, ck3, Map("startingSnapshot" -> "latest")) shouldBe empty
    // an explicit snapshot id anchors the stream after it
    IcebergInterop.write(rows(21 to 25), t2)
    val ck3b = freshDir("graft-istream-rw-ck3b")
    runStream(t2, ck3b, Map("startingSnapshot" -> s0.toString))
      .map(_._1).toSet shouldBe (21L to 25L).toSet
    // expiry under the checkpoint: the committed snapshot vanishes
    // from the lineage → named refusal, not silent re-streaming
    val t3 = freshDir("graft-istream-exp") + "/t"
    val ck4 = freshDir("graft-istream-exp-ck")
    IcebergInterop.write(rows(1 to 5), t3)
    IcebergInterop.write(rows(6 to 10), t3)
    runStream(t3, ck4).map(_._1).toSet shouldBe (1L to 10L).toSet
    IcebergInterop.write(rows(11 to 12), t3)
    IcebergInterop.write(rows(13 to 14), t3)
    IcebergInterop.expireSnapshots(spark, t3, keepLast = 1)
    val ex2 = intercept[StreamingQueryException] { runStream(t3, ck4) }
    ex2.getCause.getMessage should include("expired")
  }
}
