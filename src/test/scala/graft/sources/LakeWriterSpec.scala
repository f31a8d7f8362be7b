package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.bike.{BikeQueries, BikeSchemas, Transforms}

class LakeWriterSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("compaction rewrites many small files into few, preserving rows") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-cmp").toString
    val dir = s"$out/events_smallfiles"
    (1 to 2000).map(i => (i.toLong, s"payload_$i")).toDF("id", "payload")
      .repartition(32).write.parquet(dir)
    val before = spark.read.parquet(dir)
    val beforeRows = before.collect().map(_.getLong(0)).sorted
    val report = Compactor.compact(spark, dir)
    report.filesBefore shouldBe 32
    report.filesAfter shouldBe 1 // tiny data → single target file
    val after = spark.read.parquet(dir)
    after.collect().map(_.getLong(0)).sorted shouldBe beforeRows
  }

  test("partitioned write produces Hive layout and reads prune partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft-lw").toString
    val formatted = Transforms.transformSs(Transforms.readRawJson(
      spark, s"${BikeQueries.fixtureDir}/station_status.json",
      BikeSchemas.ssRaw))
    LakeWriter.writePartitioned(
      LakeWriter.withDropPartition(formatted, "20250219", "120000"),
      out, Seq("date", "time"))
    LakeWriter.writePartitioned(
      LakeWriter.withDropPartition(formatted, "20250219", "150000"),
      out, Seq("date", "time"), org.apache.spark.sql.SaveMode.Append)

    new java.io.File(s"$out/date=20250219/time=120000").exists() shouldBe true
    new java.io.File(s"$out/date=20250219/time=150000").exists() shouldBe true

    val drop = LakeWriter.readDrop(spark, out, "20250219", "150000")
    drop.count() shouldBe 8
    // pruning evidence: the partition predicate shows up as
    // PartitionFilters on the scan, not a post-scan Filter over data
    val plan = drop.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include regex "PartitionFilters: \\[.*date.*".r
  }

  test("range-clustered write yields pairwise-disjoint file ranges " +
    "(footer min/max skipping); a round-robin write does not") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{max => fmax, min => fmin}
    val out = java.nio.file.Files.createTempDirectory("graft-clu").toString
    val data = (1 to 20000).map(i => (i.toLong, s"p$i")).toDF("id", "payload")

    def fileRanges(dir: String): Seq[(Long, Long)] =
      new java.io.File(dir).listFiles().toSeq
        .filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val r = spark.read.parquet(f.toString)
            .agg(fmin($"id"), fmax($"id")).collect().head
          (r.getLong(0), r.getLong(1))
        }.sortBy(_._1)

    LakeWriter.writeClustered(data.repartition(8), s"$out/clustered", "id", 4)
    val clustered = fileRanges(s"$out/clustered")
    clustered should have length 4
    // pairwise disjoint: each file's max < next file's min — a range
    // predicate touches exactly one file's stats window
    clustered.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => aMax should be < bMin
      case _ =>
    }

    data.repartition(4).write.parquet(s"$out/roundrobin")
    val rr = fileRanges(s"$out/roundrobin")
    // round-robin: every file spans ~the full id range — nothing skippable
    rr.foreach { case (lo, hi) =>
      lo should be < 3000L
      hi should be > 17000L
    }
  }
}
