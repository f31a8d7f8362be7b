package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the zero-copy Delta ↔ Iceberg conversions: identical rows in
  * the target format, FILE IDENTITY (no data movement — the converted
  * metadata references the source's files verbatim), partition
  * semantics carried into the target's pruning, and the per-leg
  * refusals surviving the composition. */
class CrossFormatSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-xfmt").toString + "/t"

  test("Delta → Iceberg: zero data movement (file identity), equal " +
    "rows, and the Hive partition layout prunes as identity tuples") {
    import spark.implicits._
    val t = fresh()
    val df = (1L to 900L).map(i => (i, s"c${i % 3}", i * 1.5))
      .toDF("id", "cat", "v")
    DeltaInterop.write(df, t, partitionBy = Seq("cat"))
    val deltaFiles = DeltaInterop.state(spark, t, None).files
      .map(a => new Path(t, a.path).toUri.getPath).sorted
    CrossFormat.deltaToIceberg(spark, t)
    val ice = IcebergInterop.read(spark, t)
    ice.count() shouldBe 900L
    ice.agg(sum($"id")).as[Long].head() shouldBe (1L to 900L).sum
    // no data moved: the Iceberg manifests reference the Delta files
    val iceFiles = IcebergInterop.state(spark, t, None).files
      .map(f => new Path(f.path).toUri.getPath).sorted
    iceFiles shouldBe deltaFiles
    // the partition layout prunes in the TARGET format
    val pruned = IcebergInterop.readWhere(spark, t,
      Seq(ScanEq("cat", "c1")))
    pruned.count() shouldBe 300L
    pruned.inputFiles.length should be < iceFiles.length
    // partition column values reconstruct (Delta files omit them)
    pruned.filter($"cat" =!= "c1").count() shouldBe 0L
  }

  test("Iceberg → Delta: zero data movement, equal rows, and the " +
    "Delta mirror time-travels independently afterwards") {
    import spark.implicits._
    val t = fresh()
    val df = (1L to 400L).map(i => (i, s"p$i")).toDF("id", "p")
    IcebergInterop.write(df, t)
    IcebergInterop.write(Seq((401L, "p401")).toDF("id", "p"), t)
    val iceFiles = IcebergInterop.state(spark, t, None).files
      .map(f => new Path(f.path).toUri.getPath).sorted
    CrossFormat.icebergToDelta(spark, t)
    val delta = DeltaInterop.read(spark, t)
    delta.count() shouldBe 401L
    val deltaFiles = DeltaInterop.state(spark, t, None).files
      .map(a => new Path(t, a.path).toUri.getPath).sorted
    deltaFiles shouldBe iceFiles
    delta.select($"id").as[Long].collect().sorted shouldBe
      (1L to 401L).toArray
  }

  test("per-leg refusals survive the composition: a DV-bearing Delta " +
    "table refuses Delta → Iceberg by name") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 50L).map(i => (i, s"x$i")).toDF("id", "p"), t)
    // graft a deletion vector onto the table the way the DV specs do:
    // an inline-DV add re-publishing the same file
    val st = DeltaInterop.state(spark, t, None)
    val f = st.files.head
    val bitmap = DeltaDv.serialize(Seq(0L))
    val z85 = DeltaDv.z85EncodePadded(bitmap)
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(
      new Path(t, "_delta_log/00000000000000000001.json"), false)
    try out.write(
      (s"""{"commitInfo":{"timestamp":1700000000000,"operation":"DELETE"}}
          |{"add":{"path":"${f.path}","partitionValues":{},"size":${f.size},"modificationTime":1700000000000,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"$z85","offset":0,"sizeInBytes":${bitmap.length},"cardinality":1}}}
          |""".stripMargin).getBytes("UTF-8"))
    finally out.close()
    intercept[IllegalArgumentException] {
      CrossFormat.deltaToIceberg(spark, t)
    }.getMessage should include("deletion-vector")
  }
}
