package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** UniForm-style auto-mirror ([[UniForm]]): after enable, every DATA
  * commit on the Delta table re-syncs its Iceberg mirror in place
  * (append, DML), maintenance commits skip, disable freezes the
  * mirror, and ineligible tables refuse through the conversion legs'
  * named errors. */
class UniFormSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-uniform").toString + "/t"

  private def iceVersions(t: String): Long = {
    val fs = new Path(t).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.listStatus(new Path(t, "metadata")).toSeq
      .map(_.getPath.getName)
      .count(n => n.startsWith("v") && n.endsWith(".metadata.json"))
  }

  test("enable publishes the mirror; appends and DML re-sync it " +
    "automatically; property-only commits skip; disable freezes") {
    import spark.implicits._
    val t = fresh()
    try {
      DeltaInterop.write(
        (1L to 10L).map(i => (i, i)).toDF("id", "v"), t)
      UniForm.enableAutoMirror(spark, t)
      IcebergInterop.read(spark, t).count() shouldBe 10L
      // commit 1: append — the mirror serves it with no extra call
      DeltaInterop.write(Seq((100L, 100L)).toDF("id", "v"), t)
      IcebergInterop.read(spark, t).count() shouldBe 11L
      // commit 2: DML — deleted rows leave the mirror too
      DeltaInterop.delete(spark, t, col("id") <= 3L)
      IcebergInterop.read(spark, t).count() shouldBe 8L
      IcebergInterop.read(spark, t).filter(col("id") <= 3L)
        .count() shouldBe 0L
      // maintenance: a property-only commit moves the Delta log but
      // NOT the mirror
      val before = iceVersions(t)
      DeltaInterop.setProperties(spark, t, Map("graft.note" -> "x"))
      iceVersions(t) shouldBe before
      // disable: the mirror freezes at its last synced state
      UniForm.disableAutoMirror(t)
      DeltaInterop.write(Seq((200L, 200L)).toDF("id", "v"), t)
      DeltaInterop.read(spark, t).count() shouldBe 9L
      IcebergInterop.read(spark, t).count() shouldBe 8L
    } finally UniForm.disableAutoMirror(t)
  }

  test("ineligible tables refuse at enable through the legs' named " +
    "errors and nothing registers") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 5L).map(i => (i, i)).toDF("id", "v"), t,
      columnMapping = "name")
    intercept[IllegalArgumentException](
      UniForm.enableAutoMirror(spark, t))
      .getMessage should include("column mapping")
    UniForm.isMirrored(t) shouldBe false
    // later commits on the unregistered table never try to sync
    DeltaInterop.write(Seq((9L, 9L)).toDF("id", "v"), t)
    DeltaInterop.read(spark, t).count() shouldBe 6L
  }
}
