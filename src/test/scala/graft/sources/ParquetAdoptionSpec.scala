package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Raw-parquet ADOPTION — `CONVERT TO DELTA` / Iceberg `migrate` for
  * a plain (optionally Hive-partitioned) parquet directory, in place
  * and metadata-only: one log/metadata commit referencing the
  * existing files verbatim, footer row counts read distributed.
  * Adopting 100 TB must never rewrite a byte. */
class ParquetAdoptionSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def rawDir(): String = {
    import spark.implicits._
    val d = java.nio.file.Files
      .createTempDirectory("graft-adopt").toString + "/t"
    (1L to 40L).map(i => (i, i * 2.5, s"g${i % 4}"))
      .toDF("id", "x", "g")
      .write.partitionBy("g").parquet(d)
    d
  }

  test("CONVERT TO DELTA adopts in place: files verbatim, partition " +
    "columns recorded, numRecords stats, pruning and DML after") {
    val d = rawDir()
    val before = spark.read.parquet(d).orderBy("id").collect()
    val rawFiles = spark.read.parquet(d).inputFiles.toSet

    DeltaInterop.convertParquet(spark, d) shouldBe 0L
    val st = DeltaInterop.state(spark, d, None)
    st.partitionColumns shouldBe Seq("g")
    st.files.size shouldBe rawFiles.size
    // adopted verbatim: the add actions reference the original files
    val read = DeltaInterop.read(spark, d)
    read.orderBy("id").collect() shouldBe before
    read.inputFiles.toSet shouldBe rawFiles
    // partition pruning works off the adopted partitionValues
    DeltaInterop.readPruned(spark, d, Seq(ScanEq("g", "g1")))
      .inputFiles.length should be < rawFiles.size
    DeltaInterop.readWhere(spark, d, Seq(ScanEq("g", "g1")))
      .count() shouldBe 10L
    // the footer-read stats landed: metadata-only COUNT(*) possible
    st.files.foreach(a => a.stats should not be None)
    // real DML on the adopted table
    DeltaInterop.delete(spark, d, col("id") <= 4)
    DeltaInterop.read(spark, d).count() shouldBe 36L
    // re-converting refuses
    intercept[Exception](DeltaInterop.convertParquet(spark, d))
      .getMessage should include("_delta_log")
  }

  test("CONVERT TO ICEBERG migrates in place: identity spec with " +
    "real tuples, pruning, appends after; SQL doors register") {
    val d = rawDir()
    val before = spark.read.parquet(d).orderBy("id").collect()

    IcebergInterop.migrateParquet(spark, d)
    val st = IcebergInterop.state(spark, d, None)
    st.specs(st.defaultSpecId) shouldBe
      Seq(IcebergInterop.SpecField("g", "identity", "g"))
    st.files.foreach(f => f.partition.keySet shouldBe Set("g"))
    IcebergInterop.read(spark, d).orderBy("id").collect() shouldBe before
    // tuple-driven pruning
    IcebergInterop.readWhere(spark, d, Seq(ScanEq("g", "g2")))
      .count() shouldBe 10L
    IcebergInterop.readPruned(spark, d, Seq(ScanEq("g", "g2")))
      .inputFiles.length should be < st.files.size
    // an append under the adopted spec
    import spark.implicits._
    IcebergInterop.write(
      Seq((41L, 99.9, "g1")).toDF("id", "x", "g"), d,
      partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    IcebergInterop.read(spark, d).count() shouldBe 41L
    // double-migrate and delta-dir refusals
    intercept[Exception](IcebergInterop.migrateParquet(spark, d))
      .getMessage should include("Iceberg metadata")

    // SQL doors on fresh dirs, AS registers the alias
    val d2 = rawDir()
    spark.sql(s"CONVERT TO DELTA '$d2' AS adopted_d")
      .collect().head.getLong(0) shouldBe 0L
    spark.sql("SELECT count(*) AS n FROM graft_delta.adopted_d")
      .head().getLong(0) shouldBe 40L
    intercept[Exception](IcebergInterop.migrateParquet(spark, d2))
      .getMessage should include("Delta table")
    val d3 = rawDir()
    spark.sql(s"CONVERT TO ICEBERG '$d3' AS adopted_i").collect()
    spark.sql("SELECT count(*) AS n FROM graft_iceberg.adopted_i")
      .head().getLong(0) shouldBe 40L
  }
}
