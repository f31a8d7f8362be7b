package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** COLUMN-MAPPED Delta tables as first-class WRITE targets — the
  * modern-Delta default shape (delta.columnMapping.mode = name). Pins:
  *
  *   - creation via `write(columnMapping = "name")`: data files carry
  *     `col-…` PHYSICAL names (verified against the raw parquet), the
  *     recorded schema carries ids + physicalName metadata, protocol
  *     2/5, and reads serve logical names;
  *   - partitioned mapped layouts: partitionValues physically keyed in
  *     the log, physical `col-…=v` dirs on disk, partition pruning and
  *     FILE-STATS pruning both translating logical predicates to
  *     physical keys (file-subset pinned via inputFiles);
  *   - the full DML matrix addressing LOGICAL names throughout: MOR
  *     DELETE (partitioned included), copy-on-write UPDATE, MOR
  *     UPDATE, MERGE upsert;
  *   - CDF on mapped: cdc files store physical names, the change feed
  *     serves logical ones;
  *   - OPTIMIZE and DV purge rewriting under physical names.
  */
class DeltaMappedDmlSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-delta-cm").toString + "/t"

  test("creating a name-mapped table: physical col-… names on disk, " +
    "ids in the recorded schema, protocol 2/5, logical reads") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 20L).map(i => (i, s"p$i")).toDF("id", "p"),
      t, columnMapping = "name")
    val st = DeltaInterop.state(spark, t, None)
    st.columnMappingMode shouldBe "name"
    st.minReaderVersion shouldBe 2
    st.minWriterVersion shouldBe 5
    st.configuration.get("delta.columnMapping.maxColumnId") shouldBe
      Some("2")
    st.schema.fields.foreach { f =>
      f.metadata.contains("delta.columnMapping.id") shouldBe true
      f.metadata.getString("delta.columnMapping.physicalName") should
        startWith("col-")
    }
    // the data files REALLY store physical names
    val raw = spark.read.parquet(
      st.files.map(a => new Path(t, a.path).toString): _*)
    raw.columns.foreach(_ should startWith("col-"))
    // and the mapped read serves the logical shape
    val got = DeltaInterop.read(spark, t)
    got.schema.fieldNames shouldBe Array("id", "p")
    got.count() shouldBe 20L
    got.agg(sum($"id")).as[Long].head() shouldBe (1L to 20L).sum
    // appends compose (second write stages through the same mapping)
    DeltaInterop.write(Seq((21L, "x")).toDF("id", "p"), t)
    DeltaInterop.read(spark, t).count() shouldBe 21L
  }

  test("partitioned mapped tables: physically-keyed partitionValues " +
    "round-trip, partition AND stats pruning translate logical " +
    "predicates to physical keys") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      Seq((1L, "emea", 10L), (2L, "emea", 20L),
        (3L, "apac", 30L), (4L, "apac", 40L))
        .toDF("id", "region", "v").repartition(1),
      t, partitionBy = Seq("region"), columnMapping = "name")
    val st = DeltaInterop.state(spark, t, None)
    st.partitionColumns shouldBe Seq("region")
    // the log's partitionValues are keyed by the PHYSICAL name
    val physRegion = st.schema("region").metadata
      .getString("delta.columnMapping.physicalName")
    st.files.foreach { a =>
      a.partitionValues.keySet shouldBe Set(physRegion)
      a.path should startWith(s"$physRegion=")
    }
    val got = DeltaInterop.read(spark, t)
    got.count() shouldBe 4L
    got.filter($"region" === "emea").select($"id")
      .as[Long].collect().sorted shouldBe Array(1L, 2L)
    // partition pruning: only the emea file scans
    val emea = DeltaInterop.readWhere(spark, t,
      Seq(ScanEq("region", "emea")))
    emea.inputFiles.length shouldBe 1
    emea.select($"id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    // file-stats pruning on a NON-partition column (physical-keyed
    // stats, logical predicate)
    val hi = DeltaInterop.readWhere(spark, t,
      Seq(ScanBetween("v", 35L, 45L)))
    hi.inputFiles.length shouldBe 1
    hi.select($"id").as[Long].collect() shouldBe Array(4L)
  }

  test("the DML matrix on a mapped table addresses logical names: " +
    "MOR DELETE (partitioned), CoW UPDATE, MOR UPDATE, MERGE upsert") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 40L).map(i => (i, if (i % 2 == 0) "even" else "odd", i))
        .toDF("id", "par", "v"),
      t, partitionBy = Seq("par"), columnMapping = "name")
    // MOR delete on the PARTITIONED mapped table
    val del = DeltaInterop.delete(spark, t, $"id" % 5 === 0)
    del.rowsAffected shouldBe 8L
    DeltaInterop.state(spark, t, None).files
      .exists(_.dv.nonEmpty) shouldBe true
    DeltaInterop.read(spark, t).count() shouldBe 32L
    // copy-on-write UPDATE
    val up = DeltaInterop.update(spark, t, $"id" === 7L,
      Seq("v" -> lit(777L)))
    up.rowsAffected shouldBe 1L
    val got = DeltaInterop.read(spark, t)
    got.filter($"id" === 7L).select($"v").as[Long].head() shouldBe 777L
    got.count() shouldBe 32L
    // the rewrite stayed physically named
    spark.read.parquet(DeltaInterop.state(spark, t, None).files
      .map(a => new Path(t, a.path).toString): _*)
      .columns.foreach(_ should startWith("col-"))
    // MOR UPDATE
    DeltaInterop.updateMor(spark, t, $"id" === 8L,
      Seq("v" -> lit(888L))).rowsAffected shouldBe 1L
    DeltaInterop.read(spark, t).filter($"id" === 8L)
      .select($"v").as[Long].head() shouldBe 888L
    // MERGE: update id=1, insert id=100 (lands in its partition)
    val src = Seq((1L, "odd", 111L), (100L, "even", 100L))
      .toDF("id", "par", "v")
    val m = DeltaInterop.merge(src, t, Seq("id"))
    m.rowsAffected shouldBe 2L
    val after = DeltaInterop.read(spark, t)
    after.count() shouldBe 33L
    after.filter($"id" === 1L).select($"v").as[Long].head() shouldBe 111L
    after.filter($"id" === 100L).select($"par").as[String]
      .head() shouldBe "even"
  }

  test("CDF on a mapped table: cdc files store physical names, the " +
    "feed serves logical columns for delete and update") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 10L).map(i => (i, i * 10L)).toDF("id", "v"),
      t, columnMapping = "name")
    DeltaInterop.enableChangeDataFeed(spark, t) shouldBe 1L
    // the enable on a writer-5 table needs NO protocol downgrade
    val st1 = DeltaInterop.state(spark, t, None)
    st1.minReaderVersion shouldBe 2
    st1.minWriterVersion shouldBe 5
    DeltaInterop.delete(spark, t, $"id" <= 3).rowsAffected shouldBe 3L
    DeltaInterop.update(spark, t, $"id" === 10L,
      Seq("v" -> lit(0L))).rowsAffected shouldBe 1L
    val cf = DeltaInterop.changeFeed(spark, t, 2L, 3L).cache()
    cf.schema.fieldNames.take(2) shouldBe Array("id", "v")
    cf.filter($"_change_type" === "delete").select($"id")
      .as[Long].collect().sorted shouldBe Array(1L, 2L, 3L)
    cf.filter($"_change_type" === "update_postimage")
      .select($"v").as[Long].head() shouldBe 0L
    cf.unpersist()
    // the cdc files themselves carry physical data columns
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    val cdcFiles = fs.listStatus(new Path(t, "_change_data"))
      .map(_.getPath.toString).filter(_.endsWith(".parquet"))
    cdcFiles should not be empty
    val rawCdc = spark.read.parquet(cdcFiles: _*)
    rawCdc.columns.count(_.startsWith("col-")) shouldBe 2
    rawCdc.columns should contain("_change_type")
  }

  test("OPTIMIZE and DV purge rewrite mapped files under physical " +
    "names; checkpoint + vacuum keep the mapping intact") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 30L).map(i => (i, i)).toDF("id", "v").repartition(3),
      t, columnMapping = "name")
    DeltaInterop.delete(spark, t, $"id" % 3 === 0)
    DeltaInterop.purgeDeletionVectors(spark, t)
    val st = DeltaInterop.state(spark, t, None)
    st.files.forall(_.dv.isEmpty) shouldBe true
    DeltaInterop.optimize(spark, t) should be > 0L
    val after = DeltaInterop.read(spark, t)
    after.count() shouldBe 20L
    after.agg(sum($"id")).as[Long].head() shouldBe
      (1L to 30L).filterNot(_ % 3 == 0).sum
    spark.read.parquet(DeltaInterop.state(spark, t, None).files
      .map(a => new Path(t, a.path).toString): _*)
      .columns.foreach(_ should startWith("col-"))
    // checkpoint + vacuum: the mapping survives log cleanup
    DeltaInterop.vacuum(spark, t, keepLast = 1) should be >= 0
    val st2 = DeltaInterop.state(spark, t, None)
    st2.columnMappingMode shouldBe "name"
    DeltaInterop.read(spark, t).count() shouldBe 20L
  }

  test("the SQL DML surface addresses mapped tables: DELETE, UPDATE " +
    "and MERGE INTO via graft_delta resolve logical names end-to-end") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 20L).map(i => (i, i * 10L)).toDF("id", "v"), t,
      columnMapping = "name")
    DeltaSql.register("cm_sql", t)
    spark.sql("DELETE FROM graft_delta.cm_sql WHERE id % 4 = 0")
    spark.sql("UPDATE graft_delta.cm_sql SET v = 0 WHERE id = 1")
    Seq((2L, 222L), (100L, 100L)).toDF("id", "v")
      .createOrReplaceTempView("cm_src")
    spark.sql(
      """MERGE INTO graft_delta.cm_sql AS t USING cm_src AS m
        |ON t.id = m.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.sql("SELECT id, v FROM graft_delta.cm_sql")
      .as[(Long, Long)].collect().toMap
    out.size shouldBe 16 // 20 - 5 deleted + 1 inserted
    out(1L) shouldBe 0L
    out(2L) shouldBe 222L
    out(100L) shouldBe 100L
    out.contains(4L) shouldBe false
  }

  test("mapped refusals that remain, by name: schema-changing " +
    "overwrite and id-mode creation") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(Seq((1L, "a")).toDF("id", "p"), t,
      columnMapping = "name")
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.write(Seq((1L, 2L)).toDF("id", "n"), t,
        overwrite = true)
    }.getMessage should include("schema-changing overwrite")
    intercept[IllegalArgumentException] {
      DeltaInterop.write(Seq((1L, "a")).toDF("id", "p"), fresh(),
        columnMapping = "id")
    }.getMessage should include("'name'")
  }
}
