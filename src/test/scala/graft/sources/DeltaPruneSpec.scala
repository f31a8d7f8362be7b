package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins Delta partition pruning: readWhere drops add actions whose
  * recorded partitionValues prove no match (equality, closed ranges,
  * recorded nulls), fails open on everything undecodable, and always
  * applies the exact residual — `read(...).filter(...)` semantics from
  * fewer files. */
class DeltaPruneSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def names(df: org.apache.spark.sql.DataFrame): Int =
    df.inputFiles.length

  test("string and date partitions prune equality and ranges; nulls " +
    "prune; non-partition predicates fail open with exact residual") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val t = fresh("graft-dpr")
    // one file per (region, day): 2 regions × 2 days + a null region
    DeltaInterop.write(Seq(
      (1L, "emea", d("2024-01-01")),
      (2L, "emea", d("2024-01-02")),
      (3L, "apac", d("2024-01-01")),
      (4L, "apac", d("2024-01-02")),
      (5L, null.asInstanceOf[String], d("2024-01-03")))
      .toDF("id", "region", "day"), t, partitionBy = Seq("region", "day"))
    DeltaInterop.read(spark, t).count() shouldBe 5L
    // equality on region: only emea files scanned, null row pruned
    val emea = DeltaInterop.readWhere(spark, t, Seq(ScanEq("region", "emea")))
    names(emea) shouldBe 2
    emea.select($"id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    // closed date range: one day across regions (null-region day-03
    // file prunes by range)
    val day1 = DeltaInterop.readWhere(spark, t, Seq(ScanBetween("day",
      java.time.LocalDate.parse("2024-01-01"),
      java.time.LocalDate.parse("2024-01-01"))))
    names(day1) shouldBe 2
    day1.select($"id").as[Long].collect().sorted shouldBe Array(1L, 3L)
    // both predicates compose: one file
    val one = DeltaInterop.readWhere(spark, t, Seq(
      ScanEq("region", "apac"), ScanEq("day", d("2024-01-02"))))
    names(one) shouldBe 1
    one.select($"id").as[Long].collect() shouldBe Array(4L)
    // a non-partition predicate prunes through recorded FILE STATS
    // (the writer records footer bounds) — and stays residual-exact
    val byId = DeltaInterop.readWhere(spark, t, Seq(ScanEq("id", 5L)))
    names(byId) should be < 5
    byId.select($"region").as[String].collect() shouldBe Array(null)
  }

  test("add-action stats bounds prune files without any partition " +
    "layout; malformed stats fail open; timestamps parse ISO") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val t = fresh("graft-dpr-stats")
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    def parquetFile(rel: String,
                    df: org.apache.spark.sql.DataFrame): String = {
      val stage = fresh("graft-dprs-stage")
      df.coalesce(1).write.parquet(stage)
      val part = fs.listStatus(new Path(stage)).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      val dest = new Path(t, rel)
      fs.mkdirs(dest.getParent)
      fs.rename(part, dest) shouldBe true
      rel
    }
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val f1 = parquetFile("f1.parquet",
      (1L to 10L).map(i =>
        (i, ts(f"2024-05-01T00:00:${i}%02dZ"))).toDF("id", "hr"))
    val f2 = parquetFile("f2.parquet",
      (11L to 20L).map(i =>
        (i, ts(f"2024-06-01T00:00:${i - 10}%02dZ"))).toDF("id", "hr"))
    val f3 = parquetFile("f3.parquet",
      (21L to 30L).map(i =>
        (i, ts(f"2024-07-01T00:00:${i - 20}%02dZ"))).toDF("id", "hr"))
    val schemaStr =
      """{\"type\":\"struct\",\"fields\":[
        |{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},
        |{\"name\":\"hr\",\"type\":\"timestamp\",\"nullable\":true,\"metadata\":{}}]}"""
        .stripMargin.replace("\n", "")
    def add(path: String, stats: String): String =
      s"""{"add":{"path":"$path","partitionValues":{},"size":1,""" +
        s""""modificationTime":1,"dataChange":true,"stats":"$stats"}}"""
    val log = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"x","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":"$schemaStr",""" +
        s""""partitionColumns":[],"configuration":{},"createdTime":1}}""",
      add(f1, """{\"numRecords\":10,\"minValues\":{\"id\":1,""" +
        """\"hr\":\"2024-05-01T00:00:01.000Z\"},""" +
        """\"maxValues\":{\"id\":10,\"hr\":\"2024-05-01T00:00:10.000Z\"}}"""),
      add(f2, """{\"numRecords\":10,\"minValues\":{\"id\":11,""" +
        """\"hr\":\"2024-06-01T00:00:01.000Z\"},""" +
        """\"maxValues\":{\"id\":20,\"hr\":\"2024-06-01T00:00:10.000Z\"}}"""),
      // f3: stats are NOT valid JSON — must fail open, never wrong
      add(f3, "not json at all")).mkString("\n")
    val p = new Path(t, "_delta_log/00000000000000000000.json")
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(log.getBytes("UTF-8")) finally out.close()
    DeltaInterop.read(spark, t).count() shouldBe 30L
    // id range inside f2: f2 survives by stats, f3 by fail-open
    val q = DeltaInterop.readWhere(spark, t, Seq(ScanBetween("id", 12L, 15L)))
    names(q) shouldBe 2
    q.select($"id").as[Long].collect().sorted shouldBe (12L to 15L).toArray
    // timestamp range: June only + the fail-open file
    val tq = DeltaInterop.readWhere(spark, t, Seq(ScanBetween("hr",
      java.time.Instant.parse("2024-06-01T00:00:00Z"),
      java.time.Instant.parse("2024-06-30T23:59:59Z"))))
    names(tq) shouldBe 2
    tq.select($"id").as[Long].collect().sorted shouldBe (11L to 20L).toArray
    // equality outside every recorded bound: only the stat-less file
    val eq = DeltaInterop.readWhere(spark, t, Seq(ScanEq("id", 99L)))
    names(eq) shouldBe 1
    eq.count() shouldBe 0L
  }

  test("the writer records footer stats in its add actions: an " +
    "UNPARTITIONED own table prunes ranges, and a checkpoint carries " +
    "the stats forward") {
    import spark.implicits._
    val t = fresh("graft-dpr-own")
    DeltaInterop.write((1L to 10L).map(i => (i, s"a$i")).toDF("id", "s"), t)
    DeltaInterop.write((11L to 20L).map(i => (i, s"m$i")).toDF("id", "s"), t)
    DeltaInterop.write((21L to 30L).map(i => (i, s"z$i")).toDF("id", "s"), t)
    val st0 = DeltaInterop.state(spark, t, None)
    st0.files.foreach(_.stats shouldBe defined)
    val q = DeltaInterop.readWhere(spark, t, Seq(ScanBetween("id", 12L, 15L)))
    names(q) should be < st0.files.size
    q.select($"id").as[Long].collect().sorted shouldBe (12L to 15L).toArray
    // a checkpoint + log-free resolution still prunes (stats carried)
    DeltaInterop.checkpoint(spark, t)
    DeltaInterop.write((31L to 40L).map(i => (i, s"q$i")).toDF("id", "s"), t)
    DeltaInterop.state(spark, t, None).files
      .foreach(_.stats shouldBe defined)
    val q2 = DeltaInterop.readWhere(spark, t, Seq(ScanEq("id", 35L)))
    names(q2) shouldBe 1
    q2.select($"s").as[String].collect() shouldBe Array("q35")
  }

  test("SQL WHERE prunes through the DeltaSqlRule: equality and " +
    "range conjuncts drop add actions, the original filter stays, " +
    "VERSION AS OF composes") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val t = fresh("graft-dpr-sql")
    DeltaInterop.write(Seq(
      (1L, "emea", d("2024-01-01")),
      (2L, "apac", d("2024-01-01")),
      (3L, "emea", d("2024-01-02")))
      .toDF("id", "region", "day"), t, partitionBy = Seq("region", "day"))
    DeltaSql.register("dprsql", t)
    val q = spark.sql(
      """SELECT id FROM graft_delta.dprsql
        |WHERE region = 'emea'
        |  AND day >= DATE '2024-01-02' AND day <= DATE '2024-01-02'"""
        .stripMargin)
    q.inputFiles.length shouldBe 1
    q.as[Long].collect() shouldBe Array(3L)
    // time travel composes with the filter pre-pass
    DeltaInterop.write(Seq((4L, "emea", d("2024-01-03")))
      .toDF("id", "region", "day"), t, partitionBy = Seq("region", "day"))
    val v0 = spark.sql(
      """SELECT id FROM graft_delta.dprsql VERSION AS OF 0
        |WHERE region = 'emea'""".stripMargin)
    v0.inputFiles.length shouldBe 2
    v0.as[Long].collect().sorted shouldBe Array(1L, 3L)
  }

  test("timestamp partitions decode in the session zone — prune " +
    "verdicts agree with the reconstructed column, and time travel " +
    "composes with pruning") {
    import spark.implicits._
    import java.time.Instant
    def ts(s: String) = java.sql.Timestamp.from(Instant.parse(s))
    val t = fresh("graft-dpr-ts")
    DeltaInterop.write(Seq(
      (1L, ts("2024-05-01T00:00:00Z")),
      (2L, ts("2024-05-02T12:30:00Z")))
      .toDF("id", "hr"), t, partitionBy = Seq("hr"))
    val q = DeltaInterop.readWhere(spark, t, Seq(ScanBetween("hr",
      Instant.parse("2024-05-02T00:00:00Z"),
      Instant.parse("2024-05-02T23:59:59Z"))))
    names(q) shouldBe 1
    q.select($"id").as[Long].collect() shouldBe Array(2L)
    // version 0 still serves both, pruned the same way
    DeltaInterop.write(Seq((3L, ts("2024-05-03T00:00:00Z")))
      .toDF("id", "hr"), t, partitionBy = Seq("hr"))
    val v0 = DeltaInterop.readWhere(spark, t, Seq(ScanBetween("hr",
      Instant.parse("2024-05-01T00:00:00Z"),
      Instant.parse("2024-05-02T23:59:59Z"))), version = Some(0L))
    v0.select($"id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    // head read prunes the new file in when in range
    DeltaInterop.readWhere(spark, t, Seq(ScanEq("hr",
        Instant.parse("2024-05-03T00:00:00Z"))))
      .select($"id").as[Long].collect() shouldBe Array(3L)
  }
}
