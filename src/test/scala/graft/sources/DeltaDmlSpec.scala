package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins Delta row-level DML: merge-on-read DELETE via deletion-vector
  * commits (cumulative vectors, protocol upgrade to table features,
  * fully-deleted files dropping from the state, SQL NULL predicate
  * semantics, time travel to the pre-delete version), copy-on-write
  * UPDATE (touched-file-only rewrite, pre-update assignment
  * evaluation, vector materialization), and both operations' CDC
  * records through the change feed. */
class DeltaDmlSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-delta-dml").toString + "/t"

  private def logText(table: String, v: Long): String = {
    val p = new Path(new Path(table, "_delta_log"), f"$v%020d.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  test("DELETE commits deletion vectors: no data file rewrites, the " +
    "protocol upgrades to table features, reads serve survivors, and " +
    "time travel still serves the pre-delete version") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 200L).map(i => (i, s"p${i % 3}", i * 10)).toDF("id", "g", "v")
        .repartition(4), t)
    val dataFilesBefore = DeltaInterop.state(spark, t, None).files
      .map(_.path).toSet
    val r = DeltaInterop.delete(spark, t, col("id") % 7 === 0)
    r.version shouldBe 1L
    r.rowsAffected shouldBe (1L to 200L).count(_ % 7 == 0)
    r.filesTouched should be > 0
    val st = DeltaInterop.state(spark, t, None)
    // merge-on-read: the SAME data files stay live, now vectored
    st.files.map(_.path).toSet shouldBe dataFilesBefore
    st.files.foreach(a => a.dv should not be empty)
    st.minReaderVersion shouldBe 3
    st.readerFeatures should contain("deletionVectors")
    logText(t, 1L) should include(""""storageType":"u"""")
    DeltaInterop.read(spark, t).count() shouldBe
      (1L to 200L).count(_ % 7 != 0)
    DeltaInterop.read(spark, t).filter($"id" % 7 === 0).count() shouldBe 0L
    DeltaInterop.readVersion(spark, t, 0L).count() shouldBe 200L
  }

  test("a second DELETE on the same files unions cumulatively; " +
    "re-deleting already-dead rows is a no-op") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 100L).map(i => (i, i)).toDF("id", "v"), t)
    DeltaInterop.delete(spark, t, col("id") <= 10).rowsAffected shouldBe 10L
    // overlapping predicate: only the 10 NEW rows count
    val r2 = DeltaInterop.delete(spark, t, col("id") <= 20)
    r2.rowsAffected shouldBe 10L
    DeltaInterop.read(spark, t).agg(min($"id")).as[Long].head() shouldBe 21L
    // a touched file carries ONE descriptor covering both deletes
    val vectored = DeltaInterop.state(spark, t, None).files.filter(_.dv.nonEmpty)
    vectored should not be empty
    vectored.map(_.dv.get.cardinality).sum shouldBe 20L
    // fully-covered predicate again: nothing new, version unchanged
    val r3 = DeltaInterop.delete(spark, t, col("id") <= 20)
    r3.rowsAffected shouldBe 0L
    r3.version shouldBe r2.version
  }

  test("a file whose vector reaches numRecords drops from the table " +
    "instead of re-adding with a full vector") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 50L).map(i => (s"g${i % 2}", i)).toDF("g", "id"), t,
      partitionBy = Seq("g"))
    val before = DeltaInterop.state(spark, t, None).files
    before.size should be >= 2
    DeltaInterop.delete(spark, t, col("g") === "g0")
    val after = DeltaInterop.state(spark, t, None)
    // g0's files are GONE (not vectored); g1's untouched
    after.files.foreach { a =>
      a.partitionValues("g") shouldBe Some("g1")
      a.dv shouldBe empty
    }
    DeltaInterop.read(spark, t).count() shouldBe
      (1L to 50L).count(_ % 2 == 1)
  }

  test("SQL NULL semantics: a row deletes only when the predicate is " +
    "TRUE — NULL-evaluating rows survive") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(Seq[(Long, java.lang.Long)](
      (1L, 5L), (2L, null), (3L, 20L)).toDF("id", "v"), t)
    DeltaInterop.delete(spark, t, col("v") > 10).rowsAffected shouldBe 1L
    DeltaInterop.read(spark, t).select($"id").as[Long].collect()
      .sorted shouldBe Array(1L, 2L)
  }

  test("DELETE with CDF enabled serves the deleted rows through the " +
    "change feed; without CDF the vectored range refuses by name") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 30L).map(i => (i, s"x$i")).toDF("id", "p"), t)
    DeltaInterop.enableChangeDataFeed(spark, t)
    DeltaInterop.delete(spark, t, col("id") <= 5)
    val cf = DeltaInterop.changeFeed(spark, t, 2L, 2L)
    cf.filter($"_change_type" === "delete").select($"id").as[Long]
      .collect().sorted shouldBe (1L to 5L).toArray
    // a table WITHOUT cdf: the DV commit cannot be read as changes
    val t2 = fresh()
    DeltaInterop.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), t2)
    DeltaInterop.delete(spark, t2, col("id") === 1L)
    intercept[DeltaInterop.UnsupportedDeltaFeatureException] {
      DeltaInterop.changeFeed(spark, t2, 1L, 1L).count()
    }
  }

  test("UPDATE rewrites only touched files, evaluates assignments " +
    "against the pre-update row, and records fresh stats") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 100L).map(i => (s"g${i % 2}", i, i)).toDF("g", "id", "v"),
      t, partitionBy = Seq("g"))
    val g1Files = DeltaInterop.state(spark, t, None).files
      .filter(_.partitionValues("g").contains("g1")).map(_.path).toSet
    // swap-style assignment: v := v + id, id := id * 2 — both read the
    // PRE-update row (id*2 must not feed v's sum)
    val r = DeltaInterop.update(spark, t, col("g") === "g0",
      Seq("v" -> (col("v") + col("id")), "id" -> (col("id") * 2)))
    r.rowsAffected shouldBe 50L
    val st = DeltaInterop.state(spark, t, None)
    // g1's files untouched; g0's replaced with stats
    st.files.filter(_.partitionValues("g").contains("g1"))
      .map(_.path).toSet shouldBe g1Files
    st.files.filter(_.partitionValues("g").contains("g0"))
      .foreach(a => a.stats should not be empty)
    val out = DeltaInterop.read(spark, t)
    out.filter($"g" === "g0" && $"v" =!= $"id").count() shouldBe 0L
    out.filter($"g" === "g1").agg(sum($"v")).as[Long].head() shouldBe
      (1L to 100L).filter(_ % 2 == 1).sum
    out.count() shouldBe 100L
  }

  test("UPDATE over a vectored file materializes the vector: the " +
    "replacement carries no DV and dead rows stay dead") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 40L).map(i => (i, i)).toDF("id", "v"), t)
    DeltaInterop.delete(spark, t, col("id") <= 10)
    DeltaInterop.update(spark, t, col("id") > 30, Seq("v" -> lit(0L)))
    val st = DeltaInterop.state(spark, t, None)
    st.files.foreach(a => a.dv shouldBe empty)
    val out = DeltaInterop.read(spark, t)
    out.count() shouldBe 30L
    out.filter($"v" === 0L).count() shouldBe 10L
    out.agg(min($"id")).as[Long].head() shouldBe 11L
  }

  test("UPDATE with CDF enabled records update_preimage and " +
    "update_postimage rows") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 20L).map(i => (i, i)).toDF("id", "v"), t)
    DeltaInterop.enableChangeDataFeed(spark, t)
    DeltaInterop.update(spark, t, col("id") === 7L,
      Seq("v" -> lit(700L)))
    val cf = DeltaInterop.changeFeed(spark, t, 2L, 2L)
    cf.filter($"_change_type" === "update_preimage")
      .select($"v").as[Long].collect() shouldBe Array(7L)
    cf.filter($"_change_type" === "update_postimage")
      .select($"v").as[Long].collect() shouldBe Array(700L)
  }

  test("SQL surface: DELETE FROM and UPDATE against graft_delta, " +
    "aliased and qualified, execute the interop DML") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), t)
    DeltaSql.register("dml_sql_t", t)
    try {
      spark.sql("DELETE FROM graft_delta.dml_sql_t WHERE id <= 3")
      spark.sql(
        "UPDATE graft_delta.dml_sql_t AS x SET v = x.v * 10 WHERE x.id = 4")
      val out = spark.sql(
        "SELECT id, v FROM graft_delta.dml_sql_t ORDER BY id")
        .as[(Long, Long)].collect()
      out.map(_._1) shouldBe (4L to 10L).toArray
      out.find(_._1 == 4L).get._2 shouldBe 40L
      out.find(_._1 == 5L).get._2 shouldBe 5L
      // the delete landed merge-on-read: version 1 carries a vector
      // (the later UPDATE may have materialized it at the head)
      DeltaInterop.state(spark, t, Some(1L))
        .files.exists(_.dv.nonEmpty) shouldBe true
    } finally DeltaSql.unregister("dml_sql_t")
  }

  test("MERGE upserts copy-on-write: matched rows replaced wholesale " +
    "(moving partitions when the source says so), unmatched inserted, " +
    "untouched files kept; duplicate source keys refuse") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 40L).map(i => (s"g${i % 2}", i, i)).toDF("g", "id", "v"), t,
      partitionBy = Seq("g"))
    // id=2 moves g0 → g1; id=4 updates in place; ids 100,101 insert
    val src = Seq(("g1", 2L, 222L), ("g0", 4L, 444L),
      ("g0", 100L, 1000L), ("g1", 101L, 1010L)).toDF("g", "id", "v")
    val r = DeltaInterop.merge(src, t, Seq("id"))
    r.rowsAffected shouldBe 4L
    val out = DeltaInterop.read(spark, t)
    out.count() shouldBe 42L
    out.filter($"id" === 2L).select($"g", $"v").as[(String, Long)]
      .head() shouldBe (("g1", 222L))
    out.filter($"id" === 4L).select($"v").as[Long].head() shouldBe 444L
    out.filter($"id" === 100L).count() shouldBe 1L
    out.filter($"id" === 3L).select($"v").as[Long].head() shouldBe 3L
    // duplicate source keys refuse by name
    intercept[IllegalArgumentException] {
      DeltaInterop.merge(
        Seq(("g0", 1L, 1L), ("g0", 1L, 2L)).toDF("g", "id", "v"),
        t, Seq("id"))
    }.getMessage should include("duplicate")
  }

  test("MERGE with CDF enabled records update pre/post images and " +
    "inserts through the change feed") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), t)
    DeltaInterop.enableChangeDataFeed(spark, t)
    DeltaInterop.merge(
      Seq((3L, 33L), (99L, 990L)).toDF("id", "v"), t, Seq("id"))
    val cf = DeltaInterop.changeFeed(spark, t, 2L, 2L)
    cf.filter($"_change_type" === "update_preimage")
      .select($"v").as[Long].collect() shouldBe Array(3L)
    cf.filter($"_change_type" === "update_postimage")
      .select($"v").as[Long].collect() shouldBe Array(33L)
    cf.filter($"_change_type" === "insert")
      .select($"id").as[Long].collect() shouldBe Array(99L)
  }

  test("SQL MERGE INTO graft_delta executes the upsert; clause " +
    "shapes run through mergeApply") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 5L).map(i => (i, i)).toDF("id", "v"), t)
    DeltaSql.register("merge_sql_t", t)
    Seq((2L, 20L), (9L, 90L)).toDF("id", "v")
      .createOrReplaceTempView("merge_sql_src")
    try {
      spark.sql(
        """MERGE INTO graft_delta.merge_sql_t AS t
          |USING merge_sql_src AS s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val out = spark.sql(
        "SELECT id, v FROM graft_delta.merge_sql_t ORDER BY id")
        .as[(Long, Long)].collect()
      out shouldBe Array((1L, 1L), (2L, 20L), (3L, 3L), (4L, 4L),
        (5L, 5L), (9L, 90L))
      // clause shape: WHEN MATCHED THEN DELETE now executes
      spark.sql(
        """MERGE INTO graft_delta.merge_sql_t AS t
          |USING merge_sql_src AS s ON t.id = s.id
          |WHEN MATCHED THEN DELETE""".stripMargin)
      spark.sql("SELECT id FROM graft_delta.merge_sql_t ORDER BY id")
        .as[Long].collect() shouldBe Array(1L, 3L, 4L, 5L)
    } finally {
      DeltaSql.unregister("merge_sql_t")
      spark.catalog.dropTempView("merge_sql_src"): Unit
    }
  }

  test("a vectored state CHECKPOINTS under the table-features " +
    "protocol and replays exactly; vacuum keeps referenced vectors " +
    "and cleans superseded ones") {
    import spark.implicits._
    val t = fresh()
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    def dvFiles(): Set[String] = fs.listStatus(new Path(t))
      .map(_.getPath.getName)
      .filter(n => n.startsWith("deletion_vector_") && n.endsWith(".bin"))
      .toSet
    DeltaInterop.write((1L to 60L).map(i => (i, i)).toDF("id", "v"), t)
    DeltaInterop.delete(spark, t, col("id") <= 5)   // v1: vector A
    DeltaInterop.delete(spark, t, col("id") <= 10)  // v2: B supersedes A
    dvFiles().size should be >= 2
    // checkpoint at the DV-bearing head, then replay THROUGH it only
    DeltaInterop.checkpoint(spark, t)
    DeltaInterop.read(spark, t).agg(min($"id")).as[Long]
      .head() shouldBe 11L
    // vacuum retaining v1+v2: v1's vectors are still REFERENCED and
    // predate v1's commit (the mtime guard alone would kill them) —
    // the liveDv set must keep every retained version's sidecars
    val before = dvFiles()
    DeltaInterop.vacuum(spark, t, keepLast = 2)
    dvFiles() shouldBe before
    DeltaInterop.readVersion(spark, t, 1L).count() shouldBe 55L
    // purge, then retain only the clean head: every vector is
    // superseded and cleans up
    DeltaInterop.purgeDeletionVectors(spark, t)
    DeltaInterop.vacuum(spark, t, keepLast = 1)
    dvFiles() shouldBe empty
    DeltaInterop.read(spark, t).count() shouldBe 50L
  }

  test("SQL INSERT INTO and INSERT OVERWRITE append/replace with " +
    "positional column semantics") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 5L).map(i => (i, i * 10)).toDF("id", "v"), t)
    DeltaSql.register("ins_sql_t", t)
    try {
      spark.sql("INSERT INTO graft_delta.ins_sql_t " +
        "SELECT 6L AS anything, 60L AS whatever")
      spark.sql("SELECT v FROM graft_delta.ins_sql_t WHERE id = 6")
        .as[Long].head() shouldBe 60L
      spark.sql("INSERT OVERWRITE graft_delta.ins_sql_t " +
        "SELECT 9L, 90L")
      spark.sql("SELECT id, v FROM graft_delta.ins_sql_t")
        .as[(Long, Long)].collect() shouldBe Array((9L, 90L))
    } finally DeltaSql.unregister("ins_sql_t")
  }

  test("MERGE-ON-READ UPDATE: old images die by vector, new images " +
    "append, untouched files keep their paths; CDC records pre/post") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 60L).map(i => (s"g${i % 2}", i, i)).toDF("g", "id", "v"), t,
      partitionBy = Seq("g"))
    DeltaInterop.enableChangeDataFeed(spark, t)
    val before = DeltaInterop.state(spark, t, None).files.map(_.path).toSet
    val r = DeltaInterop.updateMor(spark, t, col("id") === 7L,
      Seq("v" -> (col("v") * 100)))
    r.rowsAffected shouldBe 1L
    val st = DeltaInterop.state(spark, t, None)
    // every pre-existing file is still live (one now vectored); the
    // new image is one appended file
    before.subsetOf(st.files.map(_.path).toSet) shouldBe true
    st.files.count(_.dv.nonEmpty) shouldBe 1
    (st.files.map(_.path).toSet -- before).size shouldBe 1
    val out = DeltaInterop.read(spark, t)
    out.count() shouldBe 60L
    out.filter($"id" === 7L).select($"v").as[Long].head() shouldBe 700L
    out.filter($"id" === 7L).select($"g").as[String].head() shouldBe "g1"
    val cf = DeltaInterop.changeFeed(spark, t, 2L, 2L)
    cf.filter($"_change_type" === "update_preimage")
      .select($"v").as[Long].collect() shouldBe Array(7L)
    cf.filter($"_change_type" === "update_postimage")
      .select($"g", $"v").as[(String, Long)].head() shouldBe (("g1", 700L))
    // the SQL surface reaches it through the session dml-mode conf
    spark.conf.set(DeltaSql.DmlModeConf, "mor")
    try {
      DeltaSql.register("mor_sql_t", t)
      spark.sql(
        "UPDATE graft_delta.mor_sql_t SET v = v + 1 WHERE id = 8")
      DeltaInterop.state(spark, t, None)
        .files.count(_.dv.nonEmpty) shouldBe 2
      DeltaInterop.read(spark, t).filter($"id" === 8L)
        .select($"v").as[Long].head() shouldBe 9L
    } finally {
      spark.conf.unset(DeltaSql.DmlModeConf)
      DeltaSql.unregister("mor_sql_t")
    }
  }

  test("a DML commit racing another writer raises the concurrent-" +
    "commit error and never silently overwrites the winner") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), t)
    // the racer publishes version 1 between this delete's version
    // choice and its publication — deterministic via the seam
    val racer = new Path(new Path(t, "_delta_log"),
      f"${1L}%020d.json")
    val fs = racer.getFileSystem(spark.sessionState.newHadoopConf())
    DeltaInterop.commitRaceHook.set { () =>
      val out = fs.create(racer, false)
      try out.write(
        ("""{"commitInfo":{"timestamp":1,"operation":"WRITE",""" +
          """"operationParameters":{}}}""" + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    intercept[DeltaInterop.ConcurrentDeltaCommitException] {
      DeltaInterop.delete(spark, t, col("id") <= 3)
    }
    // the loser's actions never landed: the racer's empty commit is
    // the head, and every row is still live
    DeltaInterop.state(spark, t, None).version shouldBe 1L
    DeltaInterop.read(spark, t).count() shouldBe 10L
    // the retry (fresh state read) succeeds at version 2
    DeltaInterop.delete(spark, t, col("id") <= 3).version shouldBe 2L
    DeltaInterop.read(spark, t).count() shouldBe 7L
  }

  test("large deletes cross the array→bitmap container boundary: the " +
    "codec round-trips dense kill sets and a bulk DELETE reads back " +
    "exactly") {
    import spark.implicits._
    // codec: dense (bitmap container), sparse (array), and straddling
    val dense = (0L until 30000L by 2L) ++ Seq(70000L, (1L << 32) + 5L)
    DeltaDv.deserialize(DeltaDv.serialize(dense)).sorted shouldBe
      dense.distinct.sorted.toArray
    // a one-file table whose delete kills >4096 positions in one
    // 2^16 block — the sf0.1 bulk-delete shape that needs the bitmap
    val t = fresh()
    DeltaInterop.write(
      (1L to 30000L).map(i => (i, i)).toDF("id", "v").coalesce(1), t)
    val r = DeltaInterop.delete(spark, t, col("id") % 3 === 0)
    r.rowsAffected shouldBe 10000L
    val out = DeltaInterop.read(spark, t)
    out.count() shouldBe 20000L
    out.filter($"id" % 3 === 0).count() shouldBe 0L
    out.agg(sum($"id")).as[Long].head() shouldBe
      (1L to 30000L).filterNot(_ % 3 == 0).sum
  }

  test("DV DELETE works on COLUMN-MAPPED tables (positions are " +
    "name-free): the predicate resolves logically, the vector lands, " +
    "and the protocol upgrade declares columnMapping by name") {
    import spark.implicits._
    val t = fresh()
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    // hand-build a name-mapped table: physical column names on disk
    val stage = fresh()
    (1L to 20L).map(i => (i, s"p$i")).toDF("col-9f2", "col-a71")
      .coalesce(1).write.parquet(stage)
    val part = fs.listStatus(new Path(stage)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new Path(t))
    fs.rename(part, new Path(t, "f1.parquet")) shouldBe true
    val mappedSchema =
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":
        |  {"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-9f2"}},
        |{"name":"payload","type":"string","nullable":true,"metadata":
        |  {"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-a71"}}
        |]}""".stripMargin.replace("\n", "")
    val p0 = new Path(new Path(t, "_delta_log"),
      "00000000000000000000.json")
    fs.mkdirs(p0.getParent)
    val out = fs.create(p0, true)
    try out.write(
      (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
          |{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":${
        DeltaJsonTestUtil.jstr(mappedSchema)
      },"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":1}}
          |{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
          |""").stripMargin.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // the LOGICAL predicate deletes merge-on-read
    val r = DeltaInterop.delete(spark, t, col("id") <= 5)
    r.rowsAffected shouldBe 5L
    val st = DeltaInterop.state(spark, t, None)
    st.columnMappingMode shouldBe "name"
    st.minReaderVersion shouldBe 3
    st.readerFeatures should contain allOf
      ("columnMapping", "deletionVectors")
    val got = DeltaInterop.read(spark, t)
    got.count() shouldBe 15L
    got.agg(min($"id")).as[Long].head() shouldBe 6L
    // the rewriting verbs serve mapped tables too (physical-name
    // rewrites): a CoW UPDATE on the hand-built foreign table works
    DeltaInterop.update(spark, t, col("id") === 6L,
      Seq("payload" -> lit("updated"))).rowsAffected shouldBe 1L
    DeltaInterop.read(spark, t).filter(col("id") === 6L)
      .select(col("payload")).as[String].head() shouldBe "updated"
  }

  test("partition values needing URI escaping (spaces) keep lineage " +
    "joins exact: _metadata.file_path reports %20 while Path.toString " +
    "unescapes — DELETE, UPDATE and MERGE all key through the URI form") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 20L).map(i => (i, if (i % 2 == 0) "A B" else "C", i))
        .toDF("id", "g", "v"), t, partitionBy = Seq("g"))
    // MOR delete touches the space-named partition
    DeltaInterop.delete(spark, t, $"id" === 2L).rowsAffected shouldBe 1L
    // CoW update in the same partition (file with an existing vector)
    DeltaInterop.update(spark, t, $"id" === 4L,
      Seq("v" -> lit(400L))).rowsAffected shouldBe 1L
    // merge updates a space-partition row and inserts a new one
    DeltaInterop.merge(
      Seq((6L, "A B", 600L), (21L, "A B", 21L)).toDF("id", "g", "v"),
      t, Seq("id")).rowsAffected shouldBe 2L
    val out = DeltaInterop.read(spark, t).cache()
    out.count() shouldBe 20L // 20 - 1 deleted + 1 inserted
    out.filter($"id" === 4L).select($"v").as[Long].head() shouldBe 400L
    out.filter($"id" === 6L).select($"v").as[Long].head() shouldBe 600L
    out.filter($"id" === 2L).count() shouldBe 0L
    out.filter($"g" === "A B").count() shouldBe 10L
    out.unpersist()
  }

  test("UPDATE refusals: partition-column assignment and unknown " +
    "columns; a no-match predicate is a version no-op") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 10L).map(i => (s"g${i % 2}", i)).toDF("g", "id"), t,
      partitionBy = Seq("g"))
    intercept[IllegalArgumentException] {
      DeltaInterop.update(spark, t, lit(true), Seq("g" -> lit("x")))
    }.getMessage should include("partition column")
    intercept[IllegalArgumentException] {
      DeltaInterop.update(spark, t, lit(true), Seq("nope" -> lit(1)))
    }.getMessage should include("not in the schema")
    val r = DeltaInterop.update(spark, t, col("id") > 999,
      Seq("id" -> lit(0L)))
    r.rowsAffected shouldBe 0L
    r.version shouldBe 0L
  }
}
