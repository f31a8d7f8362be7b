package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins Iceberg copy-on-write DML: touched-file-only rewrites, the
  * per-manifest metadata economics (untouched manifests carry
  * VERBATIM in the new manifest list; only manifests that lost a file
  * rewrite, survivors as status=0 EXISTING under their original
  * snapshot ids), pre-update assignment evaluation, partition
  * re-derivation for moved rows, SQL NULL predicate semantics, time
  * travel to the pre-DML snapshot, and the schema-evolution interplay
  * (old files' survivors still resolve by field id after a rename). */
class IcebergDmlSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-ice-dml").toString + "/t"

  test("DELETE rewrites only touched files; untouched manifests carry " +
    "verbatim; time travel serves the pre-delete snapshot") {
    import spark.implicits._
    val t = fresh()
    // two snapshots → two manifests; the delete touches only files of
    // the SECOND write, so the first manifest must carry verbatim
    val s0 = IcebergInterop.write(
      (1L to 50L).map(i => (i, s"a$i")).toDF("id", "p"), t)
    IcebergInterop.write(
      (51L to 100L).map(i => (i, s"b$i")).toDF("id", "p"), t)
    val before = IcebergInterop.state(spark, t, None)
    val firstWriteManifests = before.files
      .filter(_.path.contains("")).filter(f => f.snapId == s0)
      .map(_.manifest).toSet
    firstWriteManifests should not be empty
    val r = IcebergInterop.delete(spark, t, col("id") > 90)
    r.rowsAffected shouldBe 10L
    r.filesTouched should be > 0
    val after = IcebergInterop.state(spark, t, None)
    // the first write's files sit in the SAME manifest files as before
    after.files.filter(_.snapId == s0)
      .map(_.manifest).toSet shouldBe firstWriteManifests
    IcebergInterop.read(spark, t).count() shouldBe 90L
    IcebergInterop.read(spark, t).agg(max($"id")).as[Long]
      .head() shouldBe 90L
    // pre-delete snapshot still serves all rows
    IcebergInterop.readSnapshot(spark, t, before.snapshotId)
      .count() shouldBe 100L
  }

  test("a rewritten manifest's survivors stay EXISTING under their " +
    "original snapshot ids, so field-id resolution after a rename " +
    "still serves old files correctly") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 40L).map(i => (i, i * 10)).toDF("id", "v"), t)
    IcebergInterop.renameColumn(spark, t, "v", "value")
    // delete SOME rows: old files rewrite partially — but any file
    // surviving untouched keeps its original snapshot id, and reads
    // must resolve its footer's old physical name 'v' to 'value'
    IcebergInterop.delete(spark, t, col("id") <= 5)
    val out = IcebergInterop.read(spark, t)
    out.columns should contain("value")
    out.count() shouldBe 35L
    out.agg(sum($"value")).as[Long].head() shouldBe
      (6L to 40L).map(_ * 10).sum
  }

  test("DELETE of a whole partition drops its files; empty rewrite " +
    "outputs never commit; NULL-evaluating rows survive") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 60L).map(i => (i, s"g${i % 3}")).toDF("id", "g"), t,
      partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    IcebergInterop.delete(spark, t, col("g") === "g0")
      .rowsAffected shouldBe 20L
    val st = IcebergInterop.state(spark, t, None)
    st.files.foreach(f => f.partition("g").toString should not be "g0")
    st.files.foreach(f => f.records should be > 0L)
    IcebergInterop.read(spark, t).count() shouldBe 40L
    // NULL predicate: only TRUE deletes
    val t2 = fresh()
    IcebergInterop.write(Seq[(Long, java.lang.Long)](
      (1L, 5L), (2L, null), (3L, 20L)).toDF("id", "v"), t2)
    IcebergInterop.delete(spark, t2, col("v") > 10).rowsAffected shouldBe 1L
    IcebergInterop.read(spark, t2).select($"id").as[Long]
      .collect().sorted shouldBe Array(1L, 2L)
  }

  test("UPDATE evaluates assignments against the pre-update row and " +
    "re-derives partition tuples for moved rows") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 30L).map(i => (i, s"g${i % 2}", i)).toDF("id", "g", "v"), t,
      partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    // swap-shape: v := v + id, id := id * 2 — both read the old row
    val r = IcebergInterop.update(spark, t, col("g") === "g0",
      Seq("v" -> (col("v") + col("id")), "id" -> (col("id") * 2)))
    r.rowsAffected shouldBe 15L
    val out = IcebergInterop.read(spark, t)
    out.filter($"g" === "g0" && $"v" =!= $"id").count() shouldBe 0L
    out.count() shouldBe 30L
    // moving a row's partition value lands it in the right tuple
    IcebergInterop.update(spark, t, col("id") === 1L,
      Seq("g" -> lit("g0")))
    val moved = IcebergInterop.state(spark, t, None).files
      .filter(f => Option(f.partition("g")).map(_.toString).contains("g0"))
    IcebergInterop.readWhere(spark, t, Seq(ScanEq("g", "g0")))
      .filter($"id" === 1L).count() shouldBe 1L
    moved should not be empty
  }

  test("SQL surface: DELETE FROM and UPDATE against graft_iceberg, " +
    "aliased and qualified, execute the interop DML") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), t)
    IcebergSql.register("ice_dml_t", t)
    try {
      spark.sql("DELETE FROM graft_iceberg.ice_dml_t WHERE id <= 3")
      spark.sql(
        "UPDATE graft_iceberg.ice_dml_t AS x SET v = x.v * 10 " +
          "WHERE x.id = 4")
      val out = spark.sql(
        "SELECT id, v FROM graft_iceberg.ice_dml_t ORDER BY id")
        .as[(Long, Long)].collect()
      out.map(_._1) shouldBe (4L to 10L).toArray
      out.find(_._1 == 4L).get._2 shouldBe 40L
      out.find(_._1 == 5L).get._2 shouldBe 5L
    } finally IcebergSql.unregister("ice_dml_t")
  }

  test("MERGE upserts copy-on-write: matched rows replaced wholesale, " +
    "unmatched inserted, untouched manifests carried; duplicate " +
    "source keys refuse") {
    import spark.implicits._
    val t = fresh()
    val s1 = IcebergInterop.write(
      (1L to 20L).map(i => (i, i)).toDF("id", "v"), t)
    IcebergInterop.write(
      (21L to 40L).map(i => (i, i)).toDF("id", "v"), t)
    val firstManifests = IcebergInterop.state(spark, t, None)
      .files.filter(_.snapId == s1).map(_.manifest).toSet
    // touch only the SECOND write's keys; first manifest must carry
    val r = IcebergInterop.merge(
      Seq((25L, 250L), (99L, 990L)).toDF("id", "v"), t, Seq("id"))
    r.rowsAffected shouldBe 2L
    val out = IcebergInterop.read(spark, t)
    out.count() shouldBe 41L
    out.filter($"id" === 25L).select($"v").as[Long].head() shouldBe 250L
    out.filter($"id" === 99L).count() shouldBe 1L
    IcebergInterop.state(spark, t, None).files
      .filter(_.snapId == s1).map(_.manifest).toSet shouldBe firstManifests
    intercept[IllegalArgumentException] {
      IcebergInterop.merge(
        Seq((1L, 1L), (1L, 2L)).toDF("id", "v"), t, Seq("id"))
    }.getMessage should include("duplicate")
  }

  test("SQL MERGE INTO graft_iceberg executes the upsert") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 5L).map(i => (i, i)).toDF("id", "v"), t)
    IcebergSql.register("ice_merge_t", t)
    Seq((2L, 20L), (9L, 90L)).toDF("id", "v")
      .createOrReplaceTempView("ice_merge_src")
    try {
      spark.sql(
        """MERGE INTO graft_iceberg.ice_merge_t AS t
          |USING ice_merge_src AS s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      spark.sql(
        "SELECT id, v FROM graft_iceberg.ice_merge_t ORDER BY id")
        .as[(Long, Long)].collect() shouldBe
        Array((1L, 1L), (2L, 20L), (3L, 3L), (4L, 4L), (5L, 5L),
          (9L, 90L))
    } finally {
      IcebergSql.unregister("ice_merge_t")
      spark.catalog.dropTempView("ice_merge_src"): Unit
    }
  }

  test("SQL INSERT INTO and INSERT OVERWRITE append/replace with " +
    "positional column semantics, keeping the table's spec") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 6L).map(i => (i, s"g${i % 2}")).toDF("id", "g"), t,
      partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    IcebergSql.register("ice_ins_t", t)
    try {
      spark.sql("INSERT INTO graft_iceberg.ice_ins_t " +
        "SELECT 7L AS anything, 'g1' AS whatever")
      spark.sql("SELECT count(*) FROM graft_iceberg.ice_ins_t " +
        "WHERE g = 'g1'").as[Long].head() shouldBe 4L
      // the inserted row landed with a real partition tuple
      IcebergInterop.readWhere(spark, t, Seq(ScanEq("g", "g1")))
        .filter($"id" === 7L).count() shouldBe 1L
      spark.sql("INSERT OVERWRITE graft_iceberg.ice_ins_t " +
        "SELECT 9L, 'g0'")
      spark.sql("SELECT id, g FROM graft_iceberg.ice_ins_t")
        .as[(Long, String)].collect() shouldBe Array((9L, "g0"))
    } finally IcebergSql.unregister("ice_ins_t")
  }

  test("expireSnapshots after DML: files shared with the retained " +
    "snapshot survive, replaced originals delete, the expired " +
    "snapshot stops resolving") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val t = fresh()
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    IcebergInterop.write(
      (1L to 50L).map(i => (i, s"g${i % 5}")).toDF("id", "g"), t,
      partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    val pre = IcebergInterop.state(spark, t, None)
    val preFiles = pre.files.map(_.path).toSet
    IcebergInterop.delete(spark, t, col("g") === "g0" && col("id") < 30)
    val post = IcebergInterop.state(spark, t, None)
    val postFiles = post.files.map(_.path).toSet
    val replaced = preFiles -- postFiles
    val shared = preFiles intersect postFiles
    replaced should not be empty
    shared should not be empty
    IcebergInterop.expireSnapshots(spark, t, keepLast = 1) should be > 0
    IcebergInterop.read(spark, t).count() shouldBe
      (1L to 50L).count(i => !(i % 5 == 0 && i < 30))
    replaced.foreach(p => fs.exists(new Path(p)) shouldBe false)
    shared.foreach(p => fs.exists(new Path(p)) shouldBe true)
    intercept[IllegalArgumentException] {
      IcebergInterop.readSnapshot(spark, t, pre.snapshotId).count()
    }
  }

  test("no-op predicates keep the snapshot; MOR delete files and " +
    "unknown columns refuse by name") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), t)
    val snap = IcebergInterop.state(spark, t, None).snapshotId
    IcebergInterop.delete(spark, t, col("id") > 999)
      .snapshotId shouldBe snap
    IcebergInterop.update(spark, t, col("id") > 999, Seq("v" -> lit(0L)))
      .snapshotId shouldBe snap
    intercept[IllegalArgumentException] {
      IcebergInterop.update(spark, t, lit(true), Seq("nope" -> lit(1)))
    }.getMessage should include("not in the schema")
  }
}
