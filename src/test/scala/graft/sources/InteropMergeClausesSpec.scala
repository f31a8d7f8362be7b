package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.sources.ManifestLake.{MergeDelete, MergeInsert, MergeUpdate,
  mergeSrcCol}

/** Pins the generalized MERGE clause surface on BOTH open-format
  * interops ([[DeltaInterop.mergeApply]] /
  * [[IcebergInterop.mergeApply]]): conditional matched
  * update/delete, first-match-wins, conditional column-list inserts,
  * WHEN NOT MATCHED BY SOURCE under the scoped cost contract,
  * partition moves, CDF images, and the cost shape (untouched
  * files/manifests carry verbatim). */
class InteropMergeClausesSpec extends AnyFunSuite with Matchers
  with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-mrgcl").toString + "/t"

  test("Delta clause matrix: conditional delete/update first-match-" +
    "wins, conditional column-list insert, untouched files carried, " +
    "partition moves land") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 100L).map(i => (s"g${i % 4}", i, i * 1.0))
        .toDF("g", "id", "v"), t, partitionBy = Seq("g"))
    val before = DeltaInterop.state(spark, t, None).files.map(_.path).toSet
    val src = Seq(
      ("g1", 1L, "del", 0.0),     // matched, delete clause fires
      ("g2", 2L, "upd", 100.0),   // matched, update clause fires
      ("g3", 3L, "other", 0.0),   // matched, NO clause fires → unchanged
      ("g0", 4L, "upd", 0.5),     // matched update MOVES partition g0→g0 (id 4 is g0) — keep same
      ("g0", 200L, "ins", 5.0),   // not matched, insert fires
      ("g0", 201L, "skip", 6.0))  // not matched, condition false → dropped
      .toDF("g", "id", "op", "nv")
    val r = DeltaInterop.mergeApply(src, t, Seq("id"),
      matched = Seq(
        MergeDelete(Some(mergeSrcCol("op") === "del")),
        MergeUpdate(Some(mergeSrcCol("op") === "upd"),
          Some(Seq("v" -> (mergeSrcCol("nv") + col("v")))))),
      notMatched = Seq(
        MergeInsert(Some(mergeSrcCol("op") === "ins"),
          Some(Seq("id" -> mergeSrcCol("id"),
            "g" -> mergeSrcCol("g"),
            "v" -> mergeSrcCol("nv"))))))
    r.rowsAffected shouldBe 4L // del(1) + upd(2,4) + ins(200)
    val out = DeltaInterop.read(spark, t)
    out.count() shouldBe 100L // -1 deleted, +1 inserted
    out.filter($"id" === 1L).count() shouldBe 0L
    out.filter($"id" === 2L).select($"v").as[Double].head() shouldBe 102.0
    out.filter($"id" === 3L).select($"v").as[Double].head() shouldBe 3.0
    out.filter($"id" === 4L).select($"v").as[Double].head() shouldBe 4.5
    out.filter($"id" === 200L).select($"g", $"v")
      .as[(String, Double)].head() shouldBe (("g0", 5.0))
    out.filter($"id" === 201L).count() shouldBe 0L
    // untouched partitions carried verbatim: ids 1..4 live in g0..g3,
    // so every partition is touched here — instead pin that files NOT
    // holding a matched key survive: rewrite only removed what it had to
    val after = DeltaInterop.state(spark, t, None).files.map(_.path).toSet
    (before intersect after) should not be empty

    // FIRST-match-wins: update listed before delete wins
    DeltaInterop.mergeApply(
      Seq(("g2", 10L, "del", 999.0)).toDF("g", "id", "op", "nv"),
      t, Seq("id"),
      matched = Seq(
        MergeUpdate(Some(mergeSrcCol("op") === "del"),
          Some(Seq("v" -> mergeSrcCol("nv")))),
        MergeDelete(Some(mergeSrcCol("op") === "del"))))
    DeltaInterop.read(spark, t).filter($"id" === 10L)
      .select($"v").as[Double].head() shouldBe 999.0

    // a partition MOVE through an UPDATE assignment
    DeltaInterop.mergeApply(
      Seq(("gX", 20L)).toDF("g", "id"), t, Seq("id"),
      matched = Seq(MergeUpdate(None,
        Some(Seq("g" -> mergeSrcCol("g"))))))
    DeltaInterop.read(spark, t).filter($"id" === 20L)
      .select($"g").as[String].head() shouldBe "gX"

    // duplicate-keyed sources refuse by name
    intercept[IllegalArgumentException] {
      DeltaInterop.mergeApply(
        Seq(("g0", 7L, "x", 0.0), ("g0", 7L, "y", 0.0))
          .toDF("g", "id", "op", "nv"),
        t, Seq("id"), matched = Seq(MergeDelete(None)))
    }.getMessage should include("duplicate")
  }

  test("Delta WHEN NOT MATCHED BY SOURCE: scoped sync deletes only " +
    "in-scope matchless rows, out-of-scope files never rewrite; " +
    "NMBS UPDATE marks; unscoped refuses without opt-in") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 400L).map(i => (s"d${(i - 1) / 100}", i, "live"))
        .toDF("ds", "id", "st"), t, partitionBy = Seq("ds"))
    val before = DeltaInterop.state(spark, t, None).files
    // source mirrors partition d0 minus every 7th id
    val src = (1L to 100L).filterNot(_ % 7 == 0)
      .map(i => ("d0", i, "live")).toDF("ds", "id", "st")
    val r = DeltaInterop.mergeApply(src, t, Seq("id"),
      matched = Seq(MergeUpdate()),      // SET *
      notMatched = Seq(MergeInsert()),   // INSERT *
      notMatchedBySource = Seq(MergeDelete(None)),
      scope = Some(col("ds") === "d0"))
    val out = DeltaInterop.read(spark, t)
    out.count() shouldBe (400L - 100L / 7L)
    out.filter($"ds" === "d0" && $"id" % 7 === 0).count() shouldBe 0L
    out.filter($"ds" =!= "d0").count() shouldBe 300L
    // files of d1..d3 carried VERBATIM — the scope pruned them out
    val after = DeltaInterop.state(spark, t, None).files.map(_.path).toSet
    before.filter(_.partitionValues.get("ds").flatten.exists(_ != "d0"))
      .foreach(a => after should contain(a.path))
    // rowsAffected = 86 matched-fired (SET *) + 14 NMBS deletes
    r.rowsAffected shouldBe 100L

    // NMBS UPDATE with assignments under the whole-table opt-in: the
    // soft-delete mirror idiom
    val t2 = fresh()
    DeltaInterop.write(
      (1L to 40L).map(i => (i, "live")).toDF("id", "st"), t2)
    DeltaInterop.mergeApply(
      (1L to 20L).map(i => (i, "live")).toDF("id", "st"), t2, Seq("id"),
      matched = Seq(MergeUpdate()),
      notMatchedBySource = Seq(MergeUpdate(None,
        Some(Seq("st" -> lit("gone"))))),
      fullTableMerge = true)
    val m = DeltaInterop.read(spark, t2)
    m.count() shouldBe 40L
    m.filter($"st" === "gone").count() shouldBe 20L
    m.filter($"id" <= 20L && $"st" =!= "live").count() shouldBe 0L

    // NMBS UPDATE needs explicit assignments
    intercept[IllegalArgumentException] {
      DeltaInterop.mergeApply(src, t, Seq("id"),
        matched = Nil,
        notMatchedBySource = Seq(MergeUpdate(None, None)),
        scope = Some(col("ds") === "d0"))
    }.getMessage should include("explicit")
    // unscoped NMBS refuses without the opt-in (small-table fast path
    // disabled so this table does not qualify automatically)
    spark.conf.set(ManifestLake.NmbsSmallTableBytesConf, "0")
    try {
      intercept[IllegalArgumentException] {
        DeltaInterop.mergeApply(src, t, Seq("id"),
          matched = Nil, notMatchedBySource = Seq(MergeDelete(None)))
      }.getMessage should include("fullTableMerge")
    } finally spark.conf.unset(ManifestLake.NmbsSmallTableBytesConf)
  }

  test("Delta clause MERGE with CDF records update pre/post, delete " +
    "and insert images — exactly the rows a clause touched") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 10L).map(i => (i, i * 1.0)).toDF("id", "v"), t)
    DeltaInterop.enableChangeDataFeed(spark, t)
    DeltaInterop.mergeApply(
      Seq((3L, "upd", 33.0), (5L, "del", 0.0), (99L, "ins", 990.0))
        .toDF("id", "op", "nv"), t, Seq("id"),
      matched = Seq(
        MergeUpdate(Some(mergeSrcCol("op") === "upd"),
          Some(Seq("v" -> mergeSrcCol("nv")))),
        MergeDelete(Some(mergeSrcCol("op") === "del"))),
      notMatched = Seq(MergeInsert(Some(mergeSrcCol("op") === "ins"),
        Some(Seq("id" -> mergeSrcCol("id"), "v" -> mergeSrcCol("nv"))))))
    val cf = DeltaInterop.changeFeed(spark, t, 2L, 2L)
    cf.filter($"_change_type" === "update_preimage")
      .select($"v").as[Double].collect() shouldBe Array(3.0)
    cf.filter($"_change_type" === "update_postimage")
      .select($"v").as[Double].collect() shouldBe Array(33.0)
    cf.filter($"_change_type" === "delete")
      .select($"id").as[Long].collect() shouldBe Array(5L)
    cf.filter($"_change_type" === "insert")
      .select($"id").as[Long].collect() shouldBe Array(99L)
  }

  test("Iceberg clause matrix: conditional delete/update first-match-" +
    "wins, conditional column-list insert, untouched manifests " +
    "carried, partition moves re-derive tuples") {
    import spark.implicits._
    val t = fresh()
    val s1 = IcebergInterop.write(
      (1L to 50L).map(i => (i, s"g${i % 2}", i * 1.0)).toDF("id", "g", "v"),
      t, partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    IcebergInterop.write(
      (51L to 100L).map(i => (i, s"g${i % 2}", i * 1.0))
        .toDF("id", "g", "v"), t,
      partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    val firstManifests = IcebergInterop.state(spark, t, None)
      .files.filter(_.snapId == s1).map(_.manifest).toSet
    // touch only second-write keys: first write's manifests must carry
    val src = Seq(
      (60L, "del", 0.0), (62L, "upd", 100.0), (64L, "other", 0.0),
      (200L, "ins", 5.0), (201L, "skip", 6.0))
      .toDF("id", "op", "nv")
    val r = IcebergInterop.mergeApply(src, t, Seq("id"),
      matched = Seq(
        MergeDelete(Some(mergeSrcCol("op") === "del")),
        MergeUpdate(Some(mergeSrcCol("op") === "upd"),
          Some(Seq("v" -> (mergeSrcCol("nv") + col("v")))))),
      notMatched = Seq(
        MergeInsert(Some(mergeSrcCol("op") === "ins"),
          Some(Seq("id" -> mergeSrcCol("id"), "g" -> lit("g0"),
            "v" -> mergeSrcCol("nv"))))))
    r.rowsAffected shouldBe 3L
    val out = IcebergInterop.read(spark, t)
    out.count() shouldBe 100L
    out.filter($"id" === 60L).count() shouldBe 0L
    out.filter($"id" === 62L).select($"v").as[Double].head() shouldBe 162.0
    out.filter($"id" === 64L).select($"v").as[Double].head() shouldBe 64.0
    out.filter($"id" === 200L).select($"g").as[String].head() shouldBe "g0"
    out.filter($"id" === 201L).count() shouldBe 0L
    IcebergInterop.state(spark, t, None).files
      .filter(_.snapId == s1).map(_.manifest)
      .toSet shouldBe firstManifests
    // partition move through an UPDATE assignment: tuple re-derives
    IcebergInterop.mergeApply(
      Seq((61L, "gX")).toDF("id", "g"), t, Seq("id"),
      matched = Seq(MergeUpdate(None, Some(Seq("g" -> mergeSrcCol("g"))))))
    val moved = IcebergInterop.state(spark, t, None).files
      .filter(_.partition.get("g").exists(v => String.valueOf(v) == "gX"))
    moved should not be empty
    IcebergInterop.read(spark, t).filter($"id" === 61L)
      .select($"g").as[String].head() shouldBe "gX"
    // duplicate-keyed sources refuse by name
    intercept[IllegalArgumentException] {
      IcebergInterop.mergeApply(
        Seq((7L, "x", 0.0), (7L, "y", 0.0)).toDF("id", "op", "nv"),
        t, Seq("id"), matched = Seq(MergeDelete(None)))
    }.getMessage should include("duplicate")
  }

  test("Iceberg WHEN NOT MATCHED BY SOURCE: scoped sync under tuple " +
    "pruning, NMBS UPDATE marks under fullTableMerge, unscoped " +
    "refuses without opt-in") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 400L).map(i => (i, s"d${(i - 1) / 100}", "live"))
        .toDF("id", "ds", "st"), t,
      partitionBy = Seq(IcebergInterop.SpecField("ds", "identity", "ds")))
    val src = (1L to 100L).filterNot(_ % 7 == 0)
      .map(i => (i, "d0", "live")).toDF("id", "ds", "st")
    val r = IcebergInterop.mergeApply(src, t, Seq("id"),
      matched = Seq(MergeUpdate()),
      notMatched = Seq(MergeInsert()),
      notMatchedBySource = Seq(MergeDelete(None)),
      scope = Some(col("ds") === "d0"))
    val out = IcebergInterop.read(spark, t)
    out.count() shouldBe (400L - 100L / 7L)
    out.filter($"ds" === "d0" && $"id" % 7 === 0).count() shouldBe 0L
    out.filter($"ds" =!= "d0").count() shouldBe 300L
    r.rowsAffected shouldBe 100L
    // NMBS UPDATE + fullTableMerge: the soft-delete mirror
    val t2 = fresh()
    IcebergInterop.write(
      (1L to 40L).map(i => (i, "live")).toDF("id", "st"), t2)
    IcebergInterop.mergeApply(
      (1L to 20L).map(i => (i, "live")).toDF("id", "st"), t2, Seq("id"),
      matched = Seq(MergeUpdate()),
      notMatchedBySource = Seq(MergeUpdate(None,
        Some(Seq("st" -> lit("gone"))))),
      fullTableMerge = true)
    val m = IcebergInterop.read(spark, t2)
    m.count() shouldBe 40L
    m.filter($"st" === "gone").count() shouldBe 20L
    // refusals
    spark.conf.set(ManifestLake.NmbsSmallTableBytesConf, "0")
    try {
      intercept[IllegalArgumentException] {
        IcebergInterop.mergeApply(src, t, Seq("id"),
          matched = Nil, notMatchedBySource = Seq(MergeDelete(None)))
      }.getMessage should include("fullTableMerge")
    } finally spark.conf.unset(ManifestLake.NmbsSmallTableBytesConf)
    intercept[IllegalArgumentException] {
      IcebergInterop.mergeApply(src, t, Seq("id"),
        matched = Nil,
        notMatchedBySource = Seq(MergeUpdate(None, None)),
        scope = Some(col("ds") === "d0"))
    }.getMessage should include("explicit")
  }

  test("clause MERGE on a COLUMN-MAPPED Delta table: assignments " +
    "address logical names, staged files keep physical ones") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 30L).map(i => (s"g${i % 3}", i, i * 1.0))
        .toDF("g", "id", "v"), t, partitionBy = Seq("g"),
      columnMapping = "name")
    DeltaInterop.mergeApply(
      Seq((3L, "del", 0.0), (4L, "upd", 100.0), (99L, "ins", 9.0))
        .toDF("id", "op", "nv"), t, Seq("id"),
      matched = Seq(
        MergeDelete(Some(mergeSrcCol("op") === "del")),
        MergeUpdate(Some(mergeSrcCol("op") === "upd"),
          Some(Seq("v" -> mergeSrcCol("nv"))))),
      notMatched = Seq(MergeInsert(Some(mergeSrcCol("op") === "ins"),
        Some(Seq("id" -> mergeSrcCol("id"), "g" -> lit("g0"),
          "v" -> mergeSrcCol("nv"))))))
    val out = DeltaInterop.read(spark, t)
    out.count() shouldBe 30L
    out.filter($"id" === 3L).count() shouldBe 0L
    out.filter($"id" === 4L).select($"v").as[Double].head() shouldBe 100.0
    out.filter($"id" === 99L).select($"g").as[String].head() shouldBe "g0"
    // every live data file still stores physical col-… names
    val st = DeltaInterop.state(spark, t, None)
    st.columnMappingMode shouldBe "name"
    st.files should not be empty
    st.files.foreach { a =>
      spark.read.parquet(new Path(t, a.path).toString)
        .columns.foreach(_ should startWith("col-"))
    }
  }

  test("clause MERGE on a FORMAT-V2 Iceberg table: the rewrite commits " +
    "at the next sequence number, survivors keep theirs") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 20L).map(i => (i, i * 1.0))
      .toDF("id", "v"), t)
    IcebergInterop.upgradeFormat(spark, t)
    IcebergInterop.write((21L to 40L).map(i => (i, i * 1.0))
      .toDF("id", "v"), t) // seq 1
    val r = IcebergInterop.mergeApply(
      Seq((25L, "upd", 100.0), (26L, "del", 0.0))
        .toDF("id", "op", "nv"), t, Seq("id"),
      matched = Seq(
        MergeUpdate(Some(mergeSrcCol("op") === "upd"),
          Some(Seq("v" -> mergeSrcCol("nv")))),
        MergeDelete(Some(mergeSrcCol("op") === "del"))))
    r.rowsAffected shouldBe 2L
    val out = IcebergInterop.read(spark, t)
    out.count() shouldBe 39L
    out.filter($"id" === 25L).select($"v").as[Double].head() shouldBe 100.0
    out.filter($"id" === 26L).count() shouldBe 0L
    // first write's files keep their ORIGINAL sequence number; the
    // rewrite's adds take a later one
    val st = IcebergInterop.state(spark, t, None)
    st.formatVersion shouldBe 2
    val untouched = st.files.filter(_.seq == 0L)
    untouched should not be empty
    st.files.map(_.seq).max should be >= 2L
  }

  test("SQL clause MERGE on graft_delta: conditional update/delete, " +
    "column-list insert, ON-conjunct scope drives NMBS, and the " +
    "whole-table conf gates the unscoped sync") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 200L).map(i => (s"d${(i - 1) / 100}", i, i * 1.0, "live"))
        .toDF("ds", "id", "v", "st"), t, partitionBy = Seq("ds"))
    DeltaSql.register("mc_t", t)
    Seq(("d0", 1L, "del", 0.0), ("d0", 2L, "upd", 100.0),
      ("d0", 300L, "ins", 3.0))
      .toDF("ds", "id", "op", "nv").createOrReplaceTempView("mc_src")
    try {
      spark.sql(
        """MERGE INTO graft_delta.mc_t AS t
          |USING mc_src AS s ON t.id = s.id
          |WHEN MATCHED AND s.op = 'del' THEN DELETE
          |WHEN MATCHED AND s.op = 'upd' THEN UPDATE SET v = s.nv + t.v
          |WHEN NOT MATCHED AND s.op = 'ins' THEN
          |  INSERT (ds, id, v, st) VALUES (s.ds, s.id, s.nv, 'new')
          |""".stripMargin)
      val out = DeltaInterop.read(spark, t)
      out.count() shouldBe 200L
      out.filter($"id" === 1L).count() shouldBe 0L
      out.filter($"id" === 2L).select($"v").as[Double].head() shouldBe 102.0
      out.filter($"id" === 300L).select($"st").as[String]
        .head() shouldBe "new"
      // NMBS through the ON-conjunct scope: mirror d0 to {2,300}
      spark.sql(
        """MERGE INTO graft_delta.mc_t AS t
          |USING mc_src AS s ON t.id = s.id AND t.ds = 'd0'
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED BY SOURCE THEN DELETE
          |""".stripMargin)
      val synced = DeltaInterop.read(spark, t)
      synced.filter($"ds" === "d0").count() shouldBe 2L
      synced.filter($"ds" === "d1").count() shouldBe 100L
      // unscoped NMBS: refused without the conf, runs with it
      spark.conf.set(ManifestLake.NmbsSmallTableBytesConf, "0")
      try {
        intercept[IllegalArgumentException] {
          spark.sql(
            """MERGE INTO graft_delta.mc_t AS t
              |USING mc_src AS s ON t.id = s.id
              |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
        }.getMessage should include("fullTableMerge")
        spark.conf.set(LakeSql.FullTableMergeConf, "true")
        try spark.sql(
          """MERGE INTO graft_delta.mc_t AS t
            |USING mc_src AS s ON t.id = s.id
            |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
        finally spark.conf.unset(LakeSql.FullTableMergeConf)
        DeltaInterop.read(spark, t).count() shouldBe 2L
      } finally spark.conf.unset(ManifestLake.NmbsSmallTableBytesConf)
    } finally {
      DeltaSql.unregister("mc_t")
      spark.catalog.dropTempView("mc_src"): Unit
    }
  }

  test("SQL clause MERGE on graft_iceberg: conditional update/delete, " +
    "column-list insert and the scoped NMBS sync") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 200L).map(i => (i, s"d${(i - 1) / 100}", i * 1.0))
        .toDF("id", "ds", "v"), t,
      partitionBy = Seq(IcebergInterop.SpecField("ds", "identity", "ds")))
    IcebergSql.register("mc_ice_t", t)
    Seq((1L, "d0", "del", 0.0), (2L, "d0", "upd", 100.0),
      (300L, "d0", "ins", 3.0))
      .toDF("id", "ds", "op", "nv").createOrReplaceTempView("mc_ice_src")
    try {
      spark.sql(
        """MERGE INTO graft_iceberg.mc_ice_t AS t
          |USING mc_ice_src AS s ON t.id = s.id
          |WHEN MATCHED AND s.op = 'del' THEN DELETE
          |WHEN MATCHED AND s.op = 'upd' THEN UPDATE SET v = s.nv + t.v
          |WHEN NOT MATCHED AND s.op = 'ins' THEN
          |  INSERT (id, ds, v) VALUES (s.id, s.ds, s.nv)
          |""".stripMargin)
      val out = IcebergInterop.read(spark, t)
      out.count() shouldBe 200L
      out.filter($"id" === 1L).count() shouldBe 0L
      out.filter($"id" === 2L).select($"v").as[Double].head() shouldBe 102.0
      out.filter($"id" === 300L).select($"ds").as[String]
        .head() shouldBe "d0"
      spark.sql(
        """MERGE INTO graft_iceberg.mc_ice_t AS t
          |USING mc_ice_src AS s ON t.id = s.id AND t.ds = 'd0'
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED BY SOURCE THEN DELETE
          |""".stripMargin)
      val synced = IcebergInterop.read(spark, t)
      synced.filter($"ds" === "d0").count() shouldBe 2L
      synced.filter($"ds" === "d1").count() shouldBe 100L
    } finally {
      IcebergSql.unregister("mc_ice_t")
      spark.catalog.dropTempView("mc_ice_src"): Unit
    }
  }
}
