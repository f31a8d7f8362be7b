package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the lake's schema-evolution contract: the manifest records the
  * table schema per commit, add-column appends widen it (old files read
  * the new column as null — consistently, whatever file a row lives
  * in), retyping/dropping raises the named error, and merges align an
  * evolved update set across touched and untouched files alike. */
class SchemaEvolutionSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft-mlake-ev").toString + "/t"

  private def v1Rows = {
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, s"payload_$i")).toDF("id", "payload")
  }

  private def v2Rows = {
    import spark.implicits._
    (101 to 120).map(i => (i.toLong, s"payload_$i", i * 1.5))
      .toDF("id", "payload", "score")
  }

  test("an add-column append widens the table; old files serve the new " +
    "column as null; time travel reads the old shape") {
    val t = freshTable()
    ManifestLake.write(v1Rows, t)
    ManifestLake.write(v2Rows, t)
    val head = ManifestLake.read(spark, t)
    head.columns.toSeq shouldBe Seq("id", "payload", "score")
    head.count() shouldBe 120
    // every v1 row reads score as null, every v2 row its value —
    // regardless of which physical file serves it
    head.filter(col("id") <= 100 && col("score").isNull).count() shouldBe 100
    head.filter(col("id") > 100 && col("score").isNotNull).count() shouldBe 20
    head.agg(sum("score")).collect().head.getDouble(0) shouldBe
      (101 to 120).map(_ * 1.5).sum
    // the old snapshot still has the old schema
    ManifestLake.read(spark, t, Some(1L)).columns.toSeq shouldBe
      Seq("id", "payload")
  }

  test("retyping or dropping a column is rejected with the named error; " +
    "an overwrite may reshape freely") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.write(v1Rows, t)
    val retyped = (1 to 5).map(i => (s"$i", s"p$i")).toDF("id", "payload")
    val e1 = intercept[ManifestLake.SchemaEvolutionException] {
      ManifestLake.write(retyped, t)
    }
    e1.getMessage should (include("retypes column 'id'") and
      include("bigint") and include("string"))
    val dropped = (1 to 5).map(i => i.toLong).toDF("id")
    intercept[ManifestLake.SchemaEvolutionException] {
      ManifestLake.write(dropped, t)
    }.getMessage should include("drops column 'payload'")
    // nothing committed by the failed appends
    ManifestLake.currentVersion(spark, t) shouldBe Some(1L)
    // overwrite defines the schema afresh
    ManifestLake.write(retyped, t, append = false)
    ManifestLake.read(spark, t).schema("id").dataType.catalogString shouldBe
      "string"
  }

  test("a merge with an evolved update set widens touched and untouched " +
    "files consistently") {
    import spark.implicits._
    val t = freshTable()
    // two files so the merge leaves one untouched (carried verbatim)
    ManifestLake.writeClustered(v1Rows, t, "id", nFiles = 2)
    val updates = (1 to 10).map(i =>
      (i.toLong, s"updated_$i", i * 2.0)).toDF("id", "payload", "score")
    ManifestLake.merge(updates, t, Seq("id"), statsCol = Some("id"))
    val merged = ManifestLake.read(spark, t)
    merged.columns.toSeq shouldBe Seq("id", "payload", "score")
    merged.count() shouldBe 100
    // updated rows carry their score; every other row — whether its file
    // was rewritten (survivors of the touched low file) or carried
    // verbatim (the untouched high file) — reads null
    merged.filter(col("id") <= 10)
      .agg(sum("score")).collect().head.getDouble(0) shouldBe
      (1 to 10).map(_ * 2.0).sum
    merged.filter(col("id") > 10 && col("score").isNotNull)
      .count() shouldBe 0
    merged.filter(col("payload").startsWith("updated")).count() shouldBe 10
    // a merge whose updates DROP a column is the same named error
    val narrow = (1 to 3).map(i => (i.toLong, s"x$i")).toDF("id", "payload")
    intercept[ManifestLake.SchemaEvolutionException] {
      ManifestLake.merge(narrow, t, Seq("id"))
    }.getMessage should include("drops column 'score'")
  }

  test("evolution composes with Hive partitioning: the declared-schema " +
    "read still reconstructs partition columns and backfills the added " +
    "one") {
    import spark.implicits._
    val t = freshTable()
    val v1 = (1 to 60).map(i => (i.toLong, s"p$i", i % 3))
      .toDF("id", "payload", "bucket")
    ManifestLake.write(v1, t, partitionBy = Seq("bucket"))
    val v2 = (61 to 80).map(i => (i.toLong, s"p$i", i % 3, i * 1.5))
      .toDF("id", "payload", "bucket", "score")
    ManifestLake.write(v2, t, partitionBy = Seq("bucket"))
    val head = ManifestLake.read(spark, t)
    head.count() shouldBe 80
    head.columns.toSet shouldBe Set("id", "payload", "bucket", "score")
    // partition column reconstructed from paths for old and new files
    head.groupBy("bucket").count().collect().map(_.getLong(1)).sum shouldBe 80
    head.filter(col("id") <= 60 && col("score").isNull).count() shouldBe 60
    head.filter(col("id") > 60 && col("score").isNotNull).count() shouldBe 20
    // partition pruning still works on the evolved table
    ManifestLake.readPruned(spark, t, Map("bucket" -> "1"))
      .count() shouldBe v1.filter(col("bucket") === 1).count() +
      v2.filter(col("bucket") === 1).count()
  }

  test("addColumns is a metadata-only commit: same files, widened " +
    "schema, nulls everywhere until data arrives") {
    import org.apache.spark.sql.types.{DoubleType, StructField}
    val t = freshTable()
    ManifestLake.write(v1Rows, t)
    val before = ManifestLake.snapshot(spark, t)
    val v = ManifestLake.addColumns(spark, t,
      Seq(StructField("score", DoubleType)))
    v shouldBe 2L
    val after = ManifestLake.snapshot(spark, t)
    after.files shouldBe before.files // NO data was touched
    val head = ManifestLake.read(spark, t)
    head.columns.toSeq shouldBe Seq("id", "payload", "score")
    head.filter(col("score").isNotNull).count() shouldBe 0
    // the first append CARRYING the column is an ordinary evolved append
    ManifestLake.write(v2Rows, t)
    ManifestLake.read(spark, t)
      .filter(col("score").isNotNull).count() shouldBe 20
    // duplicate names raise the named error
    intercept[ManifestLake.SchemaEvolutionException] {
      ManifestLake.addColumns(spark, t,
        Seq(StructField("payload", DoubleType)))
    }.getMessage should include("already exists")
  }

  test("TIMESTAMP AS OF resolves the latest version at or before the " +
    "timestamp via the recorded commit clock") {
    val t = freshTable()
    val prevClock = ManifestLake.clock
    try {
      ManifestLake.clock = () => 1000L
      ManifestLake.write(v1Rows, t) // v1 @ 1000
      ManifestLake.clock = () => 2000L
      ManifestLake.write(v2Rows, t) // v2 @ 2000
      ManifestLake.clock = () => 3000L
      ManifestLake.delete(spark, t, col("id") <= 10) // v3 @ 3000
      ManifestLake.versionAsOf(spark, t, 1500L) shouldBe 1L
      ManifestLake.versionAsOf(spark, t, 2000L) shouldBe 2L
      ManifestLake.versionAsOf(spark, t, 99999L) shouldBe 3L
      ManifestLake.readAsOf(spark, t, 2500L).count() shouldBe 120
      intercept[IllegalArgumentException] {
        ManifestLake.versionAsOf(spark, t, 500L)
      }.getMessage should include("predates the first retained commit")
      // history surfaces the commit clock
      ManifestLake.history(spark, t).select("commit_ts_ms").collect()
        .map(_.getLong(0)).toSeq shouldBe Seq(1000L, 2000L, 3000L)
      // time-based retention: everything committed at or before 2000
      // ages out (the head would survive regardless)
      ManifestLake.vacuumOlderThan(spark, t, 2000L)
      ManifestLake.versions(spark, t) shouldBe Seq(3L)
      ManifestLake.read(spark, t).count() shouldBe 110
      intercept[Exception] {
        ManifestLake.read(spark, t, Some(1L)).collect()
      } // vacuumed version gone, per the retention contract
    } finally ManifestLake.clock = prevClock
  }

  test("an append to a LEGACY table (no recorded schema) derives the " +
    "base from its files: a narrowing append is rejected, not silently " +
    "recorded as the table schema") {
    import spark.implicits._
    val t = freshTable()
    // fabricate a legacy commit: data files on disk, manifest with no
    // #schema= header — the pre-evolution log format
    val path = new org.apache.hadoop.fs.Path(t)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    v1Rows.coalesce(1).write.parquet(s"$t/legacy")
    val file = fs.listStatus(new org.apache.hadoop.fs.Path(s"$t/legacy"))
      .map(_.getPath.getName).find(_.endsWith(".parquet")).get
    ManifestLake.commitLog(fs, path, full = true,
      adds = Seq(s"legacy/$file"), removes = Nil, prev = None)
    ManifestLake.snapshot(spark, t).schema shouldBe None
    // an append that DROPS a column must raise, exactly as it would
    // against a recorded schema — otherwise the narrower schema would
    // be recorded and 'payload' would vanish from every older file
    val narrower = (200 to 205).map(_.toLong).toDF("id")
    intercept[ManifestLake.SchemaEvolutionException] {
      ManifestLake.write(narrower, t)
    }.getMessage should include("drops column 'payload'")
    // a matching append works and records the file-derived schema
    ManifestLake.write(
      (200 to 205).map(i => (i.toLong, s"payload_$i")).toDF("id", "payload"),
      t)
    val head = ManifestLake.read(spark, t)
    head.columns.toSeq shouldBe Seq("id", "payload")
    head.count() shouldBe 106
  }

  test("deletes and compactions carry the evolved schema forward") {
    val t = freshTable()
    ManifestLake.write(v1Rows, t)
    ManifestLake.write(v2Rows, t)
    ManifestLake.delete(spark, t, col("id") <= 50)
    val afterDelete = ManifestLake.read(spark, t)
    afterDelete.columns.toSeq shouldBe Seq("id", "payload", "score")
    afterDelete.count() shouldBe 70
    ManifestLake.compact(spark, t)
    val afterCompact = ManifestLake.read(spark, t)
    afterCompact.columns.toSeq shouldBe Seq("id", "payload", "score")
    afterCompact.filter(col("score").isNotNull).count() shouldBe 20
  }
}
