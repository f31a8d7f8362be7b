package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins [[ManifestLake.changeFeed]]: per-version row-level diffs
  * derived from each commit's OWN changed files — appends are pure
  * inserts, deletes emit only the removed rows (survivors of rewritten
  * files cancel, untouched files never enter the diff), an update is a
  * delete + insert pair, and a mid-range overwrite raises the named
  * contract error. */
class ChangeFeedSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft-cdc").toString + "/t"

  private def rows(n: Range) = {
    import spark.implicits._
    n.map(i => (i.toLong, s"payload_$i")).toDF("id", "payload")
  }

  private def feed(t: String, from: Long, to: Long) =
    ManifestLake.changeFeed(spark, t, from, to)
      .select("_change_type", "_commit_version", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("appends are inserts, deletes emit removed rows only, and the " +
    "initial version is the initial data") {
    val t = freshTable()
    ManifestLake.write(rows(1 to 20).coalesce(1), t) // v1
    ManifestLake.write(rows(21 to 30).coalesce(1), t) // v2 append
    ManifestLake.delete(spark, t, col("id") <= 5) // v3 rewrite
    feed(t, 0, 1) shouldBe (1 to 20).map(i => ("insert", 1L, i.toLong)).toSet
    feed(t, 1, 2) shouldBe (21 to 30).map(i => ("insert", 2L, i.toLong)).toSet
    // v3 rewrote the v1 file: deleted rows emit as deletes; survivors
    // (6-20, rewritten verbatim) cancel; the untouched v2 file's rows
    // never appear
    feed(t, 2, 3) shouldBe (1 to 5).map(i => ("delete", 3L, i.toLong)).toSet
    // the full range is the concatenation of the per-version diffs
    feed(t, 0, 3).size shouldBe 20 + 10 + 5
  }

  test("an update through merge is a delete + insert pair of the same " +
    "key; verbatim survivors cancel") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.writeClustered(
      (1 to 1000).map(i => (i.toLong, s"p$i")).toDF("id", "payload"),
      t, "id", nFiles = 4)
    val updates = Seq((7L, "updated_7"), (2000L, "new_2000"))
      .toDF("id", "payload")
    ManifestLake.merge(updates, t, Seq("id"), statsCol = Some("id"))
    val changes = ManifestLake.changeFeed(spark, t, 1, 2)
      .select("_change_type", "id", "payload")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    changes shouldBe Set(
      ("delete", 7L, "p7"), // the old image of the matched row
      ("insert", 7L, "updated_7"), // its replacement
      ("insert", 2000L, "new_2000")) // the unmatched insert
  }

  test("a mid-range overwrite raises the named contract error; feeding " +
    "after it works") {
    val t = freshTable()
    ManifestLake.write(rows(1 to 10), t)
    ManifestLake.write(rows(100 to 105).coalesce(1), t, append = false) // v2 base
    ManifestLake.write(rows(200 to 202).coalesce(1), t) // v3 append
    intercept[UnsupportedOperationException] {
      ManifestLake.changeFeed(spark, t, 1, 3).collect()
    }.getMessage should include("not row-diffable")
    feed(t, 2, 3) shouldBe
      (200 to 202).map(i => ("insert", 3L, i.toLong)).toSet
  }

  test("recorded change files serve the feed verbatim — operation-log " +
    "semantics, overwrite coverage, and vacuum collects them with " +
    "their version") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.writeClustered(
      (1 to 1000).map(i => (i.toLong, s"p$i")).toDF("id", "payload"),
      t, "id", nFiles = 4)
    ManifestLake.merge(
      Seq((7L, "updated_7"), (2000L, "new_2000")).toDF("id", "payload"),
      t, Seq("id"), statsCol = Some("id"), recordChangeFeed = true)
    ManifestLake.delete(spark, t, col("id") <= 3, recordChangeFeed = true)
    // v2 (merge) and v3 (delete) both carry recorded sidecars
    ManifestLake.changesBetween(spark, t, 1, 3)
      .map(_.changeFiles.nonEmpty) shouldBe Seq(true, true)
    val changes = ManifestLake.changeFeed(spark, t, 1, 3)
      .select("_change_type", "_commit_version", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    changes shouldBe Set(
      ("delete", 2L, 7L), ("insert", 2L, 7L), ("insert", 2L, 2000L),
      ("delete", 3L, 1L), ("delete", 3L, 2L), ("delete", 3L, 3L))
    // a recorded merge over IDENTICAL content still emits its pair —
    // the operation log, not the net diff
    ManifestLake.merge(Seq((9L, "p9")).toDF("id", "payload"), t,
      Seq("id"), statsCol = Some("id"), recordChangeFeed = true)
    ManifestLake.changeFeed(spark, t, 3, 4)
      .select("_change_type").collect().map(_.getString(0))
      .sorted shouldBe Array("delete", "insert")
    // vacuum drops the aged versions' change files with their manifests
    val (fs, p) = (new org.apache.hadoop.fs.Path(t).getFileSystem(
      spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(t))
    fs.listStatus(new org.apache.hadoop.fs.Path(p, "_changes"))
      .length should be >= 3
    ManifestLake.vacuum(spark, t, keepLast = 1)
    // only the RETAINED version's sidecars survive (v4, the last merge)
    val left = fs.listStatus(new org.apache.hadoop.fs.Path(p, "_changes"))
      .map(_.getPath.getName)
    left should not be empty
    all(left) should startWith("v00000004-")
  }

  test("schema evolution across the feed range null-fills the added " +
    "column for earlier versions' changes") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.write(rows(1 to 10).coalesce(1), t) // v1: (id, payload)
    ManifestLake.write(
      (11 to 15).map(i => (i.toLong, s"p$i", i * 1.5))
        .toDF("id", "payload", "score").coalesce(1), t) // v2: + score
    val all = ManifestLake.changeFeed(spark, t, 0, 2)
    all.columns should contain("score")
    all.filter(col("_commit_version") === 1 &&
      col("score").isNotNull).count() shouldBe 0
    all.filter(col("_commit_version") === 2 &&
      col("score").isNotNull).count() shouldBe 5
  }
}
