package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins Iceberg BRANCHES AND TAGS (the `refs` metadata map): create /
  * move / drop as metadata-only publications, time travel by ref name
  * (API and SQL `VERSION AS OF 'tag'`), the implicit `main` branch,
  * the `$refs` metadata table, FOREIGN hand-edited refs resolving the
  * same way, and snapshot expiry keeping every ref-reachable snapshot
  * alive regardless of age. */
class IcebergRefsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-ice-refs").toString + "/t"

  test("tags and branches: create, resolve, read by name, $refs " +
    "table, implicit main, move and drop") {
    import spark.implicits._
    val t = fresh()
    val s1 = IcebergInterop.write(
      (1L to 10L).map(i => (i, i)).toDF("id", "v"), t)
    IcebergInterop.createRef(spark, t, "v1.0", "tag")
    val s2 = IcebergInterop.write(
      (11L to 20L).map(i => (i, i)).toDF("id", "v"), t)
    // implicit main follows the head; the tag stays pinned
    val r = IcebergInterop.refs(spark, t)
    r("v1.0") shouldBe (s1 -> "tag")
    r("main") shouldBe (s2 -> "branch")
    IcebergInterop.readRef(spark, t, "v1.0").count() shouldBe 10L
    IcebergInterop.readRef(spark, t, "main").count() shouldBe 20L
    // SQL: VERSION AS OF a tag name, and the $refs metadata table
    IcebergSql.register("refs_t", t)
    spark.sql(
      "SELECT count(*) AS n FROM graft_iceberg.refs_t VERSION AS OF 'v1.0'")
      .as[Long].head() shouldBe 10L
    spark.sql(s"SELECT count(*) AS n FROM graft_iceberg.refs_t " +
      s"VERSION AS OF $s1").as[Long].head() shouldBe 10L
    val refRows = spark.sql(
      "SELECT name, snapshot_id, type FROM graft_iceberg.`refs_t$refs` " +
        "ORDER BY name")
      .collect().map(r0 => (r0.getString(0), r0.getLong(1), r0.getString(2)))
    refRows should contain("v1.0", s1, "tag")
    refRows should contain("main", s2, "branch")
    // a branch, moved, then dropped
    IcebergInterop.createRef(spark, t, "audit", "branch", Some(s1))
    IcebergInterop.resolveRef(spark, t, "audit") shouldBe s1
    IcebergInterop.createRef(spark, t, "audit", "branch", Some(s2))
    IcebergInterop.resolveRef(spark, t, "audit") shouldBe s2
    IcebergInterop.dropRef(spark, t, "audit")
    intercept[IllegalArgumentException] {
      IcebergInterop.resolveRef(spark, t, "audit")
    }.getMessage should include("no branch or tag")
    // a DECLARED main follows every head move — including a rollback
    IcebergInterop.createRef(spark, t, "main", "branch")
    IcebergInterop.resolveRef(spark, t, "main") shouldBe s2
    IcebergInterop.rollbackTo(spark, t, s1)
    IcebergInterop.resolveRef(spark, t, "main") shouldBe s1
    IcebergInterop.readRef(spark, t, "main").count() shouldBe 10L
  }

  test("refusals by name: unknown refs list what exists, main cannot " +
    "drop or become a tag, a ref cannot name an unretained snapshot") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(Seq((1L, 1L)).toDF("id", "v"), t)
    intercept[IllegalArgumentException] {
      IcebergInterop.readRef(spark, t, "nope")
    }.getMessage should include("main")
    intercept[IllegalArgumentException] {
      IcebergInterop.dropRef(spark, t, "main")
    }
    intercept[IllegalArgumentException] {
      IcebergInterop.createRef(spark, t, "main", "tag")
    }
    intercept[IllegalArgumentException] {
      IcebergInterop.createRef(spark, t, "ghost", "tag", Some(12345L))
    }.getMessage should include("not retained")
    // re-pointing main AWAY from the head would split `VERSION AS OF
    // 'main'` from a bare read — refused toward rollbackToSnapshot
    // (declaring main AT the head stays legal, pinned above)
    val s1 = IcebergInterop.resolveRef(spark, t, "main")
    IcebergInterop.write(Seq((2L, 2L)).toDF("id", "v"), t)
    intercept[IllegalArgumentException] {
      IcebergInterop.createRef(spark, t, "main", "branch", Some(s1))
    }.getMessage should include("rollbackToSnapshot")
  }

  test("FOREIGN refs: a hand-edited metadata refs map resolves the " +
    "same as writer-created ones") {
    import spark.implicits._
    val t = fresh()
    val s1 = IcebergInterop.write(
      (1L to 5L).map(i => (i, i)).toDF("id", "v"), t)
    IcebergInterop.write((6L to 9L).map(i => (i, i)).toDF("id", "v"), t)
    // splice a refs map in by hand, as a foreign writer would
    val metaDir = new Path(t, "metadata")
    val fs = metaDir.getFileSystem(spark.sessionState.newHadoopConf())
    val vHint = new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(
        fs.open(new Path(metaDir, "version-hint.text"))),
      StandardCharsets.UTF_8).trim.toLong
    val metaPath = new Path(metaDir, s"v$vHint.metadata.json")
    val text = {
      val in = fs.open(metaPath)
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        new String(out.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
    }
    val spliced = text.replaceFirst("\\{",
      s"""{"refs":{"rel-1":{"snapshot-id":$s1,"type":"tag"}},""")
    val out = fs.create(metaPath, true)
    try out.write(spliced.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    IcebergInterop.refs(spark, t)("rel-1") shouldBe (s1 -> "tag")
    IcebergInterop.readRef(spark, t, "rel-1").count() shouldBe 5L
  }

  test("expireSnapshots keeps ref-reachable snapshots alive; " +
    "dropping the ref releases them to the next expiry") {
    import spark.implicits._
    val t = fresh()
    val s1 = IcebergInterop.write(
      (1L to 10L).map(i => (i, i)).toDF("id", "v"), t)
    IcebergInterop.createRef(spark, t, "pin", "tag", Some(s1))
    IcebergInterop.write((11L to 20L).map(i => (i, i)).toDF("id", "v"), t)
    IcebergInterop.write((21L to 30L).map(i => (i, i)).toDF("id", "v"), t)
    // keepLast=1 would drop s1 by age — the tag keeps it
    IcebergInterop.expireSnapshots(spark, t, keepLast = 1)
    IcebergInterop.snapshotLineage(spark, t) should contain(s1)
    IcebergInterop.readRef(spark, t, "pin").count() shouldBe 10L
    // head still serves
    IcebergInterop.read(spark, t).count() shouldBe 30L
    // drop the tag: the next expiry retires the snapshot
    IcebergInterop.dropRef(spark, t, "pin")
    IcebergInterop.expireSnapshots(spark, t, keepLast = 1)
    IcebergInterop.snapshotLineage(spark, t) should not contain s1
    intercept[Exception] {
      IcebergInterop.readSnapshot(spark, t, s1).count()
    }
  }
}
