package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the format-version-2 WRITE path: the metadata-only v1→v2
  * upgrade, sequence-numbered v2 commits (manifest lists under the
  * spec's required v2 schema with counts), merge-on-read position
  * deletes written by [[IcebergInterop.deleteMor]], the spec's
  * sequence rule (a later re-insert survives an earlier delete),
  * copy-on-write DML on v2 tables, and compaction retiring the
  * merge-on-read debt. */
class IcebergV2Spec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-ice-v2").toString + "/t"

  private def metaText(t: String): String = {
    val metaDir = new Path(t, "metadata")
    val fs = metaDir.getFileSystem(spark.sessionState.newHadoopConf())
    val v = fs.listStatus(metaDir).map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+\\.metadata\\.json") =>
        n.stripPrefix("v").stripSuffix(".metadata.json").toLong }.max
    val in = fs.open(new Path(metaDir, s"v$v.metadata.json"))
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  test("upgradeFormat rewrites metadata only: v2 fields land, reads " +
    "are identical, re-upgrading is a no-op, and the next append " +
    "takes sequence number 1") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 30L).map(i => (i, i)).toDF("id", "v"), t)
    val filesBefore = IcebergInterop.state(spark, t, None)
      .files.map(_.path).toSet
    IcebergInterop.upgradeFormat(spark, t)
    val st = IcebergInterop.state(spark, t, None)
    st.formatVersion shouldBe 2
    st.files.map(_.path).toSet shouldBe filesBefore
    IcebergInterop.read(spark, t).count() shouldBe 30L
    val m = metaText(t)
    m should include(""""format-version":2""")
    m should include(""""last-sequence-number"""")
    m should include(""""sort-orders"""")
    val v = IcebergInterop.upgradeFormat(spark, t)
    IcebergInterop.upgradeFormat(spark, t) shouldBe v // no-op
    // the next append publishes a sequence-numbered v2 snapshot;
    // pre-upgrade files keep inherited sequence 0
    IcebergInterop.write(Seq((31L, 31L)).toDF("id", "v"), t)
    val st2 = IcebergInterop.state(spark, t, None)
    st2.files.filter(f => filesBefore(f.path)).foreach(_.seq shouldBe 0L)
    st2.files.filterNot(f => filesBefore(f.path)).foreach(_.seq shouldBe 1L)
    metaText(t) should include(""""last-sequence-number":1""")
    IcebergInterop.read(spark, t).count() shouldBe 31L
  }

  test("deleteMor writes position deletes: data files untouched, " +
    "reads exclude, re-deleting dead rows is a no-op, and a LATER " +
    "re-insert survives the earlier delete (the sequence rule)") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 40L).map(i => (i, i)).toDF("id", "v"), t)
    IcebergInterop.upgradeFormat(spark, t)
    val before = IcebergInterop.state(spark, t, None).files.map(_.path).toSet
    val r = IcebergInterop.deleteMor(spark, t, col("id") <= 10)
    r.rowsAffected shouldBe 10L
    val st = IcebergInterop.state(spark, t, None)
    st.files.map(_.path).toSet shouldBe before // merge-on-read
    st.posDeletes should not be empty
    IcebergInterop.read(spark, t).agg(min($"id")).as[Long]
      .head() shouldBe 11L
    // cumulative second delete; already-dead rows never re-match
    IcebergInterop.deleteMor(spark, t, col("id") <= 15)
      .rowsAffected shouldBe 5L
    IcebergInterop.deleteMor(spark, t, col("id") <= 15)
      .rowsAffected shouldBe 0L
    IcebergInterop.read(spark, t).count() shouldBe 25L
    // a LATER append re-inserts deleted keys: its files carry a
    // HIGHER data sequence than the deletes, so the rows survive
    IcebergInterop.write(Seq((3L, 333L)).toDF("id", "v"), t)
    val out = IcebergInterop.read(spark, t)
    out.count() shouldBe 26L
    out.filter($"id" === 3L).select($"v").as[Long].collect() shouldBe
      Array(333L)
  }

  test("copy-on-write DML on a v2 table: sequence bookkeeping " +
    "advances, survivors keep their original data sequences, and " +
    "time travel still serves the pre-DML snapshot") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 20L).map(i => (i, i)).toDF("id", "v"), t)
    IcebergInterop.upgradeFormat(spark, t)
    IcebergInterop.write((21L to 40L).map(i => (i, i)).toDF("id", "v"), t)
    val pre = IcebergInterop.state(spark, t, None)
    IcebergInterop.delete(spark, t, col("id") % 10 === 1)
      .rowsAffected shouldBe 4L
    val st = IcebergInterop.state(spark, t, None)
    // pre-upgrade survivors keep sequence 0, the second append's keep
    // 1, and the rewrite's additions take the new sequence 2
    st.files.map(_.seq).toSet should contain allOf (0L, 1L, 2L)
    IcebergInterop.read(spark, t).count() shouldBe 36L
    IcebergInterop.readSnapshot(spark, t, pre.snapshotId)
      .count() shouldBe 40L
    metaText(t) should include(""""last-sequence-number":2""")
    // upsert MERGE on the v2 table
    IcebergInterop.merge(Seq((2L, 222L), (99L, 990L)).toDF("id", "v"),
      t, Seq("id")).rowsAffected shouldBe 2L
    val out = IcebergInterop.read(spark, t)
    out.filter($"id" === 2L).select($"v").as[Long].head() shouldBe 222L
    out.count() shouldBe 37L
  }

  test("appends CARRY delete manifests on v2 (no more compact-first " +
    "refusal), and compactDeletes retires the merge-on-read debt") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 30L).map(i => (i, i)).toDF("id", "v"), t)
    IcebergInterop.upgradeFormat(spark, t)
    IcebergInterop.deleteMor(spark, t, col("id") <= 5)
    // v2 append carries the delete manifest instead of refusing
    IcebergInterop.write(Seq((100L, 100L)).toDF("id", "v"), t)
    val st = IcebergInterop.state(spark, t, None)
    st.posDeletes should not be empty
    IcebergInterop.read(spark, t).count() shouldBe 26L
    // compaction rewrites the touched files clean
    IcebergInterop.compactDeletes(spark, t)
    val st2 = IcebergInterop.state(spark, t, None)
    st2.posDeletes shouldBe empty
    IcebergInterop.read(spark, t).count() shouldBe 26L
    IcebergInterop.read(spark, t).agg(min($"id")).as[Long]
      .head() shouldBe 6L
  }

  test("updateMor kills old images by position and appends new ones " +
    "in one snapshot: data files untouched, pre-update assignments, " +
    "old snapshot intact") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 30L).map(i => (i, i)).toDF("id", "v"), t)
    IcebergInterop.upgradeFormat(spark, t)
    val pre = IcebergInterop.state(spark, t, None)
    val before = pre.files.map(_.path).toSet
    // swap-shape assignments read the PRE-update row
    val r = IcebergInterop.updateMor(spark, t, col("id") <= 3,
      Seq("v" -> (col("v") + col("id") * 100), "id" -> (col("id") + 50)))
    r.rowsAffected shouldBe 3L
    val st = IcebergInterop.state(spark, t, None)
    before.subsetOf(st.files.map(_.path).toSet) shouldBe true
    st.posDeletes should not be empty
    val out = IcebergInterop.read(spark, t)
    out.count() shouldBe 30L
    out.filter($"id" === 51L).select($"v").as[Long].head() shouldBe 101L
    out.filter($"id" === 1L).count() shouldBe 0L
    // the old snapshot still serves the pre-update rows
    IcebergInterop.readSnapshot(spark, t, pre.snapshotId)
      .filter($"id" === 1L).count() shouldBe 1L
    // a second MOR update over a previously-updated row composes
    IcebergInterop.updateMor(spark, t, col("id") === 51L,
      Seq("v" -> lit(0L))).rowsAffected shouldBe 1L
    IcebergInterop.read(spark, t).filter($"id" === 51L)
      .select($"v").as[Long].head() shouldBe 0L
    IcebergInterop.read(spark, t).count() shouldBe 30L
  }

  test("the SQL surface reaches merge-on-read through the session " +
    "dml-mode conf") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 12L).map(i => (i, i)).toDF("id", "v"), t)
    IcebergInterop.upgradeFormat(spark, t)
    val before = IcebergInterop.state(spark, t, None).files.map(_.path).toSet
    IcebergSql.register("ice_mor_sql", t)
    spark.conf.set(IcebergSql.DmlModeConf, "mor")
    try {
      spark.sql("DELETE FROM graft_iceberg.ice_mor_sql WHERE id <= 2")
      spark.sql(
        "UPDATE graft_iceberg.ice_mor_sql SET v = v * 10 WHERE id = 3")
      val st = IcebergInterop.state(spark, t, None)
      before.subsetOf(st.files.map(_.path).toSet) shouldBe true
      st.posDeletes should not be empty
      spark.sql("SELECT v FROM graft_iceberg.ice_mor_sql WHERE id = 3")
        .as[Long].head() shouldBe 30L
      spark.sql("SELECT count(*) FROM graft_iceberg.ice_mor_sql")
        .as[Long].head() shouldBe 10L
    } finally {
      spark.conf.unset(IcebergSql.DmlModeConf)
      IcebergSql.unregister("ice_mor_sql")
    }
  }

  test("deleteByKeys never reads the table: equality-delete files " +
    "kill matching rows in EARLIER files only, so a same-commit-later " +
    "re-insert of the key survives; mistyped keys refuse") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 20L).map(i => (i, s"p$i")).toDF("id", "payload"), t)
    IcebergInterop.upgradeFormat(spark, t)
    val before = IcebergInterop.state(spark, t, None).files.map(_.path).toSet
    val r = IcebergInterop.deleteByKeys(spark, t,
      Seq(3L, 7L, 999L).toDF("id"))
    r.rowsAffected shouldBe -1L // zero-scan by contract
    val st = IcebergInterop.state(spark, t, None)
    st.files.map(_.path).toSet shouldBe before
    st.eqDeletes should not be empty
    st.eqDeletes.head.cols shouldBe Seq("id")
    val out = IcebergInterop.read(spark, t)
    out.count() shouldBe 18L
    out.filter($"id".isin(3L, 7L)).count() shouldBe 0L
    // a LATER append re-inserts key 3: its file's data sequence
    // exceeds the delete's, so the strictly-smaller rule keeps it
    IcebergInterop.write(Seq((3L, "reborn")).toDF("id", "payload"), t)
    IcebergInterop.read(spark, t).filter($"id" === 3L)
      .select($"payload").as[String].collect() shouldBe Array("reborn")
    // compaction retires the debt
    IcebergInterop.compactDeletes(spark, t)
    val st2 = IcebergInterop.state(spark, t, None)
    st2.eqDeletes shouldBe empty
    IcebergInterop.read(spark, t).count() shouldBe 19L
    // a mistyped key column refuses by name
    intercept[IllegalArgumentException] {
      IcebergInterop.deleteByKeys(spark, t, Seq(1).toDF("id")) // INT
    }.getMessage should include("mistyped")
  }

  test("upsertByKeys is ONE atomic snapshot: old versions die, this " +
    "commit's rows survive their own delete, inserts land, the table " +
    "is never read, and repeated upserts compose") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write(
      (1L to 20L).map(i => (i, i * 10)).toDF("id", "v"), t)
    IcebergInterop.upgradeFormat(spark, t)
    val pre = IcebergInterop.state(spark, t, None)
    val before = pre.files.map(_.path).toSet
    IcebergInterop.upsertByKeys(
      Seq((3L, 333L), (99L, 990L)).toDF("id", "v"), t, Seq("id"))
    val st = IcebergInterop.state(spark, t, None)
    // exactly one snapshot advanced; originals untouched
    before.subsetOf(st.files.map(_.path).toSet) shouldBe true
    st.eqDeletes should not be empty
    val out = IcebergInterop.read(spark, t)
    out.count() shouldBe 21L
    out.filter($"id" === 3L).select($"v").as[Long].collect() shouldBe
      Array(333L)
    out.filter($"id" === 99L).count() shouldBe 1L
    // the pre-upsert snapshot still serves the old version
    IcebergInterop.readSnapshot(spark, t, pre.snapshotId)
      .filter($"id" === 3L).select($"v").as[Long].head() shouldBe 30L
    // a second upsert over the SAME key replaces the first's version
    IcebergInterop.upsertByKeys(Seq((3L, 444L)).toDF("id", "v"),
      t, Seq("id"))
    IcebergInterop.read(spark, t).filter($"id" === 3L)
      .select($"v").as[Long].collect() shouldBe Array(444L)
    IcebergInterop.read(spark, t).count() shouldBe 21L
    // duplicate source keys refuse
    intercept[IllegalArgumentException] {
      IcebergInterop.upsertByKeys(
        Seq((1L, 1L), (1L, 2L)).toDF("id", "v"), t, Seq("id"))
    }.getMessage should include("duplicate")
  }

  test("the streaming replay marker SURVIVES snapshot expiry: the " +
    "high-water mark lives in table properties, so a crash-replay " +
    "after expireSnapshots dropped the stamped snapshot still " +
    "commits nothing twice") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 10L).map(i => (i, i * 10)).toDF("id", "v"), t)
    IcebergInterop.upgradeFormat(spark, t)
    IcebergInterop.upsertBatch(Seq((1L, 111L)).toDF("id", "v"),
      batchId = 0L, t, Seq("id"), appId = "appX") shouldBe true
    IcebergInterop.upsertBatch(Seq((2L, 222L)).toDF("id", "v"),
      batchId = 1L, t, Seq("id"), appId = "appX") shouldBe true
    // expiry drops the stamped snapshots (keep only the head)
    IcebergInterop.expireSnapshots(spark, t, keepLast = 1)
    IcebergInterop.snapshotLineage(spark, t).size shouldBe 1
    IcebergInterop.lastStreamBatch(spark, t, "appX") shouldBe 1L
    // post-expiry crash-replay of batch 1: detected, nothing commits
    val snaps = IcebergInterop.snapshotLineage(spark, t).size
    IcebergInterop.upsertBatch(Seq((2L, 999L)).toDF("id", "v"),
      batchId = 1L, t, Seq("id"), appId = "appX") shouldBe false
    IcebergInterop.snapshotLineage(spark, t).size shouldBe snaps
    IcebergInterop.read(spark, t).filter($"id" === 2L)
      .select($"v").as[Long].head() shouldBe 222L
    // a genuinely new epoch still commits
    IcebergInterop.upsertBatch(Seq((2L, 333L)).toDF("id", "v"),
      batchId = 2L, t, Seq("id"), appId = "appX") shouldBe true
    IcebergInterop.read(spark, t).filter($"id" === 2L)
      .select($"v").as[Long].head() shouldBe 333L
  }

  test("streamUpsert applies each micro-batch exactly once: a " +
    "replayed epoch detects its summary stamp and commits nothing " +
    "twice; two AvailableNow drains over one checkpoint compose") {
    import spark.implicits._
    val t = fresh()
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-ice-stream-src").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ice-stream-ck").toString
    // the table schema must be nullable like the stream's (parquet
    // sources declare nullable columns; required→nullable appends
    // refuse by design)
    val initDir = java.nio.file.Files
      .createTempDirectory("graft-ice-stream-init").toString
    (1L to 10L).map(i => (i, i * 10)).toDF("id", "v")
      .write.mode("overwrite").parquet(initDir)
    IcebergInterop.write(spark.read.parquet(initDir), t)
    IcebergInterop.upgradeFormat(spark, t)
    Seq((3L, 333L), (11L, 110L)).toDF("id", "v")
      .write.parquet(s"$srcDir/b0")
    def drain(): Unit = IcebergInterop.streamUpsert(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, v BIGINT"))
        .parquet(s"$srcDir/*"),
      t, Seq("id"), ckpt).awaitTermination()
    drain()
    val out1 = IcebergInterop.read(spark, t)
    out1.count() shouldBe 11L
    out1.filter($"id" === 3L).select($"v").as[Long].head() shouldBe 333L
    // second drain with NEW data: only the new file commits
    Seq((3L, 444L)).toDF("id", "v").write.parquet(s"$srcDir/b1")
    drain()
    IcebergInterop.read(spark, t).filter($"id" === 3L)
      .select($"v").as[Long].head() shouldBe 444L
    IcebergInterop.read(spark, t).count() shouldBe 11L
    // a crash-replay of an already-committed epoch commits nothing
    val snaps = IcebergInterop.snapshotLineage(spark, t).size
    IcebergInterop.upsertBatch(Seq((3L, 999L)).toDF("id", "v"),
      batchId = 0L, t, Seq("id"), appId = ckpt) shouldBe false
    IcebergInterop.snapshotLineage(spark, t).size shouldBe snaps
    IcebergInterop.read(spark, t).filter($"id" === 3L)
      .select($"v").as[Long].head() shouldBe 444L
  }

  test("streamAppend applies each micro-batch exactly once: the " +
    "first batch creates the table, a second drain appends only the " +
    "new file, and a crash-replayed epoch commits nothing") {
    import spark.implicits._
    val t = fresh()
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-ice-sapp-src").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ice-sapp-ck").toString
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v").write.parquet(s"$srcDir/b0")
    def drain(): Unit = IcebergInterop.streamAppend(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, v BIGINT"))
        .parquet(s"$srcDir/*"),
      t, ckpt).awaitTermination()
    drain()
    IcebergInterop.read(spark, t).count() shouldBe 2L
    Seq((3L, 30L)).toDF("id", "v").write.parquet(s"$srcDir/b1")
    drain()
    IcebergInterop.read(spark, t).count() shouldBe 3L
    IcebergInterop.lastStreamBatch(spark, t, ckpt) should be >= 1L
    // crash-replay of epoch 0: detected via summary stamp + property
    val snaps = IcebergInterop.snapshotLineage(spark, t).size
    IcebergInterop.appendBatch(Seq((1L, 10L)).toDF("id", "v"),
      0L, t, Nil, ckpt) shouldBe false
    IcebergInterop.snapshotLineage(spark, t).size shouldBe snaps
    IcebergInterop.read(spark, t).count() shouldBe 3L
    // the mark survives snapshot EXPIRY (property ledger)
    IcebergInterop.expireSnapshots(spark, t, keepLast = 1)
    IcebergInterop.appendBatch(Seq((1L, 10L)).toDF("id", "v"),
      1L, t, Nil, ckpt) shouldBe false
    IcebergInterop.read(spark, t).count() shouldBe 3L
  }

  test("MOR cross-format: a vectored Delta table converts to Iceberg " +
    "v2 position deletes with every data file shared, and back — " +
    "kill sets survive both directions bit-for-bit") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    // Delta → Iceberg: DVs become position deletes
    val t = fresh()
    DeltaInterop.write(
      (1L to 200L).map(i => (i, s"p$i")).toDF("id", "payload"), t)
    DeltaInterop.delete(spark, t, col("id") % 3 === 0)
    val deltaFiles = DeltaInterop.state(spark, t, None).files
      .map(a => new Path(new Path(t), a.path).toString).toSet
    CrossFormat.deltaToIcebergMor(spark, t)
    val ist = IcebergInterop.state(spark, t, None)
    ist.formatVersion shouldBe 2
    ist.files.map(_.path).toSet shouldBe deltaFiles // shared in place
    ist.posDeletes should not be empty
    val viaIceberg = IcebergInterop.read(spark, t)
    viaIceberg.count() shouldBe (1L to 200L).count(_ % 3 != 0)
    viaIceberg.select($"id").as[Long].collect().sorted shouldBe
      (1L to 200L).filterNot(_ % 3 == 0).toArray
    // re-converting refuses (already Iceberg)
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      CrossFormat.deltaToIcebergMor(spark, t)
    }
    // Iceberg MOR → Delta: position deletes become vectors
    val t2 = fresh()
    IcebergInterop.write(
      (1L to 100L).map(i => (i, i)).toDF("id", "v"), t2)
    IcebergInterop.upgradeFormat(spark, t2)
    IcebergInterop.deleteMor(spark, t2, col("id") <= 40)
    val iceFiles = IcebergInterop.state(spark, t2, None)
      .files.map(f => f.path.replaceFirst(
        "^[A-Za-z][A-Za-z0-9+.-]*:/+", "/")).toSet
    CrossFormat.icebergToDeltaMor(spark, t2)
    val dst = DeltaInterop.state(spark, t2, None)
    dst.files.map(a => new Path(new Path(t2), a.path).toString
      .replaceFirst("^[A-Za-z][A-Za-z0-9+.-]*:/+", "/"))
      .toSet shouldBe iceFiles
    dst.files.count(_.dv.nonEmpty) should be > 0
    val viaDelta = DeltaInterop.read(spark, t2)
    viaDelta.count() shouldBe 60L
    viaDelta.agg(min($"id")).as[Long].head() shouldBe 41L
    // EQUALITY deletes convert too: one provenance scan resolves them
    // to per-file positions, and sequence ordering is honored — a key
    // re-inserted AFTER its delete (upsert) survives the conversion
    val t3 = fresh()
    IcebergInterop.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), t3)
    IcebergInterop.upgradeFormat(spark, t3)
    IcebergInterop.deleteByKeys(spark, t3, Seq(1L, 2L, 3L).toDF("id"))
    IcebergInterop.upsertByKeys(Seq((2L, 222L)).toDF("id", "v"),
      t3, Seq("id"))
    IcebergInterop.state(spark, t3, None).eqDeletes should not be empty
    CrossFormat.icebergToDeltaMor(spark, t3)
    val viaDelta3 = DeltaInterop.read(spark, t3)
    viaDelta3.count() shouldBe 8L // 10 - 3 deleted + 1 re-inserted
    viaDelta3.select($"id").as[Long].collect().sorted shouldBe
      Array(2L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)
    viaDelta3.filter($"id" === 2L).select($"v").as[Long]
      .head() shouldBe 222L
  }

  test("RESTORE and rollback: Delta restores a pre-DML version as a " +
    "new commit (history intact, vectors republished exactly); " +
    "Iceberg rolls the current pointer back metadata-only") {
    import spark.implicits._
    // Delta: write → delete (DV) → update → RESTORE to the vectored
    // version → the vector state of THAT version serves again
    val t = fresh()
    DeltaInterop.write((1L to 40L).map(i => (i, i)).toDF("id", "v"), t)
    DeltaInterop.delete(spark, t, col("id") <= 10) // v1, vectored
    DeltaInterop.update(spark, t, col("id") > 35,
      Seq("v" -> lit(0L))) // v2, rewrites + materializes
    DeltaInterop.restore(spark, t, 1L) shouldBe 3L
    val out = DeltaInterop.read(spark, t)
    out.count() shouldBe 30L
    out.filter($"v" === 0L).count() shouldBe 0L // the update undone
    out.agg(min($"id")).as[Long].head() shouldBe 11L // the delete kept
    // the undone version is still addressable
    DeltaInterop.readVersion(spark, t, 2L)
      .filter($"v" === 0L).count() shouldBe 5L
    // restore to v0: every row returns
    DeltaInterop.restore(spark, t, 0L)
    DeltaInterop.read(spark, t).count() shouldBe 40L
    // Iceberg: rollback moves the pointer without a new snapshot
    val t2 = fresh()
    IcebergInterop.write((1L to 20L).map(i => (i, i)).toDF("id", "v"), t2)
    val s0 = IcebergInterop.state(spark, t2, None).snapshotId
    IcebergInterop.write((21L to 30L).map(i => (i, i)).toDF("id", "v"), t2)
    val snapsBefore = IcebergInterop.snapshotLineage(spark, t2).size
    IcebergInterop.rollbackTo(spark, t2, s0)
    IcebergInterop.read(spark, t2).count() shouldBe 20L
    IcebergInterop.snapshotLineage(spark, t2).size shouldBe
      (snapsBefore + 1) // the log records the rollback, no new snapshot
    intercept[IllegalArgumentException] {
      IcebergInterop.rollbackTo(spark, t2, 12345L)
    }.getMessage should include("not retained")
  }

  test("$history metadata tables serve commit/snapshot lineage " +
    "through SQL for both dialects") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 5L).map(i => (i, i)).toDF("id", "v"), t)
    DeltaInterop.delete(spark, t, col("id") === 1L)
    DeltaSql.register("hist_t", t)
    try {
      val h = spark.sql(
        "SELECT version, operation FROM graft_delta.`hist_t$history` " +
          "ORDER BY version").as[(Long, String)].collect()
      h shouldBe Array((0L, "WRITE"), (1L, "DELETE"))
    } finally DeltaSql.unregister("hist_t")
    val t2 = fresh()
    IcebergInterop.write((1L to 5L).map(i => (i, i)).toDF("id", "v"), t2)
    IcebergInterop.write(Seq((6L, 6L)).toDF("id", "v"), t2)
    IcebergSql.register("hist_i", t2)
    try {
      val h = spark.sql(
        "SELECT operation, is_current FROM " +
          "graft_iceberg.`hist_i$history` ORDER BY timestamp_ms")
        .as[(String, Boolean)].collect()
      h.map(_._1) shouldBe Array("append", "append")
      h.map(_._2) shouldBe Array(false, true)
    } finally IcebergSql.unregister("hist_i")
  }

  test("interop maintenance SQL: OPTIMIZE / VACUUM / DESCRIBE " +
    "HISTORY / RESTORE / REORG PURGE address graft_delta and " +
    "graft_iceberg tables through the delegating parser") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write((1L to 30L).map(i => (i, i)).toDF("id", "v")
      .repartition(4), t)
    DeltaInterop.delete(spark, t, col("id") <= 5)
    DeltaSql.register("maint_d", t)
    try {
      spark.sql("DESCRIBE HISTORY graft_delta.maint_d")
        .select("operation").as[String].collect().sorted shouldBe
        Array("DELETE", "WRITE")
      spark.sql("REORG TABLE graft_delta.maint_d APPLY (PURGE)")
        .collect()
      DeltaInterop.state(spark, t, None).files
        .forall(_.dv.isEmpty) shouldBe true
      spark.sql("OPTIMIZE graft_delta.maint_d").collect()
      spark.sql(
        "RESTORE TABLE graft_delta.maint_d TO VERSION AS OF 0")
        .collect()
      spark.sql("SELECT count(*) FROM graft_delta.maint_d")
        .as[Long].head() shouldBe 30L
      spark.sql("VACUUM graft_delta.maint_d RETAIN 1 VERSIONS")
        .collect()
    } finally DeltaSql.unregister("maint_d")
    val t2 = fresh()
    IcebergInterop.write((1L to 20L).map(i => (i, i)).toDF("id", "v"), t2)
    val s0 = IcebergInterop.state(spark, t2, None).snapshotId
    IcebergInterop.write(Seq((21L, 21L)).toDF("id", "v"), t2)
    IcebergSql.register("maint_i", t2)
    try {
      spark.sql("DESCRIBE HISTORY graft_iceberg.maint_i")
        .count() shouldBe 2L
      spark.sql(
        s"RESTORE TABLE graft_iceberg.maint_i TO SNAPSHOT AS OF $s0")
        .collect()
      spark.sql("SELECT count(*) FROM graft_iceberg.maint_i")
        .as[Long].head() shouldBe 20L
      // after the rollback the CURRENT snapshot is the OLDER one, so
      // keep-newest-1 expiry rightly refuses; retaining both works
      intercept[IllegalStateException] {
        spark.sql("VACUUM graft_iceberg.maint_i RETAIN 1 SNAPSHOTS")
          .collect()
      }.getMessage should include("CURRENT")
      spark.sql("VACUUM graft_iceberg.maint_i RETAIN 2 SNAPSHOTS")
        .collect()
    } finally IcebergSql.unregister("maint_i")
  }

  test("deleteMor refusals name the door: v1 tables point at " +
    "upgradeFormat; equality deletes refuse partitioned specs") {
    import spark.implicits._
    val t = fresh()
    IcebergInterop.write((1L to 10L).map(i => (i, i)).toDF("id", "v"), t)
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.deleteMor(spark, t, col("id") === 1L)
    }.getMessage should include("upgradeFormat")
    val t2 = fresh()
    IcebergInterop.write(
      (1L to 10L).map(i => (i, s"g${i % 2}")).toDF("id", "g"), t2,
      partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    IcebergInterop.upgradeFormat(spark, t2)
    intercept[IcebergInterop.UnsupportedIcebergFeatureException] {
      IcebergInterop.deleteByKeys(spark, t2, Seq(1L).toDF("id"))
    }.getMessage should include("equality deletes")
  }

  test("PARTITIONED merge-on-read: position deletes stamp their " +
    "target files' tuples (per-tuple delete files, pruned like " +
    "data), updateMor composes, and partition-source assignment " +
    "refuses by name") {
    import spark.implicits._
    import org.apache.avro.file.DataFileStream
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord => GR}
    val t = fresh()
    IcebergInterop.write(
      (1L to 40L).map(i => (i, s"g${i % 2}", i * 10L))
        .toDF("id", "g", "v"), t,
      partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    IcebergInterop.upgradeFormat(spark, t)
    // MOR delete touching BOTH partitions
    val d = IcebergInterop.deleteMor(spark, t, col("id") % 5 === 0)
    d.rowsAffected shouldBe 8L
    val st = IcebergInterop.state(spark, t, None)
    st.posDeletes should not be empty
    // every delete file's manifest entry carries a real tuple, and
    // the two partitions' kill sets live in SEPARATE delete files
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    val metaDir = new Path(t, "metadata")
    val delTuples = fs.listStatus(metaDir)
      .map(_.getPath).filter(_.getName.endsWith(".avro"))
      .flatMap { p =>
        val in = fs.open(p)
        try {
          val s0 = new DataFileStream[GR](in, new GenericDatumReader[GR]())
          try {
            val isDel = Option(s0.getMetaString("content"))
              .contains("deletes")
            val b = Seq.newBuilder[(String, String)]
            while (s0.hasNext) {
              val e = s0.next()
              if (isDel) {
                val df0 = e.get("data_file").asInstanceOf[GR]
                val part = df0.get("partition").asInstanceOf[GR]
                b += (df0.get("file_path").toString ->
                  String.valueOf(part.get("g")))
              }
            }
            b.result()
          } finally s0.close()
        } finally scala.util.Try(in.close()): Unit
      }
    delTuples should not be empty
    delTuples.map(_._2).toSet shouldBe Set("g0", "g1")
    // one tuple per delete file (never mixed)
    delTuples.groupBy(_._1).values.foreach(ts =>
      ts.map(_._2).distinct should have size 1)
    val out = IcebergInterop.read(spark, t)
    out.count() shouldBe 32L
    out.filter($"id" % 5 === 0).count() shouldBe 0L
    // MOR update in one partition; data files untouched
    val filesBefore = IcebergInterop.state(spark, t, None)
      .files.map(_.path).toSet
    IcebergInterop.updateMor(spark, t, col("id") === 7L,
      Seq("v" -> org.apache.spark.sql.functions.lit(777L)))
      .rowsAffected shouldBe 1L
    val after = IcebergInterop.read(spark, t)
    after.filter($"id" === 7L).select($"v").as[Long].head() shouldBe 777L
    after.filter($"id" === 7L).select($"g").as[String]
      .head() shouldBe "g1"
    after.count() shouldBe 32L
    IcebergInterop.state(spark, t, None).files.map(_.path)
      .toSet should contain allElementsOf filesBefore
    // partition-source assignment refuses on the MOR path
    intercept[IllegalArgumentException] {
      IcebergInterop.updateMor(spark, t, col("id") === 2L,
        Seq("g" -> org.apache.spark.sql.functions.lit("g0")))
    }.getMessage should include("partition source")
  }

  test("URI-escapable partition values: MOR deletes on a space-valued " +
    "partition dir record RAW manifest paths and REAL tuples — a " +
    "spec-compliant foreign reader path-matches and partition-prunes " +
    "them") {
    import spark.implicits._
    import org.apache.avro.file.DataFileStream
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord => GR}
    val t = fresh()
    // the standard foreign layout the advisory names: Hive-style
    // partition-value DIRS with a space (graft's own Iceberg writer
    // lays files flat, so the layout comes from a lake export), whose
    // paths `_metadata.file_path` serves as `%20` while the manifest
    // records the raw path
    ManifestLake.write(
      (1L to 20L).map(i =>
        (i, if (i % 2 == 0) "4-NOT SPECIFIED" else "1-URGENT", i * 10L))
        .toDF("id", "pri", "v"), t, partitionBy = Seq("pri"))
    IcebergInterop.exportFromManifest(spark, t)
    IcebergInterop.upgradeFormat(spark, t)
    val st0 = IcebergInterop.state(spark, t, None)
    val rawPaths = st0.files.map(_.path).toSet
    rawPaths.exists(_.contains("4-NOT SPECIFIED")) shouldBe true
    val d = IcebergInterop.deleteMor(spark, t, col("id") % 4 === 0)
    d.rowsAffected shouldBe 5L
    val st = IcebergInterop.state(spark, t, None)
    st.posDeletes should not be empty
    // (1) the delete parquet's file_path column records the RAW
    // manifest path — not the %20-escaped lineage form
    val delRows = spark.read.parquet(st.posDeletes: _*)
      .select("file_path").as[String].collect()
    delRows should not be empty
    delRows.foreach { fp =>
      fp should not include "%20"
      rawPaths should contain(fp)
    }
    delRows.exists(_.contains("4-NOT SPECIFIED")) shouldBe true
    // (2) every delete manifest entry carries the REAL tuple, never
    // the empty-tuple fallback
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    val metaDir = new Path(t, "metadata")
    val delTuples = fs.listStatus(metaDir)
      .map(_.getPath).filter(_.getName.endsWith(".avro"))
      .flatMap { p =>
        val in = fs.open(p)
        try {
          val s0 = new DataFileStream[GR](in, new GenericDatumReader[GR]())
          try {
            val isDel = Option(s0.getMetaString("content"))
              .contains("deletes")
            val b = Seq.newBuilder[String]
            while (s0.hasNext) {
              val e = s0.next()
              if (isDel) {
                val df0 = e.get("data_file").asInstanceOf[GR]
                val part = df0.get("partition").asInstanceOf[GR]
                b += String.valueOf(part.get("pri"))
              }
            }
            b.result()
          } finally s0.close()
        } finally scala.util.Try(in.close()): Unit
      }
    delTuples should not be empty
    // ids divisible by 4 are all even — only the space-valued
    // partition is touched, and its tuple is the REAL value (the bug
    // grouped such files under the EMPTY tuple)
    delTuples.toSet shouldBe Set("4-NOT SPECIFIED")
    // (3) graft's own reader still applies them
    val out = IcebergInterop.read(spark, t)
    out.count() shouldBe 15L
    out.filter($"id" % 4 === 0).count() shouldBe 0L
    // (4) CoW paths on escaped-lineage tables keep working too
    IcebergInterop.compactDeletes(spark, t)
    IcebergInterop.update(spark, t, col("id") === 3L,
      Seq("v" -> lit(333L))).rowsAffected shouldBe 1L
    IcebergInterop.read(spark, t).filter($"id" === 3L)
      .select($"v").as[Long].head() shouldBe 333L
  }
}
