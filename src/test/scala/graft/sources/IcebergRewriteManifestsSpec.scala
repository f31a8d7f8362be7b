package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** `rewrite_manifests` — METADATA compaction: the manifest list
  * consolidates to one data manifest per partition spec without a
  * data byte moving. Entries re-list as EXISTING with their original
  * sequence numbers, snapshot ids and row-id origins, so
  * equality-delete applicability and v3 lineage are untouched. The
  * 100 TB point: per-minute appends accumulate one manifest per
  * commit; planning must return to O(live files) metadata. */
class IcebergRewriteManifestsSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def fresh(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString + "/t"

  private def fileKeys(st: IcebergInterop.IceState) =
    st.files.map(f => (f.path, f.seq, f.fileSeq, f.snapId, f.specId,
      f.partition.get("g"))).sortBy(_._1)

  test("manifests consolidate to one per spec; entries keep sequence " +
    "numbers and snapshot ids; delete manifests carry verbatim; data " +
    "files untouched; no-op when already minimal") {
    import spark.implicits._
    val t = fresh("graft-ice-rwm")
    val spec = Seq(IcebergInterop.SpecField("g", "identity", "g"))
    def batch(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, s"g${i % 2}", i * 3L)).toDF("id", "g", "v")
    IcebergInterop.write(batch(1, 20), t, partitionBy = spec)
    IcebergInterop.upgradeFormat(spark, t, 2)
    IcebergInterop.write(batch(21, 40), t, partitionBy = spec)
    IcebergInterop.write(batch(41, 60), t, partitionBy = spec)
    IcebergInterop.deleteMor(spark, t, col("id") <= 5)
    val before = IcebergInterop.state(spark, t, None)
    val manifestsBefore = IcebergInterop.manifestsTable(spark, t)
      .collect()
    val deleteManifestsBefore = manifestsBefore
      .filter(_.getAs[Int]("content") == 1).map(_.getAs[String]("path"))
    deleteManifestsBefore should not be empty
    manifestsBefore.count(_.getAs[Int]("content") == 0) should be >= 3
    val dataBefore = IcebergInterop.read(spark, t).orderBy("id").collect()

    val snap = IcebergInterop.rewriteManifests(spark, t)
    snap should not be before.snapshotId
    val after = IcebergInterop.state(spark, t, None)
    // the data file surface is BYTE-IDENTICAL: same paths, same
    // sequence numbers, same committing snapshots, same tuples
    fileKeys(after) shouldBe fileKeys(before)
    // consolidated: one data manifest per spec (here: one), delete
    // manifests carried VERBATIM (same path — not rewritten)
    val manifestsAfter = IcebergInterop.manifestsTable(spark, t)
      .collect()
    manifestsAfter.count(_.getAs[Int]("content") == 0) shouldBe 1
    manifestsAfter.filter(_.getAs[Int]("content") == 1)
      .map(_.getAs[String]("path")).toSet shouldBe
      deleteManifestsBefore.toSet
    after.files.map(_.manifest).distinct.size shouldBe 1
    // reads identical, MOR delete still applied
    IcebergInterop.read(spark, t).orderBy("id").collect() shouldBe
      dataBefore
    IcebergInterop.read(spark, t).count() shouldBe 55L
    // the replace snapshot is in the history; time travel to the
    // pre-rewrite snapshot still serves
    val snaps = IcebergInterop.snapshotsTable(spark, t).collect()
    snaps.filter(_.getAs[Long]("snapshot_id") == snap)
      .map(_.getAs[String]("operation")).toSeq shouldBe Seq("replace")
    IcebergInterop.readSnapshot(spark, t, before.snapshotId)
      .count() shouldBe 55L
    // CDC across the rewrite: a rewrite, no added rows
    val ch = IcebergInterop.changesAt(spark, t, snap,
      Some(before.snapshotId))
    ch.added shouldBe empty
    ch.rewrites shouldBe true
    // idempotent: already minimal → no-op, same snapshot
    IcebergInterop.rewriteManifests(spark, t) shouldBe snap
    // the SQL door
    IcebergSql.register("rwm_t", t)
    spark.sql("OPTIMIZE graft_iceberg.rwm_t REWRITE MANIFESTS")
      .collect().head.getLong(0) shouldBe snap
  }

  test("multi-spec tables keep one manifest per spec; v3 row lineage " +
    "survives the rewrite") {
    import spark.implicits._
    val t = fresh("graft-ice-rwm3")
    IcebergInterop.write(
      (1L to 10L).map(i => (i, s"g${i % 2}", i)).toDF("id", "g", "v"), t)
    IcebergInterop.upgradeFormat(spark, t, 3)
    IcebergInterop.addPartitionField(spark, t,
      IcebergInterop.SpecField("g", "identity", "g"))
    val spec = Seq(IcebergInterop.SpecField("g", "identity", "g"))
    IcebergInterop.write(
      (11L to 20L).map(i => (i, s"g${i % 2}", i)).toDF("id", "g", "v"),
      t, partitionBy = spec)
    IcebergInterop.write(
      (21L to 30L).map(i => (i, s"g${i % 2}", i)).toDF("id", "g", "v"),
      t, partitionBy = spec)
    def lineage() = IcebergInterop.readRowLineage(spark, t)
      .select("id", "_row_id").collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]))).sortBy(_._1)
    val lineageBefore = lineage()
    val before = IcebergInterop.state(spark, t, None)
    before.files.map(_.manifest).distinct.size should be >= 3

    IcebergInterop.rewriteManifests(spark, t)
    val after = IcebergInterop.state(spark, t, None)
    after.files.map(_.specId).toSet shouldBe Set(0, 1)
    // one consolidated manifest per spec
    after.files.groupBy(_.specId).values.foreach(g =>
      g.map(_.manifest).distinct.size shouldBe 1)
    after.files.map(_.manifest).distinct.size shouldBe 2
    // v3 lineage: every row keeps its id (pre-upgrade rows stay null)
    lineage() shouldBe lineageBefore
  }
}
