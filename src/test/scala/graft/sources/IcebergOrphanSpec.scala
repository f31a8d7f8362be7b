package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** `remove_orphan_files` — storage hygiene: failed/abandoned writes
  * leave files no snapshot ever referenced, which expiry can never
  * collect. The remover deletes only what the FULL metadata walk
  * cannot name AND what is older than the grace interval; everything
  * referenced — current and historical snapshots, delete files,
  * statistics, metadata documents — survives with any mtime. */
class IcebergOrphanSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  test("orphans older than the grace delete; referenced files and " +
    "recent orphans survive; dry run lists without deleting; doors") {
    import spark.implicits._
    val t = java.nio.file.Files
      .createTempDirectory("graft-ice-orphan").toString + "/t"
    val spec = Seq(IcebergInterop.SpecField("g", "identity", "g"))
    IcebergInterop.write(
      (1L to 20L).map(i => (i, s"g${i % 2}", i)).toDF("id", "g", "v"),
      t, partitionBy = spec)
    IcebergInterop.upgradeFormat(spark, t, 2)
    IcebergInterop.write(
      (21L to 30L).map(i => (i, s"g${i % 2}", i)).toDF("id", "g", "v"),
      t, partitionBy = spec)
    IcebergInterop.deleteMor(spark, t, col("id") <= 3)
    IcebergInterop.computeStats(spark, t, Seq("id"))
    val root = new Path(t)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val old = System.currentTimeMillis() - 10L * 24 * 3600 * 1000

    // plant orphans: an abandoned data file, an abandoned manifest,
    // and a RECENT abandoned data file (inside the grace window)
    def plant(p: Path, aged: Boolean): Path = {
      val out = fs.create(p, false)
      try out.write("junk".getBytes("UTF-8")) finally out.close()
      if (aged) fs.setTimes(p, old, old)
      p
    }
    val orphanData = plant(new Path(t, "data/g=g0/abandoned-0.parquet"),
      aged = true)
    val orphanMeta = plant(new Path(t, "metadata/dead-beef-m9.avro"),
      aged = true)
    val recent = plant(new Path(t, "data/g=g1/in-flight.parquet"),
      aged = false)
    // age a REFERENCED data file and a metadata document too — age
    // alone must never delete what the metadata can name
    val st = IcebergInterop.state(spark, t, None)
    val agedLive = new Path(st.files.head.path)
    fs.setTimes(agedLive, old, old)
    fs.setTimes(new Path(t, "metadata/v1.metadata.json"), old, old)

    val before = IcebergInterop.read(spark, t).orderBy("id").collect()

    // dry run: lists exactly the two aged orphans, deletes nothing
    IcebergSql.register("orphan_t", t)
    val listed = spark.sql(
      "VACUUM graft_iceberg.orphan_t REMOVE ORPHANS DRY RUN")
      .collect().map(_.getString(0)).toSet
    listed.map(p => new Path(p).getName) shouldBe
      Set("abandoned-0.parquet", "dead-beef-m9.avro")
    fs.exists(orphanData) shouldBe true

    val removed = IcebergInterop.removeOrphanFiles(spark, t)
    removed.map(p => new Path(p).getName).toSet shouldBe
      Set("abandoned-0.parquet", "dead-beef-m9.avro")
    fs.exists(orphanData) shouldBe false
    fs.exists(orphanMeta) shouldBe false
    fs.exists(recent) shouldBe true // grace-protected
    fs.exists(agedLive) shouldBe true // referenced, any age
    fs.exists(new Path(t, "metadata/v1.metadata.json")) shouldBe true
    // table identical, history intact
    IcebergInterop.read(spark, t).orderBy("id").collect() shouldBe before
    IcebergInterop.snapshotLineage(spark, t).length shouldBe 3
    // idempotent: nothing left to collect
    IcebergInterop.removeOrphanFiles(spark, t) shouldBe empty
  }
}
