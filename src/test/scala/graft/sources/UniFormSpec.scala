package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** UniForm-style auto-mirror ([[UniForm]]): enablement rides the
  * `delta.universalFormat.enabledFormats` TABLE PROPERTY, so every
  * writer session's data commit re-syncs the Iceberg mirror (append,
  * DML) — including sessions that never called enable; maintenance
  * commits skip; the steady-state sync is INCREMENTAL (untouched
  * mirror manifests carried verbatim, O(changed files) manifest-lake
  * commits); disable freezes; ineligible tables refuse through the
  * conversion legs' named errors. */
class UniFormSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-uniform").toString + "/t"

  private def fs(t: String) = new Path(t).getFileSystem(
    spark.sessionState.newHadoopConf())

  private def iceVersions(t: String): Long =
    fs(t).listStatus(new Path(t, "metadata")).toSeq
      .map(_.getPath.getName)
      .count(n => n.startsWith("v") && n.endsWith(".metadata.json"))

  private def iceManifests(t: String): Set[String] =
    fs(t).listStatus(new Path(t, "metadata")).toSeq
      .map(_.getPath.getName)
      .filter(n => n.contains("-m") && n.endsWith(".avro")).toSet

  test("enable publishes the mirror; appends and DML re-sync it " +
    "automatically; property-only commits skip; disable freezes") {
    import spark.implicits._
    val t = fresh()
    try {
      DeltaInterop.write(
        (1L to 10L).map(i => (i, i)).toDF("id", "v"), t)
      UniForm.enableAutoMirror(spark, t)
      IcebergInterop.read(spark, t).count() shouldBe 10L
      // enablement is recorded in the table configuration
      DeltaInterop.state(spark, t, None).configuration
        .get(UniForm.EnabledFormatsProp) shouldBe Some("iceberg")
      // commit 1: append — the mirror serves it with no extra call
      DeltaInterop.write(Seq((100L, 100L)).toDF("id", "v"), t)
      IcebergInterop.read(spark, t).count() shouldBe 11L
      // commit 2: DML — deleted rows leave the mirror too
      DeltaInterop.delete(spark, t, col("id") <= 3L)
      IcebergInterop.read(spark, t).count() shouldBe 8L
      IcebergInterop.read(spark, t).filter(col("id") <= 3L)
        .count() shouldBe 0L
      // maintenance: a property-only commit moves the Delta log but
      // NOT the mirror
      val before = iceVersions(t)
      DeltaInterop.setProperties(spark, t, Map("graft.note" -> "x"))
      iceVersions(t) shouldBe before
      // JVM-local disable: the mirror freezes at its last synced state
      UniForm.disableAutoMirror(t)
      DeltaInterop.write(Seq((200L, 200L)).toDF("id", "v"), t)
      DeltaInterop.read(spark, t).count() shouldBe 9L
      IcebergInterop.read(spark, t).count() shouldBe 8L
    } finally UniForm.disableAutoMirror(t)
  }

  test("enablement is the table property: a session that never " +
    "registered the table re-syncs on its own append") {
    import spark.implicits._
    val t = fresh()
    try {
      DeltaInterop.write((1L to 6L).map(i => (i, i)).toDF("id", "v"), t)
      UniForm.enableAutoMirror(spark, t)
      // emulate a fresh JVM: clear every process-local override, then
      // append from a DIFFERENT SparkSession — the commit hook must
      // pick enablement up from the committed configuration alone
      UniForm.resetLocalState()
      val other = spark.newSession()
      DeltaInterop.write(Seq((50L, 50L)).toDF("id", "v"), t)
      IcebergInterop.read(other, t).count() shouldBe 7L
      IcebergInterop.read(other, t).filter(col("id") === 50L)
        .count() shouldBe 1L
      // durable disable clears the property; no session mirrors after
      UniForm.disableAutoMirror(spark, t)
      DeltaInterop.state(spark, t, None).configuration
        .getOrElse(UniForm.EnabledFormatsProp, "") shouldBe ""
      DeltaInterop.write(Seq((60L, 60L)).toDF("id", "v"), t)
      DeltaInterop.read(spark, t).count() shouldBe 8L
      IcebergInterop.read(spark, t).count() shouldBe 7L
    } finally UniForm.disableAutoMirror(t)
  }

  test("steady-state sync is incremental: an append carries every " +
    "prior mirror manifest verbatim and commits O(changed files) " +
    "to the manifest lake") {
    import spark.implicits._
    val t = fresh()
    try {
      DeltaInterop.write(
        (1L to 100L).map(i => (i, i)).toDF("id", "v"), t)
      UniForm.enableAutoMirror(spark, t)
      val f = fs(t)
      val manifestsBefore = iceManifests(t)
      val mvBefore = ManifestLake.currentVersion(spark, t).get
      val mtimes = manifestsBefore.map(n => n -> f.getFileStatus(
        new Path(new Path(t, "metadata"), n)).getModificationTime).toMap
      DeltaInterop.write(Seq((500L, 500L)).toDF("id", "v"), t)
      // exactly one NEW iceberg manifest; every prior one untouched
      val manifestsAfter = iceManifests(t)
      manifestsBefore.subsetOf(manifestsAfter) shouldBe true
      (manifestsAfter -- manifestsBefore).size shouldBe 1
      manifestsBefore.foreach { n =>
        f.getFileStatus(new Path(new Path(t, "metadata"), n))
          .getModificationTime shouldBe mtimes(n)
      }
      // the manifest lake moved by ONE incremental version: a few
      // header lines plus one A-line, no #full re-list
      val mvAfter = ManifestLake.currentVersion(spark, t).get
      mvAfter shouldBe mvBefore + 1
      val logText = {
        val p = new Path(new Path(t, "_manifests"),
          f"v$mvAfter%08d.manifest")
        val in = f.open(p)
        try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
          new String(out.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
      }
      logText should not include "#full"
      logText.linesIterator.count(_.startsWith("A\t")) shouldBe 1
      logText.linesIterator.count(_.startsWith("R\t")) shouldBe 0
      // and the mirror is CORRECT after the incremental leg
      IcebergInterop.read(spark, t).count() shouldBe 101L
      ManifestLake.read(spark, t).count() shouldBe 101L
    } finally UniForm.disableAutoMirror(t)
  }

  test("a rewrite commit (OPTIMIZE) syncs through the rewrite leg: " +
    "removed paths leave the mirror, untouched manifests carry") {
    import spark.implicits._
    val t = fresh()
    try {
      (0 until 3).foreach(k => DeltaInterop.write(
        (1L to 20L).map(i => (i * 10 + k, i)).toDF("id", "v")
          .coalesce(1), t))
      UniForm.enableAutoMirror(spark, t)
      IcebergInterop.read(spark, t).count() shouldBe 60L
      val before = iceVersions(t)
      DeltaInterop.optimize(spark, t)
      // ONE new mirror snapshot, reflecting the compacted file set
      iceVersions(t) shouldBe before + 1
      val st = IcebergInterop.state(spark, t, None)
      st.files.map(_.path).toSet shouldBe
        DeltaInterop.state(spark, t, None).files
          .map(a => new Path(t, a.path).toString).toSet
      IcebergInterop.read(spark, t).count() shouldBe 60L
      ManifestLake.read(spark, t).count() shouldBe 60L
    } finally UniForm.disableAutoMirror(t)
  }

  test("a schema-evolving commit re-exports so the mirror serves the " +
    "new column") {
    import spark.implicits._
    val t = fresh()
    try {
      DeltaInterop.write((1L to 5L).map(i => (i, i)).toDF("id", "v"), t)
      UniForm.enableAutoMirror(spark, t)
      DeltaInterop.addColumns(spark, t, Seq(
        org.apache.spark.sql.types.StructField("tag",
          org.apache.spark.sql.types.StringType)))
      // the metadata-only ALTER re-exported the mirror schema; the
      // follow-up append rides the incremental leg under it
      DeltaInterop.write(Seq((9L, 9L, "x")).toDF("id", "v", "tag"), t)
      val mirror = IcebergInterop.read(spark, t)
      mirror.columns should contain("tag")
      mirror.count() shouldBe 6L
      mirror.filter(col("tag") === "x").count() shouldBe 1L
    } finally UniForm.disableAutoMirror(t)
  }

  test("SQL-door enablement: SET TBLPROPERTIES of the UniForm " +
    "property IS enablement — the first data commit after it lands " +
    "creates the mirror (no enableAutoMirror call anywhere)") {
    import spark.implicits._
    val t = fresh()
    try {
      DeltaInterop.write((1L to 8L).map(i => (i, i)).toDF("id", "v"), t)
      DeltaSql.register("uniform_sql_t", t)
      spark.sql("ALTER TABLE graft_delta.uniform_sql_t SET " +
        "TBLPROPERTIES('delta.universalFormat.enabledFormats' = " +
        "'iceberg')")
      // the property commit ITSELF creates the mirror (the hook sees
      // an enabled configuration with no sync marker and re-exports)
      IcebergInterop.read(spark, t).count() shouldBe 8L
      // data commits keep it current
      DeltaInterop.write(Seq((100L, 100L)).toDF("id", "v"), t)
      IcebergInterop.read(spark, t).count() shouldBe 9L
      // and the next append rides the incremental leg
      DeltaInterop.write(Seq((200L, 200L)).toDF("id", "v"), t)
      IcebergInterop.read(spark, t).count() shouldBe 10L
    } finally {
      DeltaSql.unregister("uniform_sql_t")
      UniForm.disableAutoMirror(t)
    }
  }

  test("the append leg's LIGHT head read matches the full state on " +
    "everything an append publication needs, and refuses (None) on " +
    "v2 heads that could hide delete manifests") {
    import spark.implicits._
    val t = fresh()
    try {
      DeltaInterop.write(
        (1L to 20L).map(i => (i, i)).toDF("id", "v"), t,
        partitionBy = Seq("v"))
      UniForm.enableAutoMirror(spark, t)
      val full = IcebergInterop.state(spark, t, None)
      val light = IcebergInterop.stateLight(spark, t).get
      light.metadataVersion shouldBe full.metadataVersion
      light.snapshotId shouldBe full.snapshotId
      light.schema shouldBe full.schema
      light.defaultSpecId shouldBe full.defaultSpecId
      light.specs shouldBe full.specs
      light.formatVersion shouldBe 1
      light.files shouldBe empty // the point: no manifest parse
    } finally UniForm.disableAutoMirror(t)
    // a v2 head refuses the light path
    val t2 = fresh()
    IcebergInterop.write((1L to 3L).toDF("id"), t2)
    IcebergInterop.upgradeFormat(spark, t2)
    IcebergInterop.stateLight(spark, t2) shouldBe None
  }

  test("shallow clone of a UniForm-enabled table refuses by name: " +
    "the clone's shared files live outside its root, so the " +
    "property's every-writer-maintains-the-mirror promise is " +
    "unfulfillable there") {
    import spark.implicits._
    val t = fresh()
    try {
      DeltaInterop.write((1L to 4L).map(i => (i, i)).toDF("id", "v"), t)
      UniForm.enableAutoMirror(spark, t)
      val dst = fresh()
      intercept[DeltaInterop.UnsupportedDeltaFeatureException](
        DeltaInterop.shallowClone(spark, t, dst))
        .getMessage should include("universalFormat")
      // nothing landed at the destination
      fs(dst).exists(new Path(dst, "_delta_log")) shouldBe false
    } finally UniForm.disableAutoMirror(t)
  }

  test("ineligible tables refuse at enable through the legs' named " +
    "errors and nothing records") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 5L).map(i => (i, i)).toDF("id", "v"), t,
      columnMapping = "name")
    intercept[IllegalArgumentException](
      UniForm.enableAutoMirror(spark, t))
      .getMessage should include("column mapping")
    DeltaInterop.state(spark, t, None).configuration
      .contains(UniForm.EnabledFormatsProp) shouldBe false
    // later commits on the un-enabled table never try to sync
    DeltaInterop.write(Seq((9L, 9L)).toDF("id", "v"), t)
    DeltaInterop.read(spark, t).count() shouldBe 6L
  }
}
