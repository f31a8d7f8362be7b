package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** PARTITION SPEC EVOLUTION (Iceberg spec §Partition Evolution) —
  * the metadata-only republish that redirects FUTURE writes to a new
  * default spec while every already-written file stays under the
  * spec it was committed with. The alternative this replaces was a
  * full-table overwrite: at 100 TB, re-partitioning must cost one
  * metadata version, not a data rewrite. */
class IcebergSpecEvolutionSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def fresh(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString + "/t"

  test("evolveSpec redirects future appends; old files keep their " +
    "spec; pruning resolves per file; the INSERT door adopts the " +
    "new default") {
    import spark.implicits._
    val t = fresh("graft-ice-specevo")
    // seed UNPARTITIONED (spec 0), then evolve to identity(g)
    IcebergInterop.write(
      (1L to 20L).map(i => (i, s"g${i % 2}", i * 10L)).toDF("id", "g", "v"),
      t)
    IcebergInterop.upgradeFormat(spark, t, 2)
    val sid = IcebergInterop.addPartitionField(spark, t,
      IcebergInterop.SpecField("g", "identity", "g"))
    sid shouldBe 1
    // the appended data lands under the NEW spec, partitioned
    IcebergInterop.write(
      (21L to 40L).map(i => (i, s"g${i % 2}", i * 10L)).toDF("id", "g", "v"),
      t, partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    val st = IcebergInterop.state(spark, t, None)
    st.defaultSpecId shouldBe 1
    st.files.map(_.specId).toSet shouldBe Set(0, 1)
    st.specs(1) shouldBe Seq(IcebergInterop.SpecField("g", "identity", "g"))
    IcebergInterop.read(spark, t).count() shouldBe 40L

    // pruning is PER FILE: g='g0' keeps the spec-0 seed (fails open —
    // no tuple recorded) plus only the matching spec-1 partition
    val spec1 = st.files.filter(_.specId == 1)
    spec1.size should be >= 2
    val keptPaths = IcebergInterop.readPruned(spark, t,
      Seq(ScanEq("g", "g0"))).inputFiles.toSet
    val spec0Paths = st.files.filter(_.specId == 0).map(_.path)
    spec0Paths.foreach(p => assert(keptPaths.exists(_.endsWith(
      new org.apache.hadoop.fs.Path(p).getName))))
    val g1Spec1 = spec1.filter(_.partition.get("g").contains("g1"))
    g1Spec1 should not be empty
    g1Spec1.foreach(f => assert(!keptPaths.exists(_.endsWith(
      new org.apache.hadoop.fs.Path(f.path).getName))))
    // counts survive the prune + residual
    IcebergInterop.readWhere(spark, t, Seq(ScanEq("g", "g0")))
      .count() shouldBe 20L

    // the SQL INSERT door adopts the evolved default with no
    // re-declaration
    val alias = "specevo_t"
    IcebergSql.register(alias, t)
    spark.sql(s"INSERT INTO graft_iceberg.$alias VALUES " +
      "(CAST(41 AS BIGINT), 'g1', CAST(410 AS BIGINT))")
    val st2 = IcebergInterop.state(spark, t, None)
    val inserted = st2.files.filter(f =>
      !st.files.map(_.path).contains(f.path))
    inserted.map(_.specId).toSet shouldBe Set(1)
    inserted.flatMap(_.partition.get("g")).toSet shouldBe Set("g1")
    IcebergInterop.read(spark, t).count() shouldBe 41L

    // the SQL evolution doors: DROP PARTITION FIELD lands back on
    // the IDENTICAL seed spec (spec 0 is reused, never duplicated),
    // ADD PARTITION FIELD bucket(4, id) mints the next id
    spark.sql(s"ALTER TABLE graft_iceberg.$alias DROP PARTITION " +
      "FIELD g").collect().head.getInt(0) shouldBe 0
    spark.sql(s"ALTER TABLE graft_iceberg.$alias ADD PARTITION " +
      "FIELD bucket(4, id)").collect().head.getInt(0) shouldBe 2
    val st3 = IcebergInterop.state(spark, t, None)
    st3.defaultSpecId shouldBe 2
    st3.specs(2).map(_.transform) shouldBe Seq("bucket[4]")
    // everything still reads — no file was rewritten by any evolution
    IcebergInterop.read(spark, t).count() shouldBe 41L
    st3.files.map(_.path).toSet shouldBe st2.files.map(_.path).toSet
  }

  test("field-id reuse on re-add; refusals: duplicate field, absent " +
    "drop, unknown column, unmodeled transform, v1 drop") {
    import spark.implicits._
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val t = fresh("graft-ice-specevo2")
    IcebergInterop.write(
      (1L to 8L).map(i => (i, s"g${i % 2}", i.toDouble)).toDF("id", "g", "x"),
      t, partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g")))
    // v1: ADD is fine, DROP refuses by name
    IcebergInterop.addPartitionField(spark, t,
      IcebergInterop.SpecField("id_bucket", "bucket[2]", "id")) shouldBe 1
    val v1Drop = intercept[Exception](IcebergInterop.dropPartitionField(
      spark, t, IcebergInterop.SpecField("g", "identity", "g")))
    v1Drop.getMessage should include("void")
    IcebergInterop.upgradeFormat(spark, t, 2)
    // drop then RE-ADD: the field keeps its original field-id (the
    // spec's id-reuse rule — ids are never reassigned)
    IcebergInterop.dropPartitionField(spark, t,
      IcebergInterop.SpecField("id_bucket", "bucket[2]", "id"))
    IcebergInterop.addPartitionField(spark, t,
      IcebergInterop.SpecField("id_bucket", "bucket[2]", "id"))
    val fs = new org.apache.hadoop.fs.Path(t).getFileSystem(
      spark.sessionState.newHadoopConf())
    val metaDir = new org.apache.hadoop.fs.Path(t, "metadata")
    val hint = {
      val in = fs.open(new org.apache.hadoop.fs.Path(metaDir,
        "version-hint.text"))
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
    val meta = {
      val in = fs.open(new org.apache.hadoop.fs.Path(metaDir,
        s"v$hint.metadata.json"))
      try JsonMethods.parse(scala.io.Source.fromInputStream(in).mkString)
      finally in.close()
    }
    def jl(v: JValue): Long = v match {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case _ => -1L
    }
    val specs = (meta \ "partition-specs").asInstanceOf[JArray].arr
    val bucketIds = specs.flatMap(s => (s \ "fields") match {
      case JArray(xs) => xs.filter(f =>
        (f \ "transform") == JString("bucket[2]")).map(f =>
        jl(f \ "field-id"))
      case _ => Nil
    }).toSet
    bucketIds.size shouldBe 1 // one id across every spec that carries it
    jl(meta \ "last-partition-id") shouldBe
      specs.flatMap(s => (s \ "fields") match {
        case JArray(xs) => xs.map(f => jl(f \ "field-id"))
        case _ => Nil
      }).max
    // legacy partition-spec mirrors the default spec's fields
    val defId = jl(meta \ "default-spec-id")
    val defFields = specs.find(s => jl(s \ "spec-id") == defId).get \ "fields"
    (meta \ "partition-spec") shouldBe defFields

    // refusals, each by name
    intercept[Exception](IcebergInterop.addPartitionField(spark, t,
      IcebergInterop.SpecField("g", "identity", "g")))
      .getMessage should include("already partitioned")
    intercept[Exception](IcebergInterop.dropPartitionField(spark, t,
      IcebergInterop.SpecField("x_day", "day", "x")))
      .getMessage should include("nothing to drop")
    intercept[Exception](IcebergInterop.evolveSpec(spark, t,
      Seq(IcebergInterop.SpecField("nope", "identity", "nope"))))
      .getMessage should include("not a top-level column")
    intercept[Exception](IcebergInterop.evolveSpec(spark, t,
      Seq(IcebergInterop.SpecField("x_day", "day", "x"))))
      .getMessage should include("transform/type")
    // a derived field must not shadow a schema column
    intercept[Exception](IcebergInterop.evolveSpec(spark, t,
      Seq(IcebergInterop.SpecField("g", "bucket[2]", "g"))))
      .getMessage should include("collides")
    // an append still declaring the OLD spec refuses (the table moved)
    IcebergInterop.evolveSpec(spark, t, Nil)
    intercept[Exception](IcebergInterop.write(
      Seq((9L, "g1", 9.0)).toDF("id", "g", "x"), t,
      partitionBy = Seq(IcebergInterop.SpecField("g", "identity", "g"))))
      .getMessage should include("current default spec")
    IcebergInterop.write(Seq((9L, "g1", 9.0)).toDF("id", "g", "x"), t)
    IcebergInterop.read(spark, t).agg(
      org.apache.spark.sql.functions.sum(col("id"))).head().getLong(0) shouldBe
      (1L to 9L).sum
  }
}
