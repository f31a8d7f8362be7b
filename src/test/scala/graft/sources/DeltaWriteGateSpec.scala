package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, MetadataBuilder, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the WRITER-OBLIGATION gate ([[DeltaWriteGate]]) on every
  * foreign-Delta commit path: unknown writer features and
  * minWriterVersion > 7 refuse by name; `delta.appendOnly=true`
  * refuses data-removing verbs but keeps appends and OPTIMIZE legal;
  * CHECK constraints, column invariants, NOT NULL, and
  * generated-column expressions validate against STAGED files before
  * anything publishes — a violation aborts with nothing landed (log
  * version unmoved, staged files deleted); identity columns refuse
  * data-adding commits; checkpoints refuse domainMetadata tables.
  * Also pins the management doors (setProperties /
  * addCheckConstraint / dropCheckConstraint) and that the SQL
  * surface (graft_delta.*) inherits every refusal. */
class DeltaWriteGateSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-wgate").toString + "/t"

  private def q(s: String): String =
    org.json4s.jackson.JsonMethods.compact(org.json4s.JString(s))

  private def rawCommit(table: String, v: Long, lines: Seq[String]): Unit = {
    val p = new Path(new Path(table, "_delta_log"), f"$v%020d.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, false)
    try out.write(lines.mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Republish the table's metaData with a foreign-authored schema /
    * configuration — how delta-spark-created obligations (invariants,
    * generated columns, identity metadata) arrive in the log. */
  private def foreignMetadata(table: String, schema: StructType,
      config: Map[String, String],
      protocol: Option[String] = None): Unit = {
    val st = DeltaInterop.state(spark, table, None)
    val cfg = config.map { case (k, v) => s"${q(k)}:${q(v)}" }
      .mkString("{", ",", "}")
    val parts = st.partitionColumns.map(q).mkString("[", ",", "]")
    val meta = s"""{"metaData":{"id":${q(st.metaId.getOrElse("m"))},""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${q(schema.json)},""" +
      s""""partitionColumns":$parts,"configuration":$cfg,""" +
      s""""createdTime":0}}"""
    rawCommit(table, st.version + 1,
      Seq("""{"commitInfo":{"timestamp":0,"operation":"FOREIGN"}}""") ++
        protocol.toSeq ++ Seq(meta))
  }

  private def dataFilesOnDisk(table: String): Set[String] = {
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def walk(p: Path): Seq[String] =
      fs.listStatus(p).toIndexedSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n == "_delta_log" || n.startsWith(".")) Nil
        else if (s.isDirectory) walk(s.getPath)
        else if (n.endsWith(".parquet")) Seq(s.getPath.toString)
        else Nil
      }
    walk(root).toSet
  }

  private def seed(t: String): Unit = {
    import spark.implicits._
    DeltaInterop.write(
      (1L to 100L).map(i => (i, s"g${i % 4}", i * 2)).toDF("id", "g", "v"),
      t)
  }

  test("delta.appendOnly=true: appends and OPTIMIZE stay legal; " +
    "DELETE, UPDATE, matched MERGE, overwrite, and RESTORE refuse by " +
    "name with the version unmoved") {
    import spark.implicits._
    val t = fresh()
    seed(t)
    DeltaInterop.setProperties(spark, t,
      Map("delta.appendOnly" -> "true"))
    val v = DeltaInterop.state(spark, t, None).version
    // appends pass
    DeltaInterop.write(Seq((101L, "g1", 202L)).toDF("id", "g", "v"), t)
    // insert-only merge is an append — passes
    DeltaInterop.mergeApply(
      Seq((102L, "g2", 204L)).toDF("id", "g", "v"), t, Seq("id"),
      matched = Nil, notMatched = Seq(ManifestLake.MergeInsert()))
    DeltaInterop.read(spark, t).count() shouldBe 102L
    // OPTIMIZE passes (dataChange=false)
    DeltaInterop.optimize(spark, t, targetFileBytes = 1L << 30)
    DeltaInterop.read(spark, t).count() shouldBe 102L
    def refused(op: => Any): String =
      intercept[DeltaInterop.UnsupportedDeltaFeatureException](op)
        .getMessage
    refused(DeltaInterop.delete(spark, t, col("id") === 1L)) should
      include("delta.appendOnly")
    refused(DeltaInterop.update(spark, t, col("id") === 1L,
      Seq("v" -> lit(0L)))) should include("delta.appendOnly")
    refused(DeltaInterop.updateMor(spark, t, col("id") === 1L,
      Seq("v" -> lit(0L)))) should include("delta.appendOnly")
    refused(DeltaInterop.merge(
      Seq((1L, "g1", 0L)).toDF("id", "g", "v"), t, Seq("id"))) should
      include("delta.appendOnly")
    refused(DeltaInterop.write(
      Seq((1L, "g1", 0L)).toDF("id", "g", "v"), t,
      overwrite = true)) should include("delta.appendOnly")
    refused(DeltaInterop.restore(spark, t, 0L)) should
      include("delta.appendOnly")
    DeltaInterop.read(spark, t).count() shouldBe 102L
  }

  test("unknown writer features and minWriterVersion > 7 refuse " +
    "every write verb by name while reads keep working; rowTracking " +
    "appends ASSIGN instead of refusing (r14c), rewrites still " +
    "refuse") {
    import spark.implicits._
    val t = fresh()
    seed(t)
    val st = DeltaInterop.state(spark, t, None)
    rawCommit(t, st.version + 1, Seq(
      """{"commitInfo":{"timestamp":0,"operation":"UPGRADE"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["rowTracking","invariants"]}}"""))
    DeltaInterop.read(spark, t).count() shouldBe 100L
    // appends on a rowTracking table now ASSIGN base row ids
    DeltaInterop.write(Seq((101L, "g1", 1L)).toDF("id", "g", "v"), t)
    val st2 = DeltaInterop.state(spark, t, None)
    st2.files.exists(_.baseRowId.isDefined) shouldBe true
    st2.domains.keySet should contain("delta.rowTracking")
    // the DV DELETE is row-id-safe and passes; OPTIMIZE on a foreign
    // rowTracking table that never recorded materialized column
    // names refuses by name (rewritten rows could not preserve ids)
    DeltaInterop.delete(spark, t, col("id") === 1L)
    DeltaInterop.read(spark, t).count() shouldBe 100L
    intercept[DeltaInterop.UnsupportedDeltaFeatureException](
      DeltaInterop.optimize(spark, t)).getMessage should
      include("materialized")
    // a genuinely unknown feature refuses EVERY verb, appends included
    val t3 = fresh()
    seed(t3)
    rawCommit(t3, 1L, Seq(
      """{"commitInfo":{"timestamp":0,"operation":"UPGRADE"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["futureFeatureX","invariants"]}}"""))
    val e = intercept[DeltaInterop.UnsupportedDeltaFeatureException](
      DeltaInterop.write(Seq((101L, "g1", 1L)).toDF("id", "g", "v"), t3))
    e.getMessage should include("futureFeatureX")
    e.getMessage should not include "invariants]"
    val t2 = fresh()
    seed(t2)
    rawCommit(t2, 1L, Seq(
      """{"commitInfo":{"timestamp":0,"operation":"UPGRADE"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":8}}"""))
    intercept[DeltaInterop.UnsupportedDeltaFeatureException](
      DeltaInterop.write(Seq((101L, "g1", 1L)).toDF("id", "g", "v"), t2))
      .getMessage should include("minWriterVersion=8")
  }

  test("CHECK constraint: existing-data violations refuse ADD " +
    "CONSTRAINT; a violating append aborts with nothing landed " +
    "(version unmoved, staged files deleted); valid appends land; " +
    "DROP CONSTRAINT lifts the obligation") {
    import spark.implicits._
    val t = fresh()
    seed(t)
    intercept[DeltaWriteGate.DeltaConstraintViolationException](
      DeltaInterop.addCheckConstraint(spark, t, "big_v", "v > 100"))
      .getMessage should include("big_v")
    DeltaInterop.addCheckConstraint(spark, t, "pos_v", "v > 0")
    val st = DeltaInterop.state(spark, t, None)
    st.configuration("delta.constraints.pos_v") shouldBe "v > 0"
    st.minWriterVersion should be >= 3
    val filesBefore = dataFilesOnDisk(t)
    val e = intercept[DeltaWriteGate.DeltaConstraintViolationException](
      DeltaInterop.write(
        Seq((200L, "g0", 5L), (201L, "g0", -1L)).toDF("id", "g", "v"), t))
    e.getMessage should include("pos_v")
    DeltaInterop.state(spark, t, None).version shouldBe st.version
    dataFilesOnDisk(t) shouldBe filesBefore // staged files cleaned up
    DeltaInterop.read(spark, t).count() shouldBe 100L
    DeltaInterop.write(Seq((200L, "g0", 5L)).toDF("id", "g", "v"), t)
    DeltaInterop.read(spark, t).count() shouldBe 101L
    // UPDATE rewriting rows into violation aborts too
    intercept[DeltaWriteGate.DeltaConstraintViolationException](
      DeltaInterop.update(spark, t, col("id") === 200L,
        Seq("v" -> lit(-7L))))
    DeltaInterop.read(spark, t).filter(col("v") < 0).count() shouldBe 0L
    // MERGE updating rows into violation aborts
    intercept[DeltaWriteGate.DeltaConstraintViolationException](
      DeltaInterop.merge(
        Seq((200L, "g0", -9L)).toDF("id", "g", "v"), t, Seq("id")))
    DeltaInterop.read(spark, t).filter(col("v") < 0).count() shouldBe 0L
    DeltaInterop.dropCheckConstraint(spark, t, "pos_v")
    DeltaInterop.write(Seq((201L, "g0", -1L)).toDF("id", "g", "v"), t)
    DeltaInterop.read(spark, t).filter(col("v") < 0).count() shouldBe 1L
  }

  test("foreign column invariants and NOT NULL validate on staged " +
    "files; generated columns validate the stored value against the " +
    "recorded expression") {
    import spark.implicits._
    val t = fresh()
    seed(t)
    val st0 = DeltaInterop.state(spark, t, None)
    val genMeta = new MetadataBuilder().putString(
      "delta.generationExpression", "id * 2").build()
    val schema2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("g", StringType, nullable = true),
      StructField("v", LongType, nullable = true,
        new MetadataBuilder().putString("delta.invariants",
          """{"expression":{"expression":"v < 1000"}}""").build())))
    foreignMetadata(t, schema2, st0.configuration)
    // invariant violation aborts
    intercept[DeltaWriteGate.DeltaConstraintViolationException](
      DeltaInterop.write(Seq((300L, "g0", 5000L)).toDF("id", "g", "v"), t))
      .getMessage should include("invariant on v")
    // NOT NULL (nullable=false on id) — an UPDATE nulling it aborts
    intercept[DeltaWriteGate.DeltaConstraintViolationException](
      DeltaInterop.update(spark, t, col("id") === 1L,
        Seq("id" -> lit(null).cast(LongType))))
      .getMessage should include("id NOT NULL")
    DeltaInterop.write(Seq((300L, "g0", 600L)).toDF("id", "g", "v"), t)
    DeltaInterop.read(spark, t).count() shouldBe 101L
    // generated column: v must equal id * 2
    val t2 = fresh()
    seed(t2)
    val st2 = DeltaInterop.state(spark, t2, None)
    foreignMetadata(t2, StructType(Seq(
      StructField("id", LongType),
      StructField("g", StringType),
      StructField("v", LongType, nullable = true, genMeta))),
      st2.configuration)
    intercept[DeltaWriteGate.DeltaConstraintViolationException](
      DeltaInterop.write(Seq((400L, "g0", 9L)).toDF("id", "g", "v"), t2))
      .getMessage should include("generated column v")
    DeltaInterop.write(Seq((400L, "g0", 800L)).toDF("id", "g", "v"), t2)
    DeltaInterop.read(spark, t2).count() shouldBe 101L
    // an append OMITTING the generated column DERIVES it from the
    // recorded expression — delta-spark's writer behavior
    DeltaInterop.write(Seq((500L, "g1")).toDF("id", "g"), t2)
    DeltaInterop.read(spark, t2).filter(col("id") === 500L)
      .select(col("v")).collect().head.getLong(0) shouldBe 1000L
  }

  test("identity-column metadata refuses data-adding commits by " +
    "name; nested obligations refuse rather than skip") {
    import spark.implicits._
    val t = fresh()
    seed(t)
    val st = DeltaInterop.state(spark, t, None)
    foreignMetadata(t, StructType(Seq(
      StructField("id", LongType, nullable = true,
        new MetadataBuilder().putLong("delta.identity.start", 1L)
          .putLong("delta.identity.step", 1L).build()),
      StructField("g", StringType),
      StructField("v", LongType))), st.configuration)
    intercept[DeltaInterop.UnsupportedDeltaFeatureException](
      DeltaInterop.write(Seq((500L, "g0", 1L)).toDF("id", "g", "v"), t))
      .getMessage should include("IDENTITY")
    // deletes (no new rows) still legal on identity tables
    DeltaInterop.delete(spark, t, col("id") === 1L)
      .rowsAffected shouldBe 1L

    // nested obligations refuse on a PLAIN APPEND (the
    // identityHandled=true path — r15 regression fix: the refusal
    // must not hide behind the identity check)
    val t2 = fresh()
    seed(t2)
    val st2 = DeltaInterop.state(spark, t2, None)
    val nestedSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("g", StringType),
      StructField("v", LongType),
      StructField("meta", StructType(Seq(
        StructField("score", LongType, nullable = true,
          new MetadataBuilder().putString("delta.invariants",
            """{"expression":{"expression":"meta.score > 0"}}""")
            .build()))))))
    foreignMetadata(t2, nestedSchema, st2.configuration)
    intercept[DeltaInterop.UnsupportedDeltaFeatureException](
      DeltaInterop.write(
        Seq((500L, "g0", 1L, 7L)).toDF("id", "g", "v", "score")
          .select(col("id"), col("g"), col("v"),
            struct(col("score")).as("meta")), t2))
      .getMessage should include("meta.score")
  }

  test("checkpoints PRESERVE domainMetadata actions (r14c): a " +
    "foreign domain survives replay-from-checkpoint; removed " +
    "domains drop") {
    import spark.implicits._
    val t = fresh()
    seed(t)
    rawCommit(t, 1L, Seq(
      """{"commitInfo":{"timestamp":0,"operation":"UPGRADE"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["domainMetadata"]}}""",
      """{"domainMetadata":{"domain":"d1","configuration":"{\"x\":1}",""" +
        """"removed":false}}""",
      """{"domainMetadata":{"domain":"d2","configuration":"{}",""" +
        """"removed":false}}""",
      """{"domainMetadata":{"domain":"d2","configuration":"{}",""" +
        """"removed":true}}"""))
    DeltaInterop.checkpoint(spark, t)
    val st = DeltaInterop.state(spark, t, None)
    st.domains shouldBe Map("d1" -> """{"x":1}""")
    // data commits are unaffected — appends never touch domains
    DeltaInterop.write(Seq((101L, "g1", 1L)).toDF("id", "g", "v"), t)
    DeltaInterop.read(spark, t).count() shouldBe 101L
    DeltaInterop.state(spark, t, None)
      .domains.keySet should contain("d1")
  }

  test("DROP COLUMN refuses when a CHECK constraint references the " +
    "column") {
    import spark.implicits._
    val t = fresh()
    DeltaInterop.write(
      (1L to 10L).map(i => (i, s"g${i % 2}", i)).toDF("id", "g", "v"),
      t, columnMapping = "name")
    DeltaInterop.addCheckConstraint(spark, t, "pos_v", "v > 0")
    intercept[DeltaInterop.UnsupportedDeltaFeatureException](
      DeltaInterop.dropColumns(spark, t, Seq("v")))
      .getMessage should include("pos_v")
    DeltaInterop.dropCheckConstraint(spark, t, "pos_v")
    DeltaInterop.dropColumns(spark, t, Seq("v"))
    DeltaInterop.read(spark, t).columns.toSeq shouldBe Seq("id", "g")
  }

  test("the SQL surface inherits every refusal: DELETE/UPDATE/MERGE " +
    "on an append-only graft_delta table refuse; INSERT INTO passes") {
    import spark.implicits._
    val t = fresh()
    seed(t)
    DeltaInterop.setProperties(spark, t, Map("delta.appendOnly" -> "true"))
    DeltaSql.register("wgate_ao", t)
    spark.sql("INSERT INTO graft_delta.wgate_ao VALUES " +
      "(CAST(101 AS BIGINT), 'g1', CAST(202 AS BIGINT))")
    DeltaInterop.read(spark, t).count() shouldBe 101L
    intercept[DeltaInterop.UnsupportedDeltaFeatureException](
      spark.sql("DELETE FROM graft_delta.wgate_ao WHERE id = 1"))
    intercept[DeltaInterop.UnsupportedDeltaFeatureException](
      spark.sql("UPDATE graft_delta.wgate_ao SET v = 0 WHERE id = 1"))
    DeltaInterop.read(spark, t).count() shouldBe 101L
    // CHECK constraints bind the SQL verbs too: INSERT and UPDATE of
    // a constrained table validate staged rows before publishing
    val t2 = fresh()
    seed(t2)
    DeltaInterop.addCheckConstraint(spark, t2, "pos_v", "v > 0")
    DeltaSql.register("wgate_ck", t2)
    intercept[DeltaWriteGate.DeltaConstraintViolationException](
      spark.sql("INSERT INTO graft_delta.wgate_ck VALUES " +
        "(CAST(200 AS BIGINT), 'g0', CAST(-5 AS BIGINT))"))
    DeltaInterop.read(spark, t2).count() shouldBe 100L
    spark.sql("INSERT INTO graft_delta.wgate_ck VALUES " +
      "(CAST(200 AS BIGINT), 'g0', CAST(5 AS BIGINT))")
    DeltaInterop.read(spark, t2).count() shouldBe 101L
    intercept[DeltaWriteGate.DeltaConstraintViolationException](
      spark.sql("UPDATE graft_delta.wgate_ck SET v = -1 WHERE id = 200"))
    DeltaInterop.read(spark, t2).filter(col("v") < 0)
      .count() shouldBe 0L
  }

  test("liquid clustering (r15): a clustering-featured table accepts " +
    "appends, OPTIMIZE re-clusters on the RECORDED columns (disjoint " +
    "per-file ranges) and the domain survives; nested or unreadable " +
    "clustering domains refuse by name") {
    import spark.implicits._
    val t = fresh()
    // 4 files whose v ranges fully INTERLEAVE (i*4 + k)
    (0 until 4).foreach { k =>
      DeltaInterop.write(
        (0L until 50L).map(i => (k * 1000L + i, "g", i * 4 + k))
          .toDF("id", "g", "v").coalesce(1), t)
    }
    // through the SQL door — ALTER TABLE … CLUSTER BY
    DeltaSql.register("wgate_lc", t)
    spark.sql("ALTER TABLE graft_delta.wgate_lc CLUSTER BY (v)")
    val st0 = DeltaInterop.state(spark, t, None)
    st0.writerFeatures should contain allOf ("clustering",
      "domainMetadata")
    st0.domains.keySet should contain(DeltaInterop.ClusteringDomain)
    // appends stay legal — the protocol allows unclustered adds
    DeltaInterop.write(Seq((9000L, "g", 9000L)).toDF("id", "g", "v"), t)
    // OPTIMIZE with NO explicit z-order re-clusters on v
    val total = DeltaInterop.state(spark, t, None).files.map(_.size).sum
    DeltaInterop.optimize(spark, t, targetFileBytes = total / 2 + 1)
    val st1 = DeltaInterop.state(spark, t, None)
    st1.files.size shouldBe 2
    st1.domains.keySet should contain(DeltaInterop.ClusteringDomain)
    // per-file v bounds are DISJOINT after the re-cluster
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val bounds = st1.files.map { a =>
      val j = JsonMethods.parse(a.stats.get)
      def v(of: String): Long = (j \ of \ "v") match {
        case JInt(n) => n.toLong
        case JLong(n) => n
        case other => fail(s"no v bound in $other")
      }
      (v("minValues"), v("maxValues"))
    }.sortBy(_._1)
    bounds.head._2 should be < bounds(1)._1
    DeltaInterop.read(spark, t).count() shouldBe 201L
    // checkpoints preserve the clustering domain
    DeltaInterop.checkpoint(spark, t)
    DeltaInterop.state(spark, t, None)
      .domains.keySet should contain(DeltaInterop.ClusteringDomain)

    // a NESTED clustering column refuses by name at OPTIMIZE
    val t2 = fresh()
    seed(t2)
    DeltaInterop.enableClustering(spark, t2, Seq("v"))
    rawCommit(t2, DeltaInterop.state(spark, t2, None).version + 1, Seq(
      """{"commitInfo":{"timestamp":0,"operation":"FOREIGN"}}""",
      """{"domainMetadata":{"domain":"delta.clustering",""" +
        """"configuration":"{\"clusteringColumns\":[[\"a\",\"b\"]]}",""" +
        """"removed":false}}"""))
    intercept[DeltaInterop.UnsupportedDeltaFeatureException](
      DeltaInterop.optimize(spark, t2))
      .getMessage should include("NESTED")
    // an uninterpretable domain configuration refuses by name
    rawCommit(t2, DeltaInterop.state(spark, t2, None).version + 1, Seq(
      """{"commitInfo":{"timestamp":0,"operation":"FOREIGN"}}""",
      """{"domainMetadata":{"domain":"delta.clustering",""" +
        """"configuration":"oops","removed":false}}"""))
    intercept[DeltaInterop.UnsupportedDeltaFeatureException](
      DeltaInterop.optimize(spark, t2))
      .getMessage should include("cannot interpret")
  }

  test("checkpointProtection (r15): VACUUM refuses by name when its " +
    "log cleanup would cross the protection line; cleanup above the " +
    "line stays legal") {
    import spark.implicits._
    val t = fresh()
    seed(t)
    (1 to 3).foreach(i => DeltaInterop.write(
      Seq((100L + i, "g0", i.toLong)).toDF("id", "g", "v"), t))
    val st = DeltaInterop.state(spark, t, None)
    foreignMetadata(t, st.schema, st.configuration +
      ("delta.requireCheckpointProtectionBeforeVersion" -> "3"),
      protocol = Some(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
          """"writerFeatures":["checkpointProtection","invariants"]}}"""))
    // head is now v4; keepLast=2 would drop v0-v2 — below the line
    intercept[DeltaInterop.UnsupportedDeltaFeatureException](
      DeltaInterop.vacuum(spark, t, keepLast = 2))
      .getMessage should include("checkpointProtection")
    // a vacuum that drops NO protected version stays legal
    DeltaInterop.vacuum(spark, t, keepLast = 5)
    DeltaInterop.read(spark, t).count() shouldBe 103L
  }

  test("icebergCompatV2 (r15): a compat-featured mapped table " +
    "accepts writes and every staged data file carries " +
    "parquet.field.id equal to the column's mapping id; unmapped or " +
    "DV-enabled compat tables refuse by name") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val t = fresh()
    DeltaInterop.write(
      (1L to 10L).map(i => (i, s"g${i % 2}", i)).toDF("id", "g", "v"),
      t, columnMapping = "name")
    val st = DeltaInterop.state(spark, t, None)
    foreignMetadata(t, st.schema,
      st.configuration + ("delta.enableIcebergCompatV2" -> "true"),
      protocol = Some(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":7,""" +
          """"readerFeatures":["columnMapping"],""" +
          """"writerFeatures":["columnMapping","icebergCompatV2",""" +
          """"invariants","appendOnly"]}}"""))
    val pre = DeltaInterop.state(spark, t, None).files
      .map(_.path).toSet
    DeltaInterop.write(Seq((100L, "g0", 100L)).toDF("id", "g", "v"), t)
    DeltaInterop.read(spark, t).count() shouldBe 11L
    // the NEW file's parquet footer records field ids = mapping ids
    val st2 = DeltaInterop.state(spark, t, None)
    val mappingIds: Map[String, Long] = st2.schema.fields.map(f =>
      f.metadata.getString("delta.columnMapping.physicalName") ->
        f.metadata.getLong("delta.columnMapping.id")).toMap
    val newest = st2.files.filterNot(a => pre(a.path)).head
    val conf = spark.sessionState.newHadoopConf()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new Path(t, newest.path), conf))
    val footerIds = try reader.getFooter.getFileMetaData.getSchema
      .getFields.asScala.flatMap(f => Option(f.getId)
        .map(id => f.getName -> id.intValue.toLong)).toMap
    finally reader.close()
    footerIds shouldBe mappingIds
    // malformed compat: mapping mode none refuses by name
    val t2 = fresh()
    seed(t2)
    val stb = DeltaInterop.state(spark, t2, None)
    foreignMetadata(t2, stb.schema,
      stb.configuration + ("delta.enableIcebergCompatV2" -> "true"),
      protocol = Some(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
          """"writerFeatures":["icebergCompatV2","invariants"]}}"""))
    intercept[DeltaInterop.UnsupportedDeltaFeatureException](
      DeltaInterop.write(Seq((101L, "g1", 1L)).toDF("id", "g", "v"), t2))
      .getMessage should include("column mapping")
    // malformed compat: deletion vectors enabled refuses by name
    val t3 = fresh()
    DeltaInterop.write(
      (1L to 10L).map(i => (i, s"g${i % 2}", i)).toDF("id", "g", "v"),
      t3, columnMapping = "name")
    val stc = DeltaInterop.state(spark, t3, None)
    foreignMetadata(t3, stc.schema,
      stc.configuration +
        ("delta.enableIcebergCompatV2" -> "true") +
        ("delta.enableDeletionVectors" -> "true"),
      protocol = Some(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["columnMapping","deletionVectors"],""" +
          """"writerFeatures":["columnMapping","deletionVectors",""" +
          """"icebergCompatV2"]}}"""))
    intercept[DeltaInterop.UnsupportedDeltaFeatureException](
      DeltaInterop.write(Seq((101L, "g1", 1L)).toDF("id", "g", "v"), t3))
      .getMessage should include("deletion vectors")
  }
}
