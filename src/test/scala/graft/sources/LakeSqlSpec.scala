package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the SQL surface over manifest tables: SELECT / VERSION AS OF /
  * INSERT / DELETE FROM / MERGE INTO on `graft_lake.<name>`, resolved
  * by the Catalyst rule — and that the rewrite keeps the NATIVE parquet
  * scan (the reason this is a resolution rule, not a DSv2 catalog). */
class LakeSqlSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def freshTable(name: String): String = {
    val path = java.nio.file.Files
      .createTempDirectory("graft-lakesql").toString + "/t"
    LakeSql.register(name, path)
    path
  }

  private def seed(path: String, n: Int = 100): Unit = {
    import spark.implicits._
    ManifestLake.write(
      (1 to n).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), path)
  }

  test("SELECT over graft_lake resolves to the manifest snapshot through " +
    "the native parquet scan") {
    seed(freshTable("sel"))
    val df = spark.sql("SELECT count(*) AS n FROM graft_lake.sel")
    df.collect().head.getLong(0) shouldBe 100L
    // the physical plan is the built-in columnar parquet scan — not a
    // custom reader (this is the vectorization-preserving design choice)
    val physical = spark.sql("SELECT * FROM graft_lake.sel WHERE id > 90")
    physical.count() shouldBe 10
    val plan = physical.queryExecution.executedPlan.toString
    plan should include("FileScan parquet")
    plan should include("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]")
  }

  test("VERSION AS OF reads a pinned snapshot; the head moves on") {
    import spark.implicits._
    val path = freshTable("tt")
    seed(path)
    ManifestLake.write(
      (101 to 150).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), path)
    spark.sql("SELECT count(*) AS n FROM graft_lake.tt")
      .collect().head.getLong(0) shouldBe 150L
    spark.sql("SELECT count(*) AS n FROM graft_lake.tt VERSION AS OF 1")
      .collect().head.getLong(0) shouldBe 100L
    // joins mixing versions work: both sides are independent snapshots
    spark.sql(
      """SELECT count(*) AS n FROM graft_lake.tt cur
        |LEFT ANTI JOIN (SELECT id FROM graft_lake.tt VERSION AS OF 1) old
        |ON cur.id = old.id""".stripMargin)
      .collect().head.getLong(0) shouldBe 50L
  }

  test("INSERT INTO appends a version; INSERT OVERWRITE replaces") {
    val path = freshTable("ins")
    seed(path, 10)
    spark.sql("INSERT INTO graft_lake.ins " +
      "SELECT id + 100, concat('n', id) FROM graft_lake.ins")
    ManifestLake.read(spark, path).count() shouldBe 20
    ManifestLake.currentVersion(spark, path) shouldBe Some(2L)
    spark.sql("INSERT OVERWRITE graft_lake.ins " +
      "SELECT * FROM graft_lake.ins WHERE id <= 5")
    ManifestLake.read(spark, path).count() shouldBe 5
  }

  test("DELETE FROM removes exactly the matching rows (qualified " +
    "predicates unqualify; NULL-evaluating rows survive)") {
    import spark.implicits._
    val path = freshTable("del")
    ManifestLake.write(
      Seq((1L, Some(900.0)), (2L, None), (3L, Some(1200.0)), (4L, Some(100.0)))
        .toDF("id", "price"), path)
    spark.sql("DELETE FROM graft_lake.del WHERE del.price < 950.0")
    ManifestLake.read(spark, path).select("id").as[Long].collect()
      .sorted shouldBe Array(2L, 3L) // NULL-price row kept: SQL semantics
  }

  test("MERGE INTO upserts by the ON equi-keys and rewrites only " +
    "touched files") {
    import spark.implicits._
    val path = freshTable("mrg")
    ManifestLake.writeClustered(
      (1 to 4000).map(i => (i.toLong, s"p$i")).toDF("id", "payload"),
      path, "id", nFiles = 4)
    val before = ManifestLake.snapshot(spark, path)
    ((10 to 20).map(i => (i.toLong, s"UPD_$i")) ++
      Seq((9001L, "NEW"))).toDF("id", "payload")
      .createOrReplaceTempView("mrg_updates")
    spark.sql(
      """MERGE INTO graft_lake.mrg t USING mrg_updates u ON t.id = u.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = ManifestLake.snapshot(spark, path)
    // manifest-stats pruning carried 3 of 4 files over verbatim
    after.entries.map(_.line)
      .intersect(before.entries.map(_.line)) should have length 3
    val got = ManifestLake.read(spark, path).as[(Long, String)]
      .collect().toMap
    got should have size 4001
    got(15L) shouldBe "UPD_15"
    got(9L) shouldBe "p9"
    got(9001L) shouldBe "NEW"
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the target on the simple " +
    "upsert shape; clause shapes keep refusing by name") {
    import spark.implicits._
    val path = freshTable("mrgevo")
    ManifestLake.write((1 to 20).map(i => (i.toLong, s"p$i"))
      .toDF("id", "payload"), path)
    Seq((5L, "UPD", "extra5"), (99L, "NEW", "extra99"))
      .toDF("id", "payload", "note")
      .createOrReplaceTempView("mrgevo_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO graft_lake.mrgevo t
        |USING mrgevo_src u ON t.id = u.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = ManifestLake.read(spark, path)
    got.columns.sorted shouldBe Array("id", "note", "payload")
    got.count() shouldBe 21L
    got.filter($"id" === 5L).select($"note").as[String]
      .head() shouldBe "extra5"
    got.filter($"id" === 1L).select($"note").isEmpty shouldBe false
    got.filter($"id" === 1L).select($"note").as[String]
      .collect() shouldBe Array(null)
    // clause shapes still refuse the evolution flag
    intercept[UnsupportedOperationException] {
      spark.sql(
        """MERGE WITH SCHEMA EVOLUTION INTO graft_lake.mrgevo t
          |USING mrgevo_src u ON t.id = u.id
          |WHEN MATCHED THEN DELETE""".stripMargin)
    }.getMessage should include("SCHEMA EVOLUTION")
  }

  test("MERGE runs the full clause surface from SQL: conditional " +
    "matched DELETE/UPDATE, conditional INSERT, first-match-wins, " +
    "ambiguous bare references rejected") {
    import spark.implicits._
    val path = freshTable("mfull")
    ManifestLake.writeClustered(
      (1 to 1000).map(i => (i.toLong, i * 1.0, s"p$i"))
        .toDF("id", "v", "payload"),
      path, "id", nFiles = 4)
    Seq(
      (1L, "del", 0.0),
      (2L, "upd", 100.0),
      (3L, "other", 0.0), // matched, no clause fires → unchanged
      (9001L, "ins", 5.0),
      (9002L, "skip", 6.0)) // not matched, condition false → dropped
      .toDF("id", "op", "nv").createOrReplaceTempView("mfull_src")
    spark.sql(
      """MERGE INTO graft_lake.mfull t USING mfull_src s ON t.id = s.id
        |WHEN MATCHED AND s.op = 'del' THEN DELETE
        |WHEN MATCHED AND s.op = 'upd' THEN UPDATE SET v = t.v + s.nv
        |WHEN NOT MATCHED AND s.op = 'ins' THEN
        |  INSERT (id, v, payload) VALUES (s.id, s.nv, 'inserted')
        |""".stripMargin)
    val got = ManifestLake.read(spark, path)
    got.count() shouldBe 1000 // one deleted, one inserted
    got.filter($"id" === 1L).count() shouldBe 0
    got.filter($"id" === 2L).select("v").as[Double].head() shouldBe 102.0
    got.filter($"id" === 3L).select("v").as[Double].head() shouldBe 3.0
    val ins = got.filter($"id" === 9001L)
      .select("v", "payload").as[(Double, String)].head()
    ins shouldBe ((5.0, "inserted"))
    got.filter($"id" === 9002L).count() shouldBe 0

    // a bare reference both sides carry must be qualified
    val amb = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft_lake.mfull t USING mfull_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = id + 0.0""".stripMargin)
    }
    amb.getMessage should include("ambiguous")
    // NOT MATCHED BY SOURCE stays a named error (O(table) rewrite) —
    // with the small-table fast path disabled; this table's recorded
    // size would otherwise run it whole-table automatically
    spark.conf.set(ManifestLake.NmbsSmallTableBytesConf, "0")
    val nbs = try intercept[Exception] {
      spark.sql(
        """MERGE INTO graft_lake.mfull t USING mfull_src s ON t.id = s.id
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    } finally spark.conf.unset(ManifestLake.NmbsSmallTableBytesConf)
    nbs.getMessage should include("NOT MATCHED BY SOURCE")
    // a non-equi ON condition is equally rejected
    val e2 = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft_lake.mfull t USING mfull_src s ON t.id > s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    e2.getMessage should include("t.key = s.key")
  }

  test("SQL MERGE WHEN NOT MATCHED BY SOURCE: an ON-scope conjunct " +
    "bounds the sync; the fullTableMerge conf unlocks the whole-table " +
    "mirror; source references in NMBS clauses are rejected") {
    import spark.implicits._
    val path = freshTable("nmbs")
    (0 until 4).foreach { b =>
      ManifestLake.write(
        (b * 250 + 1 to b * 250 + 250).map(i => (i.toLong, i * 1.0))
          .toDF("id", "v").repartition(1),
        path, append = b > 0, statsCols = Seq("id"))
    }
    // "today's" snapshot of keys ≤ 500: every 10th key vanished, every
    // 4th value changed
    (1 to 500).filter(_ % 10 != 0)
      .map(i => (i.toLong, if (i % 4 == 0) -1.0 else i * 1.0))
      .toDF("id", "v").createOrReplaceTempView("nmbs_src")
    spark.sql(
      """MERGE INTO graft_lake.nmbs t USING nmbs_src s
        |ON t.id = s.id AND t.id <= 500
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got = ManifestLake.read(spark, path)
    got.count() shouldBe (500 - 50) + 500
    got.filter($"id" <= 500L && $"id" % 10 === 0).count() shouldBe 0
    got.filter($"id" === 8L).select("v").as[Double].head() shouldBe -1.0
    got.filter($"id" === 900L).select("v").as[Double].head() shouldBe 900.0
    ManifestLake.fastCount(spark, path) shouldBe got.count()
    // out-of-scope files carried verbatim, in-scope matchless file(s)
    // tombstoned MOR — at least one entry wears a vector
    val snap = ManifestLake.snapshot(spark, path)
    snap.entries.filter(e => e.range("id")
      .exists(_.min > BigDecimal(500))).foreach(_.dv shouldBe empty)
    // whole-table mirror: unscoped NMBS on a NOT-provably-small table
    // needs the conf opt-in (threshold 0 disables the automatic path)
    spark.conf.set(ManifestLake.NmbsSmallTableBytesConf, "0")
    val e = try intercept[Exception] {
      spark.sql(
        """MERGE INTO graft_lake.nmbs t USING nmbs_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    } finally spark.conf.unset(ManifestLake.NmbsSmallTableBytesConf)
    e.getMessage should include("fullTableMerge")
    spark.conf.set(LakeSql.FullTableMergeConf, "true")
    try {
      spark.sql(
        """MERGE INTO graft_lake.nmbs t USING nmbs_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    } finally spark.conf.unset(LakeSql.FullTableMergeConf)
    // the mirror now equals the source exactly
    val mirrored = ManifestLake.read(spark, path)
    mirrored.count() shouldBe 450
    mirrored.select("id").as[Long].collect().sorted shouldBe
      (1 to 500).filter(_ % 10 != 0).map(_.toLong).toArray
    // NMBS clauses cannot reference the source
    val badRef = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft_lake.nmbs t USING nmbs_src s
          |ON t.id = s.id AND t.id <= 500
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = s.v""".stripMargin)
    }
    badRef.getMessage should include("target columns only")
  }

  test("a SQL point lookup on a bucket-partitioned table scans only " +
    "the key's bucket — the filter stays in the plan, dead buckets " +
    "never enter it") {
    import spark.implicits._
    val path = freshTable("bkt")
    ManifestLake.writeBucketPartitioned(
      (0 until 4000).map(i => (i.toLong, s"payload_$i"))
        .toDF("id", "payload"), path, "id", nBuckets = 8)
    val df = spark.sql(
      "SELECT payload FROM graft_lake.bkt WHERE id = 1234")
    df.collect().map(_.getString(0)) shouldBe Array("payload_1234")
    val dirs = df.inputFiles.flatMap(_.split('/')
      .find(_.startsWith("p_bucket="))).distinct
    dirs.length shouldBe 1
    // a non-equality shape is left to the plain read: same answer
    spark.sql("SELECT count(*) AS n FROM graft_lake.bkt WHERE id < 10")
      .collect().head.getLong(0) shouldBe 10L
  }

  test("day and bucket pruning COMPOSE in SQL: a doubly-partitioned " +
    "table answers ts-range + key-equality from 1 bucket of the " +
    "matching days only") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, date_format, hash, lit,
      pmod}
    val path = freshTable("dual")
    def ts(day: Int) = java.sql.Timestamp.from(
      java.time.LocalDateTime.of(2024, 9, day, 12, 0)
        .toInstant(java.time.ZoneOffset.UTC))
    // 4 days × 100 keys, partitioned by BOTH generations (hand-built:
    // the writers emit one level each; the pruners only need the
    // recorded constraints)
    val rows = (1 to 4).flatMap(d => (0 until 100).map(i =>
      (i.toLong, ts(d), s"v$d-$i"))).toDF("id", "ts", "payload")
      .withColumn("p_day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("p_bucket", pmod(hash(col("id")), lit(4)))
    ManifestLake.write(rows, path, partitionBy = Seq("p_day", "p_bucket"))
    ManifestLake.addConstraint(spark, path, "p_day_gen",
      "p_day = date_format(ts, 'yyyy-MM-dd') /* tz=UTC */")
    ManifestLake.addConstraint(spark, path, "p_bucket_gen",
      "p_bucket = pmod(hash(id), 4)")
    val q = spark.sql(
      """SELECT payload FROM graft_lake.dual
        |WHERE ts >= TIMESTAMP '2024-09-02 00:00:00'
        |  AND ts <= TIMESTAMP '2024-09-03 23:59:59'
        |  AND id = 7""".stripMargin)
    q.collect().map(_.getString(0)).sorted shouldBe
      Array("v2-7", "v3-7")
    // every scanned file sits in ONE bucket of the two matching days
    val pairs = q.inputFiles.map { f =>
      (f.split('/').find(_.startsWith("p_day=")).get,
        f.split('/').find(_.startsWith("p_bucket=")).get)
    }.distinct
    pairs.map(_._2).distinct.length shouldBe 1
    // the +1s end-bound conservatively keeps the boundary day 09-04;
    // 09-01 is provably out of range and must be gone
    pairs.map(_._1).toSet.subsetOf(Set("p_day=2024-09-02",
      "p_day=2024-09-03", "p_day=2024-09-04")) shouldBe true
    pairs.map(_._1) should not contain "p_day=2024-09-01"
  }

  test("SQL MERGE NMBS on a provably small table: a Delta-verbatim " +
    "unscoped full sync runs with NO flag — the manifest's recorded " +
    "size is the proof; shrinking the threshold restores the error") {
    import spark.implicits._
    val path = freshTable("nmbs_small")
    ManifestLake.write(
      (1 to 300).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
        .repartition(2),
      path, statsCols = Seq("id"))
    // the source kept only the odd keys; a Delta user writes the
    // standard three-clause mirror with no scope and no conf
    (1 to 300).filter(_ % 2 == 1).map(i => (i.toLong, i + 0.5))
      .toDF("id", "v").createOrReplaceTempView("nmbs_small_src")
    spark.sql(
      """MERGE INTO graft_lake.nmbs_small t USING nmbs_small_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got = ManifestLake.read(spark, path)
    got.count() shouldBe 150
    got.select("id").as[Long].collect().sorted shouldBe
      (1 to 300).filter(_ % 2 == 1).map(_.toLong).toArray
    got.filter($"id" === 3L).select("v").as[Double].head() shouldBe 3.5
    // a threshold the table does NOT fit re-arms the named guard
    spark.conf.set(ManifestLake.NmbsSmallTableBytesConf, "1")
    try {
      intercept[Exception] {
        spark.sql(
          """MERGE INTO graft_lake.nmbs_small t USING nmbs_small_src s
            |ON t.id = s.id
            |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      }.getMessage should include("fullTableMerge")
    } finally spark.conf.unset(ManifestLake.NmbsSmallTableBytesConf)
  }

  test("SELECT COUNT(*) with no predicate routes to the metadata count: " +
    "no FileScan in the plan, answers without touching data; filtered " +
    "and grouped counts still scan") {
    import spark.implicits._
    val path = freshTable("cnt")
    seed(path, 500)
    ManifestLake.write(
      (501 to 520).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), path)
    val q = spark.sql("SELECT COUNT(*) FROM graft_lake.cnt")
    q.collect().head.getLong(0) shouldBe 520L
    q.queryExecution.executedPlan.toString should not include "FileScan"
    // aliased form keeps the alias
    val q2 = spark.sql("SELECT COUNT(*) AS n FROM graft_lake.cnt")
    q2.columns.toSeq shouldBe Seq("n")
    q2.collect().head.getLong(0) shouldBe 520L
    // proof of zero data IO: the metadata count still answers after the
    // data files are deleted out-of-band (a scan would crash)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ManifestLake.snapshot(spark, path).files.foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(p, f), false))
    spark.sql("SELECT count(*) FROM graft_lake.cnt")
      .collect().head.getLong(0) shouldBe 520L

    // VERSION AS OF counts answer from that version's manifest — also
    // metadata-only (the data files are already gone)
    val qv = spark.sql(
      "SELECT COUNT(*) FROM graft_lake.cnt VERSION AS OF 1")
    qv.collect().head.getLong(0) shouldBe 500L
    qv.queryExecution.executedPlan.toString should not include "FileScan"

    // non-eligible shapes still go through the scan — and stay correct
    val path2 = freshTable("cnt2")
    seed(path2, 100)
    val filtered = spark.sql(
      "SELECT COUNT(*) FROM graft_lake.cnt2 WHERE id <= 40")
    filtered.queryExecution.executedPlan.toString should include("FileScan")
    filtered.collect().head.getLong(0) shouldBe 40L
    spark.sql(
      "SELECT COUNT(DISTINCT payload) FROM graft_lake.cnt2")
      .collect().head.getLong(0) shouldBe 100L
    spark.sql(
      "SELECT COUNT(*), MAX(id) FROM graft_lake.cnt2")
      .collect().head.getLong(0) shouldBe 100L
  }

  test("SELECT COUNT/MIN/MAX combinations serve from manifest stats " +
    "when proven; deletion vectors, missing stats and strings scan") {
    import spark.implicits._
    val path = freshTable("sagg")
    ManifestLake.writeClustered(
      (1 to 900).map(i => (i.toLong, i * 2.5, s"p$i"))
        .toDF("id", "price", "payload"),
      path, "id", nFiles = 4, extraStatsCols = Seq("price"))
    val q = spark.sql(
      """SELECT COUNT(*) AS n, MIN(id) AS lo, MAX(id) AS hi,
        |  MAX(price) AS top FROM graft_lake.sagg""".stripMargin)
    q.queryExecution.executedPlan.toString should not include "FileScan"
    q.collect().head.toSeq shouldBe Seq(900L, 1L, 900L, 2250.0)
    q.columns.toSeq shouldBe Seq("n", "lo", "hi", "top")
    // default names match the scan's
    spark.sql("SELECT MIN(id), COUNT(*) FROM graft_lake.sagg")
      .columns.toSeq shouldBe Seq("min(id)", "count(1)")
    // un-stats'd column (payload is a string; no recorded exact range)
    // falls through to the scan and stays correct
    val qs = spark.sql("SELECT MIN(payload) FROM graft_lake.sagg")
    qs.queryExecution.executedPlan.toString should include("FileScan")
    qs.collect().head.getString(0) shouldBe "p1"
    // a deletion vector may have removed the extremal row: the route
    // declines and the scan answers exactly
    ManifestLake.deleteMor(spark, path,
      org.apache.spark.sql.functions.col("id") === 1L)
    val qdv = spark.sql(
      "SELECT MIN(id) AS lo, COUNT(*) AS n FROM graft_lake.sagg")
    qdv.queryExecution.executedPlan.toString should include("FileScan")
    qdv.collect().head.toSeq shouldBe Seq(2L, 899L)
    // filtered/grouped shapes untouched
    spark.sql("SELECT MIN(id) FROM graft_lake.sagg WHERE id > 10")
      .collect().head.getLong(0) shouldBe 11L
  }

  test("unregistered names fall through to the normal analyzer error") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_lake.never_registered").collect()
    }
    e.getMessage.toLowerCase should include("not") // table not found
  }

  test("TIMESTAMP AS OF reads the snapshot current at that wall-clock " +
    "time (session-TZ literal)") {
    import spark.implicits._
    val path = freshTable("tsv")
    val prevClock = ManifestLake.clock
    try {
      ManifestLake.clock = () => 2000L // 1970-01-01 00:00:02 UTC
      seed(path, 10)
      ManifestLake.clock = () => 4000L
      ManifestLake.write(
        (11 to 30).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), path)
      spark.sql("SELECT count(*) AS n FROM graft_lake.tsv " +
        "TIMESTAMP AS OF '1970-01-01 00:00:03'")
        .collect().head.getLong(0) shouldBe 10L
      spark.sql("SELECT count(*) AS n FROM graft_lake.tsv " +
        "TIMESTAMP AS OF '1970-01-01 00:00:05'")
        .collect().head.getLong(0) shouldBe 30L
      intercept[Exception] {
        spark.sql("SELECT * FROM graft_lake.tsv " +
          "TIMESTAMP AS OF '1970-01-01 00:00:01'").collect()
      }.getMessage should include("predates the first retained commit")
    } finally ManifestLake.clock = prevClock
  }

  test("ALTER TABLE ADD COLUMNS widens the schema from SQL without " +
    "touching data; unsupported shapes raise named errors") {
    val path = freshTable("alt")
    seed(path, 10)
    val filesBefore = ManifestLake.snapshot(spark, path).files
    spark.sql("ALTER TABLE graft_lake.alt ADD COLUMNS (score DOUBLE, " +
      "tag STRING)")
    ManifestLake.snapshot(spark, path).files shouldBe filesBefore
    val head = spark.sql("SELECT * FROM graft_lake.alt")
    head.columns.toSeq shouldBe Seq("id", "payload", "score", "tag")
    head.count() shouldBe 10
    spark.sql("SELECT count(*) AS n FROM graft_lake.alt " +
      "WHERE score IS NULL").collect().head.getLong(0) shouldBe 10
    // INSERT after ALTER takes the widened width positionally
    spark.sql("INSERT INTO graft_lake.alt " +
      "SELECT 100L, 'p100', 1.5D, 'tagged'")
    spark.sql("SELECT count(*) AS n FROM graft_lake.alt " +
      "WHERE score IS NOT NULL").collect().head.getLong(0) shouldBe 1
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft_lake.alt ADD COLUMNS " +
        "(late INT AFTER id)")
    }
    e.getMessage should include("plain top-level columns")
  }

  test("SQL DML records the change feed when the session conf is on") {
    import spark.implicits._
    val path = freshTable("cdf")
    seed(path, 50)
    Seq((3L, "updated_3")).toDF("id", "payload")
      .createOrReplaceTempView("cdf_u")
    try {
      spark.conf.set(LakeSql.RecordChangeFeedConf, "true")
      spark.sql(
        """MERGE INTO graft_lake.cdf t USING cdf_u u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      spark.sql("DELETE FROM graft_lake.cdf WHERE id = 9")
      ManifestLake.changesBetween(spark, path, 1, 3)
        .map(_.changeFiles.nonEmpty) shouldBe Seq(true, true)
      ManifestLake.changeFeed(spark, path, 1, 3)
        .select("_change_type", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet shouldBe Set(
        ("delete", 3L), ("insert", 3L), ("delete", 9L))
    } finally spark.conf.unset(LakeSql.RecordChangeFeedConf)
  }

  test("UPDATE SET ... WHERE routes to the copy-on-write update; " +
    "assignments read the old row and unsupported targets raise") {
    import spark.implicits._
    val path = freshTable("upd")
    seed(path, 20)
    spark.sql(
      """UPDATE graft_lake.upd t
        |SET t.payload = concat('row_', CAST(t.id AS STRING))
        |WHERE t.id <= 3""".stripMargin)
    spark.sql("SELECT payload FROM graft_lake.upd WHERE id <= 3 ORDER BY id")
      .as[String].collect() shouldBe Array("row_1", "row_2", "row_3")
    spark.sql("SELECT count(*) FROM graft_lake.upd WHERE payload LIKE 'row_%'")
      .as[Long].collect().head shouldBe 3L
    // no WHERE = every row
    spark.sql("UPDATE graft_lake.upd SET payload = 'all'")
    spark.sql("SELECT count(DISTINCT payload) FROM graft_lake.upd")
      .as[Long].collect().head shouldBe 1L
    // unknown target column raises the named lake error
    val e = intercept[IllegalArgumentException] {
      spark.sql("UPDATE graft_lake.upd SET nope = 'x' WHERE id = 1")
    }
    e.getMessage should include("unknown column 'nope'")
    // a nested-field target raises instead of silently landing on a
    // same-named top-level column via its leaf name
    val n = intercept[UnsupportedOperationException] {
      spark.sql("UPDATE graft_lake.upd SET s.payload = 'x' WHERE id = 1")
    }
    n.getMessage should include("nested-field assignment is unsupported")
  }

  test("ADD CONSTRAINT ... CHECK enforces from SQL; DROP CONSTRAINT " +
    "lifts it; IF EXISTS tolerates a missing name") {
    import spark.implicits._
    val path = freshTable("con")
    seed(path, 10)
    spark.sql(
      "ALTER TABLE graft_lake.con ADD CONSTRAINT id_pos CHECK (id > 0)")
    intercept[ManifestLake.ConstraintViolationException] {
      spark.sql("INSERT INTO graft_lake.con VALUES (-5, 'bad')")
    }.getMessage should include("id_pos")
    spark.sql("SELECT count(*) FROM graft_lake.con")
      .as[Long].collect().head shouldBe 10L
    // UPDATE driving a violation is rejected too
    intercept[ManifestLake.ConstraintViolationException] {
      spark.sql("UPDATE graft_lake.con SET id = -1 WHERE id = 3")
    }
    spark.sql("ALTER TABLE graft_lake.con DROP CONSTRAINT id_pos")
    spark.sql("INSERT INTO graft_lake.con VALUES (-5, 'now ok')")
    spark.sql("SELECT count(*) FROM graft_lake.con")
      .as[Long].collect().head shouldBe 11L
    // IF EXISTS on a missing constraint is a no-op; without it, raises
    spark.sql("ALTER TABLE graft_lake.con DROP CONSTRAINT IF EXISTS nope")
    intercept[IllegalArgumentException] {
      spark.sql("ALTER TABLE graft_lake.con DROP CONSTRAINT nope")
    }.getMessage should include("no constraint")
  }

  test("multi-line CHECK text flattens without touching string " +
    "literals; line comments and NOT ENFORCED / RELY raise named " +
    "errors; NORELY (the implemented default) is accepted") {
    import spark.implicits._
    val path = freshTable("conml")
    ManifestLake.write(
      Seq((1L, "a  b"), (2L, "ok")).toDF("id", "tag"), path)
    // multi-line predicate containing a two-space string literal: the
    // literal must survive flattening verbatim
    spark.sql(
      """ALTER TABLE graft_lake.conml ADD CONSTRAINT no_ab CHECK (
        |  tag <> 'a  b'
        |  OR id = 1
        |) NORELY""".stripMargin)
    intercept[ManifestLake.ConstraintViolationException] {
      spark.sql("INSERT INTO graft_lake.conml VALUES (9, 'a  b')")
    }
    spark.sql("INSERT INTO graft_lake.conml VALUES (9, 'a b')")
    // NOT ENFORCED / RELY are rejected by Spark's own parser for CHECK
    // constraints (the rule keeps defensive guards regardless)
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql(
        "ALTER TABLE graft_lake.conml ADD CONSTRAINT x CHECK (id > 0) " +
          "NOT ENFORCED")
    }
    intercept[UnsupportedOperationException] {
      spark.sql(
        """ALTER TABLE graft_lake.conml ADD CONSTRAINT x CHECK (
          |  id > 0 -- positive
          |  AND id < 100
          |)""".stripMargin)
    }.getMessage should include("line comment")
  }

  test("a CHECK over a Hive partition column validates writes (staged " +
    "files read with basePath so the partition column resolves)") {
    import spark.implicits._
    val path = freshTable("conpart")
    ManifestLake.write(
      Seq((1L, "p1", "d1"), (2L, "p2", "d2")).toDF("id", "payload", "ds"),
      path, partitionBy = Seq("ds"))
    ManifestLake.addConstraint(spark, path, "ds_known", "ds IN ('d1', 'd2')")
    intercept[ManifestLake.ConstraintViolationException] {
      ManifestLake.write(Seq((3L, "p3", "dX")).toDF("id", "payload", "ds"),
        path, partitionBy = Seq("ds"))
    }.getMessage should include("ds_known")
    ManifestLake.write(Seq((3L, "p3", "d1")).toDF("id", "payload", "ds"),
      path, partitionBy = Seq("ds"))
    ManifestLake.read(spark, path).count() shouldBe 3
  }

  test("the $detail metadata table profiles the table from SQL — " +
    "manifests only") {
    import spark.implicits._
    val path = freshTable("det")
    ManifestLake.writeClustered(
      (1 to 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload"),
      path, "id", nFiles = 4, bloomCols = Seq("id"))
    ManifestLake.addConstraint(spark, path, "id_pos", "id > 0")
    val r = spark.sql(
      """SELECT version, n_files, stats_cols, bloom_cols, checks
        |FROM graft_lake.`det$detail`""".stripMargin).collect().head
    r.getLong(0) shouldBe 2L
    r.getLong(1) should be >= 3L
    r.getString(2) shouldBe "id"
    r.getString(3) shouldBe "id"
    r.getString(4) shouldBe "id_pos: id > 0"
  }

  test("SQL timestamp range predicates prune derived day partitions at " +
    "the manifest; unprovable shapes fall through to the plain read") {
    import spark.implicits._
    val path = freshTable("tsprune")
    def ts(day: Int, h: Int) = java.sql.Timestamp.from(
      java.time.LocalDateTime.of(2024, 3, day, h, 0)
        .toInstant(java.time.ZoneOffset.UTC))
    val events = (1 to 8).flatMap(day => (0 until 3).map(h =>
      (day.toLong * 10 + h, ts(day, h * 8), s"e$day-$h")))
      .toDF("event_id", "ts", "tag")
    ManifestLake.writeTimePartitioned(events, path, "ts")
    val q = spark.sql(
      """SELECT event_id FROM graft_lake.tsprune
        |WHERE ts >= TIMESTAMP '2024-03-02 00:00:00'
        |  AND ts <= TIMESTAMP '2024-03-03 23:59:59'""".stripMargin)
    q.collect().map(_.getLong(0)).sorted shouldBe
      Array(20L, 21L, 22L, 30L, 31L, 32L)
    // the scan lists ONLY the two days' partitions — derived pruning
    // fired at the manifest, before Spark ever saw the other files
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    scanned should include("p_day=2024-03-02")
    scanned should not include "p_day=2024-03-05"
    // BETWEEN lowers to the same bounds and prunes too
    val qb = spark.sql(
      """SELECT count(*) AS n FROM graft_lake.tsprune
        |WHERE ts BETWEEN TIMESTAMP '2024-03-02 00:00:00'
        |  AND TIMESTAMP '2024-03-02 23:59:59'""".stripMargin)
    qb.collect().head.getLong(0) shouldBe 3L
    // literal-FIRST bounds prune identically (regression: these
    // comparisons were dead cases in the first cut of the rule)
    val ql = spark.sql(
      """SELECT count(*) AS n FROM graft_lake.tsprune
        |WHERE TIMESTAMP '2024-03-02 00:00:00' <= ts
        |  AND TIMESTAMP '2024-03-03 23:59:59' >= ts""".stripMargin)
    ql.collect().head.getLong(0) shouldBe 6L
    ql.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString should not include "p_day=2024-03-05"
    // one-sided bound: unprovable -> full read, same answers
    spark.sql(
      """SELECT count(*) AS n FROM graft_lake.tsprune
        |WHERE ts >= TIMESTAMP '2024-03-07 00:00:00'""".stripMargin)
      .collect().head.getLong(0) shouldBe 6L
    // OR at the top: untouched and correct
    spark.sql(
      """SELECT count(*) AS n FROM graft_lake.tsprune
        |WHERE ts <= TIMESTAMP '2024-03-01 23:59:59'
        |   OR ts >= TIMESTAMP '2024-03-08 00:00:00'""".stripMargin)
      .collect().head.getLong(0) shouldBe 6L
  }

  test("the $history metadata table serves version history from SQL — " +
    "manifests only, no data read") {
    import spark.implicits._
    val path = freshTable("hist")
    seed(path, 10)
    ManifestLake.write(
      (11 to 20).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), path)
    val hist = spark.sql(
      "SELECT version, n_files FROM graft_lake.`hist$history` " +
        "ORDER BY version")
    val rows = hist.collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
    rows.last.getLong(1) should be > rows.head.getLong(1) // files accrue
    // joins against the data table compose normally
    spark.sql(
      """SELECT h.version, count(*) AS n
        |FROM graft_lake.`hist$history` h CROSS JOIN graft_lake.hist t
        |WHERE h.version = 2 GROUP BY h.version""".stripMargin)
      .collect().head.getLong(1) shouldBe 20L
  }
}
