package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the snapshot-manifest contract: versioned atomic commits, time
  * travel, reader isolation across a concurrent compaction, and vacuum
  * retention — the offline stand-in for the Delta/Iceberg layer. */
class ManifestLakeSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft-mlake").toString + "/t"

  private def rows(n: Range) = {
    import spark.implicits._
    n.map(i => (i.toLong, s"payload_$i")).toDF("id", "payload")
  }

  test("append commits new versions; time travel reads old snapshots") {
    val t = freshTable()
    val v1 = ManifestLake.write(rows(1 to 100), t)
    val v2 = ManifestLake.write(rows(101 to 150), t)
    v1 shouldBe 1L
    v2 shouldBe 2L
    ManifestLake.read(spark, t).count() shouldBe 150
    ManifestLake.read(spark, t, Some(1L)).count() shouldBe 100
    ManifestLake.versions(spark, t) shouldBe Seq(1L, 2L)
    val hist = ManifestLake.history(spark, t).collect()
    hist.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
    hist.last.getLong(1) should be > hist.head.getLong(1) // files accrue
  }

  test("a reader's snapshot survives a concurrent compaction") {
    val t = freshTable()
    // many small commits → many small files
    (0 until 8).foreach(b => ManifestLake.write(rows(b * 10 to b * 10 + 9), t))
    val preCompact = ManifestLake.read(spark, t) // resolves file list NOW
    val report = ManifestLake.compact(spark, t)
    report.filesBefore should be > report.filesAfter
    // the old snapshot's files are untouched: the pre-compaction frame
    // still materializes fully and correctly
    preCompact.count() shouldBe 80
    ManifestLake.read(spark, t).count() shouldBe 80
    // compaction is a new version, not an overwrite: time travel intact
    ManifestLake.read(spark, t, Some(report.newVersion - 1)).count() shouldBe 80
  }

  test("vacuum deletes only files unreferenced by retained versions") {
    val t = freshTable()
    ManifestLake.write(rows(1 to 50), t)
    ManifestLake.write(rows(51 to 60), t)
    ManifestLake.compact(spark, t) // v3: compacted set
    val deleted = ManifestLake.vacuum(spark, t, keepLast = 1)
    deleted should be > 0
    ManifestLake.read(spark, t).count() shouldBe 60
    // vacuumed versions are gone
    ManifestLake.versions(spark, t) should have length 1
    intercept[IllegalArgumentException] {
      ManifestLake.read(spark, t, Some(1L))
    }
  }

  test("partitioned tables: manifest-level pruning, partition column " +
    "reconstruction, compaction preserves layout") {
    import spark.implicits._
    val t = freshTable()
    val data = (1 to 300).map(i =>
      (i.toLong, s"d${i % 3}", s"p$i")).toDF("id", "date", "payload")
    ManifestLake.write(data, t, partitionBy = Seq("date"))
    ManifestLake.write(data.filter($"date" === "d0")
      .withColumn("id", $"id" + 1000), t, partitionBy = Seq("date"))

    // partition column reconstructs through basePath
    val full = ManifestLake.read(spark, t)
    full.columns should contain("date")
    full.count() shouldBe 400

    // pruning selects only the matching partition's files — verified by
    // the scan's input files, not just the row count
    val pruned = ManifestLake.readPruned(spark, t, Map("date" -> "d1"))
    pruned.count() shouldBe 100
    pruned.inputFiles.foreach(f => f should include("date=d1"))
    ManifestLake.readPruned(spark, t, Map("date" -> "d0"))
      .count() shouldBe 200

    // compaction keeps the Hive layout and the data
    val report = ManifestLake.compact(spark, t)
    report.filesBefore should be > report.filesAfter
    val after = ManifestLake.read(spark, t)
    after.count() shouldBe 400
    ManifestLake.readPruned(spark, t, Map("date" -> "d2"))
      .count() shouldBe 100
    // vacuum handles partition subdirectories
    ManifestLake.vacuum(spark, t, keepLast = 1) should be > 0
    ManifestLake.read(spark, t).count() shouldBe 400
  }

  test("manifest column stats skip files outside a range query; " +
    "stats-less manifests never skip") {
    import spark.implicits._
    val t = freshTable()
    val data = (1 to 4000).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .repartitionByRange(4, $"id").sortWithinPartitions("id")
    ManifestLake.write(data, t, statsCol = Some("id"))
    val snap = ManifestLake.snapshot(spark, t)
    snap.entries should have length 4
    snap.entries.flatMap(_.range) should have length 4
    val narrow = ManifestLake.readRange(spark, t, "id", 100, 200)
    narrow.count() shouldBe 101
    // ids 100-200 sit in at most 2 of the 4 range-clustered files; the
    // others are skipped from the manifest alone
    narrow.inputFiles.length should be <= 2
    // compaction preserves the stats column
    ManifestLake.compact(spark, t)
    ManifestLake.snapshot(spark, t).entries
      .flatMap(_.range).map(_.col).distinct shouldBe Seq("id")

    val t2 = freshTable()
    ManifestLake.write(data, t2) // no statsCol recorded
    val all = ManifestLake.readRange(spark, t2, "id", 100, 200)
    all.count() shouldBe 101 // exact despite no stats — just no skipping
    all.inputFiles should have length 4

    // stats proving "nothing matches" yields an empty frame, not a crash
    ManifestLake.readRange(spark, t, "id", 50000, 60000).count() shouldBe 0
  }

  test("object-store table paths are rejected at commit time with the " +
    "contract named") {
    val e = intercept[IllegalArgumentException] {
      ManifestLake.write(rows(1 to 10), "s3a://some-bucket/table")
    }
    e.getMessage should include("s3a")
    e.getMessage should include("atomic publish-if-absent")
    // the same check guards every commit path; reads stay scheme-agnostic
    intercept[IllegalArgumentException] {
      ManifestLake.write(rows(1 to 10), "s3://some-bucket/table")
    }
  }

  test("vacuum never deletes data files of an in-flight (higher-version) " +
    "commit, even though no manifest references them yet") {
    val t = freshTable()
    ManifestLake.write(rows(1 to 50), t)
    ManifestLake.write(rows(51 to 60), t) // v2
    val (fs, p) = {
      val path = new org.apache.hadoop.fs.Path(t)
      (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
    }
    // an in-flight write() has already renamed its staged file into the
    // table dir as v3, but has not committed its manifest yet
    val inFlight = new org.apache.hadoop.fs.Path(t, "v00000003-00000.parquet")
    val out = fs.create(inFlight, false)
    out.write(Array[Byte](1, 2, 3))
    out.close()
    ManifestLake.vacuum(spark, t, keepLast = 1)
    fs.exists(inFlight) shouldBe true // protected: version > max retained
    // a file AT the newest retained version that no manifest references
    // is ALSO protected for one cycle: a REBASING append briefly holds
    // its files at the lost version (== the winner's head) before the
    // retry re-versions them — collecting it here would corrupt the
    // rebased commit. It becomes collectable once the head advances.
    val limbo = new org.apache.hadoop.fs.Path(t, "v00000002-99999.parquet")
    val out2 = fs.create(limbo, false)
    out2.write(Array[Byte](1))
    out2.close()
    ManifestLake.vacuum(spark, t, keepLast = 1) shouldBe 0
    fs.exists(limbo) shouldBe true
    ManifestLake.write(rows(61 to 70), t) // head moves to v3
    ManifestLake.vacuum(spark, t, keepLast = 1) should be >= 1
    fs.exists(limbo) shouldBe false // now provably dead
  }

  test("an all-null stats column records no range and the file is never " +
    "skipped") {
    import spark.implicits._
    val t = freshTable()
    val nullIds = Seq[(Option[Long], String)]((None, "a"), (None, "b"))
      .toDF("id", "payload")
    ManifestLake.write(nullIds, t, statsCol = Some("id"))
    ManifestLake.write(rows(100 to 110), t, statsCol = Some("id"))
    val snap = ManifestLake.snapshot(spark, t)
    // the all-null file carries no range; the real file does
    snap.entries.count(_.range.isEmpty) should be >= 1
    snap.entries.count(_.range.nonEmpty) should be >= 1
    // exactness: the stats-less file is kept conservatively (and its
    // NULL ids match no range predicate anyway)
    ManifestLake.readRange(spark, t, "id", 100, 105).count() shouldBe 6
  }

  test("a plain append between streaming batches carries the replay " +
    "high-water mark forward") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.writeBatch(rows(1 to 10), t, batchId = 5L,
      appId = "app-x") shouldBe true
    // maintenance append with no transaction identity of its own
    ManifestLake.write(rows(11 to 20), t)
    val snap = ManifestLake.snapshot(spark, t)
    snap.batchId shouldBe Some(5L)
    snap.appId shouldBe Some("app-x")
    // a post-crash replay of epoch 5 must still be recognized as done
    ManifestLake.writeBatch(rows(1 to 10), t, batchId = 5L,
      appId = "app-x") shouldBe false
    ManifestLake.read(spark, t).count() shouldBe 20
    // a genuinely new epoch still lands
    ManifestLake.writeBatch(rows(21 to 25), t, batchId = 6L,
      appId = "app-x") shouldBe true
    ManifestLake.read(spark, t).count() shouldBe 25
    // an OVERWRITE rewrite must also preserve the mark: a replay of the
    // last epoch after a maintenance overwrite would otherwise land twice
    ManifestLake.write(rows(1 to 30), t, append = false)
    ManifestLake.snapshot(spark, t).batchId shouldBe Some(6L)
    ManifestLake.writeBatch(rows(21 to 25), t, batchId = 6L,
      appId = "app-x") shouldBe false
    ManifestLake.read(spark, t).count() shouldBe 30
  }

  test("losing a commit race surfaces as an error, not silent overwrite") {
    val t = freshTable()
    ManifestLake.write(rows(1 to 10), t)
    val (fs, p) = {
      val path = new org.apache.hadoop.fs.Path(t)
      (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
    }
    // a racing committer publishes v2 between this committer reading the
    // current version (v1) and publishing its own v2
    val racing = new org.apache.hadoop.fs.Path(t + "/_manifests/v00000002.manifest")
    val out = fs.create(racing, false)
    out.write("v00000001-00000.parquet\n".getBytes)
    out.close()
    intercept[IllegalStateException] {
      ManifestLake.commit(fs, p, Seq("v00000001-00000.parquet"), prev = Some(1L))
    }
    // the loser's temp file must not linger
    fs.listStatus(new org.apache.hadoop.fs.Path(t + "/_manifests"))
      .map(_.getPath.getName).count(_.startsWith(".tmp")) shouldBe 0
  }

  test("a blind append losing the version race REBASES onto the " +
    "winner's head and commits at the next version — zero client redo, " +
    "both writers' rows land") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.write(rows(1 to 10), t) // v1
    val (fs, p) = {
      val path = new org.apache.hadoop.fs.Path(t)
      (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
    }
    // a REAL winner commit, pre-staged: its data file exists on disk
    // and its manifest line is ready to publish from inside the race
    rows(11 to 25).coalesce(1).write.parquet(s"$t/winner")
    val winnerFile = fs.listStatus(new org.apache.hadoop.fs.Path(s"$t/winner"))
      .map(_.getPath.getName).find(_.endsWith(".parquet")).get
    val winnerSchema = rows(11 to 25).schema
    // interpose on the commit primitive: the FIRST publish of v2 loses —
    // a concurrent committer lands the winner's v2 under this writer's
    // feet (published through the default primitive, then we report the
    // race lost). Deterministic reproduction of the read-version /
    // publish window.
    val default = ManifestLake.RenameCommit
    val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
    val interposer = new ManifestLake.CommitPrimitive {
      val supportedSchemes: Set[String] = Set("file")
      def publish(pfs: org.apache.hadoop.fs.FileSystem,
                  tmp: org.apache.hadoop.fs.Path,
                  target: org.apache.hadoop.fs.Path): Boolean = {
        if (target.getName == "v00000002.manifest" &&
          injected.compareAndSet(false, true)) {
          ManifestLake.commitLog(pfs, p, full = false,
            adds = Seq(s"winner/$winnerFile"), removes = Nil,
            prev = Some(1L), schema = Some(winnerSchema))
          pfs.delete(tmp, false)
          return false
        }
        default.publish(pfs, tmp, target)
      }
    }
    val prev = ManifestLake.installCommitPrimitive(interposer)
    try {
      // the append loses v2, rebases onto the winner, commits v3 —
      // the caller sees ONE successful call, no exception, no re-stage
      val v = ManifestLake.write(rows(26 to 40), t)
      v shouldBe 3L
    } finally ManifestLake.installCommitPrimitive(prev)
    ManifestLake.versions(spark, t) shouldBe Seq(1L, 2L, 3L)
    val head = ManifestLake.read(spark, t)
    head.count() shouldBe 40
    head.select("id").as[Long].collect().toSet shouldBe
      (1 to 40).map(_.toLong).toSet
    // the rebase RE-VERSIONED the staged files to the committed
    // version: nothing in the snapshot is named at the lost v2 except
    // the winner's own file — a concurrent vacuum's in-flight
    // protection (which keys on the embedded version being >= the
    // newest retained manifest) must never see the loser's files as
    // collectable at the lost version
    val v3Files = ManifestLake.snapshot(spark, t, Some(3L)).files
      .filterNot(_.startsWith("winner/"))
    val rebased = v3Files.filter(_.split('/').last.startsWith("v00000003"))
    rebased should not be empty
    v3Files.filter(_.split('/').last.startsWith("v00000002")) shouldBe empty
  }

  test("a rebased append re-validates against a CHECK constraint the " +
    "winner added concurrently; rewrites losing a race error by name") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.write(rows(1 to 10), t) // v1
    val (fs, p) = {
      val path = new org.apache.hadoop.fs.Path(t)
      (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
    }
    val default = ManifestLake.RenameCommit
    // race 1: winner adds a constraint the loser's staged rows VIOLATE —
    // the rebase must re-validate and abort, not land bad data
    val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
    val addCheck = new ManifestLake.CommitPrimitive {
      val supportedSchemes: Set[String] = Set("file")
      def publish(pfs: org.apache.hadoop.fs.FileSystem,
                  tmp: org.apache.hadoop.fs.Path,
                  target: org.apache.hadoop.fs.Path): Boolean = {
        if (target.getName == "v00000002.manifest" &&
          injected.compareAndSet(false, true)) {
          ManifestLake.addConstraint(spark, t, "id_small", "id <= 100")
          pfs.delete(tmp, false)
          return false
        }
        default.publish(pfs, tmp, target)
      }
    }
    var prev = ManifestLake.installCommitPrimitive(addCheck)
    try {
      intercept[ManifestLake.ConstraintViolationException] {
        ManifestLake.write(rows(200 to 205), t)
      }.getMessage should include("id_small")
    } finally ManifestLake.installCommitPrimitive(prev)
    ManifestLake.currentVersion(spark, t) shouldBe Some(2L) // only the add
    // …while a COMPLIANT append rebases straight through the new check
    ManifestLake.write(rows(11 to 20), t) shouldBe 3L
    ManifestLake.read(spark, t).count() shouldBe 20

    // race 2: a MERGE racing a compaction of the SAME files errors by
    // name — the winner rewrote the merge's read set, so its match
    // decisions are stale and no retry is sound
    val injected2 = new java.util.concurrent.atomic.AtomicBoolean(false)
    val stealV4 = new ManifestLake.CommitPrimitive {
      val supportedSchemes: Set[String] = Set("file")
      def publish(pfs: org.apache.hadoop.fs.FileSystem,
                  tmp: org.apache.hadoop.fs.Path,
                  target: org.apache.hadoop.fs.Path): Boolean = {
        if (target.getName == "v00000004.manifest" &&
          injected2.compareAndSet(false, true)) {
          // a compaction wins v4 first
          ManifestLake.compact(spark, t)
          pfs.delete(tmp, false)
          return false
        }
        default.publish(pfs, tmp, target)
      }
    }
    prev = ManifestLake.installCommitPrimitive(stealV4)
    try {
      intercept[ManifestLake.CommitConflictException] {
        ManifestLake.merge(Seq((1L, "updated_1")).toDF("id", "payload"),
          t, Seq("id"))
      }.getMessage should include("rewrote or removed")
    } finally ManifestLake.installCommitPrimitive(prev)
    // the compaction's v4 is the head; the merge landed nothing
    ManifestLake.read(spark, t).filter($"payload" === "updated_1")
      .count() shouldBe 0L
  }

  test("two MERGEs on DISJOINT key ranges both commit with zero client " +
    "redo: the loser retries at the new head; a concurrent append of " +
    "rows the merge's keys CAN match still errors by name") {
    import spark.implicits._
    val t = freshTable()
    // two files with recorded id stats: low keys and high keys
    ManifestLake.write(rows(1 to 10), t, statsCol = Some("id")) // v1
    ManifestLake.write(rows(101 to 110), t, statsCol = Some("id")) // v2
    val p = new org.apache.hadoop.fs.Path(t)
    val default = ManifestLake.RenameCommit
    val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
    val winnerHighKeys = new ManifestLake.CommitPrimitive {
      val supportedSchemes: Set[String] = Set("file")
      def publish(pfs: org.apache.hadoop.fs.FileSystem,
                  tmp: org.apache.hadoop.fs.Path,
                  target: org.apache.hadoop.fs.Path): Boolean = {
        if (target.getName == "v00000003.manifest" &&
          injected.compareAndSet(false, true)) {
          // a merge on the HIGH range wins v3 under the loser's feet
          ManifestLake.merge(
            Seq((105L, "hi_105")).toDF("id", "payload"), t, Seq("id"))
          pfs.delete(tmp, false)
          return false
        }
        default.publish(pfs, tmp, target)
      }
    }
    var prev = ManifestLake.installCommitPrimitive(winnerHighKeys)
    try {
      // the loser merges a LOW key: its read set is the low file only,
      // the winner rewrote the high file only, and the winner's output
      // (id range 101-110) prunes against update key 5 — disjoint, so
      // ONE call commits at v4 with no exception and no re-staging
      ManifestLake.merge(
        Seq((5L, "lo_5")).toDF("id", "payload"), t, Seq("id")) shouldBe 4L
    } finally ManifestLake.installCommitPrimitive(prev)
    val head = ManifestLake.read(spark, t)
    head.count() shouldBe 20
    head.filter($"payload" === "hi_105").count() shouldBe 1L
    head.filter($"payload" === "lo_5").count() shouldBe 1L
    // the retry RE-VERSIONED the loser's staged files to the committed
    // version (vacuum in-flight protection — same contract as the
    // append rebase): nothing in the head snapshot carries the lost
    // version's name except the winner's own output
    val v4Files = ManifestLake.snapshot(spark, t, Some(4L)).files
    v4Files.filter(_.split('/').last.startsWith("v00000004")) should
      not be empty
    // and the re-versioned file is really the loser's: it holds lo_5
    ManifestLake.read(spark, t).filter($"payload" === "lo_5")
      .count() shouldBe 1L

    // a winner whose ADDED rows the loser's keys can match (same key
    // range, no prunable stats distance) is NOT safe to replay: the
    // merge should have matched those rows, so it errors by name
    val injected2 = new java.util.concurrent.atomic.AtomicBoolean(false)
    val winnerOverlapping = new ManifestLake.CommitPrimitive {
      val supportedSchemes: Set[String] = Set("file")
      def publish(pfs: org.apache.hadoop.fs.FileSystem,
                  tmp: org.apache.hadoop.fs.Path,
                  target: org.apache.hadoop.fs.Path): Boolean = {
        if (target.getName == "v00000005.manifest" &&
          injected2.compareAndSet(false, true)) {
          // an append lands key 6 — inside the loser's update range
          ManifestLake.write(rows(6 to 6), t, statsCol = Some("id"))
          pfs.delete(tmp, false)
          return false
        }
        default.publish(pfs, tmp, target)
      }
    }
    prev = ManifestLake.installCommitPrimitive(winnerOverlapping)
    try {
      intercept[ManifestLake.CommitConflictException] {
        ManifestLake.merge(
          Seq((6L, "dup_6")).toDF("id", "payload"), t, Seq("id"))
      }.getMessage should include("would have read")
    } finally ManifestLake.installCommitPrimitive(prev)
    ManifestLake.read(spark, t)
      .filter($"payload" === "dup_6").count() shouldBe 0L
  }

  test("a DELETE losing the race to a disjoint-range DELETE retries " +
    "at the new head — both land in one call each") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.write(rows(1 to 10), t, statsCol = Some("id")) // v1
    ManifestLake.write(rows(101 to 110), t, statsCol = Some("id")) // v2
    val default = ManifestLake.RenameCommit
    val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
    val winnerHigh = new ManifestLake.CommitPrimitive {
      val supportedSchemes: Set[String] = Set("file")
      def publish(pfs: org.apache.hadoop.fs.FileSystem,
                  tmp: org.apache.hadoop.fs.Path,
                  target: org.apache.hadoop.fs.Path): Boolean = {
        if (target.getName == "v00000003.manifest" &&
          injected.compareAndSet(false, true)) {
          ManifestLake.delete(spark, t, $"id" === 105L)
          pfs.delete(tmp, false)
          return false
        }
        default.publish(pfs, tmp, target)
      }
    }
    val prev = ManifestLake.installCommitPrimitive(winnerHigh)
    try {
      ManifestLake.delete(spark, t, $"id" === 5L) shouldBe 4L
    } finally ManifestLake.installCommitPrimitive(prev)
    val ids = ManifestLake.read(spark, t).select("id").as[Long]
      .collect().toSet
    ids should not contain 5L
    ids should not contain 105L
    ids.size shouldBe 18
  }

  /** An object store double with S3 `If-None-Match: *` semantics: the
    * arbitration is a putIfAbsent on the object map (exactly what a
    * conditional PUT gives you); a winning put also lands the bytes on
    * the local path so the lake's read path sees them — the "object". */
  private def conditionalPutStub(schemes: Set[String]) = {
    val store = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    val prim = new ManifestLake.ConditionalPutCommit(schemes, (target, bytes) => {
      val won = store.putIfAbsent(target.toString, bytes) == null
      if (won) {
        val local = java.nio.file.Paths.get(target.toUri.getPath)
        java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.write(local, bytes)
      }
      won
    })
    (prim, store)
  }

  test("a conditional-put primitive arbitrates racing committers: two " +
    "concurrent writes, every manifest publish decided by putIfAbsent") {
    val (prim, store) = conditionalPutStub(Set("file"))
    val prev = ManifestLake.installCommitPrimitive(prim)
    try {
      val t = freshTable()
      import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
      val gate = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(2)
      val results = Seq(rows(1 to 10), rows(11 to 25)).map { df =>
        pool.submit(new java.util.concurrent.Callable[Either[Throwable, Long]] {
          def call(): Either[Throwable, Long] = {
            gate.await()
            try Right(ManifestLake.write(df, t))
            catch { case e: Throwable => Left(e) }
          }
        })
      }
      gate.countDown()
      val outcomes = results.map(_.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      val wins = outcomes.collect { case Right(v) => v }
      val losses = outcomes.collect { case Left(e) => e }
      // either the writes serialized (both committed, distinct versions)
      // or the race had exactly one winner and the loser got the
      // lost-race error — NEVER two winners of one version, never a
      // silent drop
      wins.distinct.size shouldBe wins.size
      losses.foreach(_ shouldBe an[IllegalStateException])
      (wins.size + losses.size) shouldBe 2
      wins.size should be >= 1
      // every published manifest went through the conditional put
      store.size shouldBe wins.size
      // the committed state is exactly the winners' rows: every
      // referenced file exists and nothing was clobbered
      val expected = Map(1 -> Seq(10, 15), 2 -> Seq(25))(wins.size)
      expected should contain(ManifestLake.read(spark, t).count().toInt)
    } finally ManifestLake.installCommitPrimitive(prev)
  }

  test("an installed object-store primitive opens the s3a gate; the " +
    "default rejects it") {
    val (prim, _) = conditionalPutStub(Set("file", "s3a"))
    val prev = ManifestLake.installCommitPrimitive(prim)
    try {
      // with a conditional-put primitive claiming s3a, the commit-time
      // scheme check passes — the failure (if any) is the environment's
      // missing s3a filesystem, NOT the lake's publish-contract error
      val e = intercept[Throwable] {
        ManifestLake.write(rows(1 to 5), "s3a://bucket/table")
      }
      e.getMessage should not include "atomic publish-if-absent"
    } finally ManifestLake.installCommitPrimitive(prev)
    val rejected = intercept[IllegalArgumentException] {
      ManifestLake.write(rows(1 to 5), "s3a://bucket/table")
    }
    rejected.getMessage should include("atomic publish-if-absent")
  }

  test("merge upserts matched keys, inserts unseen keys, and rewrites " +
    "ONLY the files that hold a matched key") {
    import spark.implicits._
    val t = freshTable()
    // 4 range-clustered files with id stats: ids 1-1000, 1001-2000, ...
    val base = (1 to 4000).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    ManifestLake.writeClustered(base, t, "id", nFiles = 4)
    val before = ManifestLake.snapshot(spark, t)
    before.entries should have length 4

    // updates touch ids 10-20 (first file only) and insert ids 9001-9005
    val updates = ((10 to 20).map(i => (i.toLong, s"UPDATED_$i")) ++
      (9001 to 9005).map(i => (i.toLong, s"NEW_$i"))).toDF("id", "payload")
    ManifestLake.merge(updates, t, Seq("id"), statsCol = Some("id"))

    val after = ManifestLake.snapshot(spark, t)
    // the three files whose id range misses every update key carry over
    // VERBATIM (same manifest line ⇒ same bytes, stats included)
    val carried = after.entries.map(_.line)
      .intersect(before.entries.map(_.line))
    carried should have length 3
    // and the rewritten+inserted rows are exactly the merge result
    val got = ManifestLake.read(spark, t).as[(Long, String)].collect().toMap
    got should have size 4005
    got(15L) shouldBe "UPDATED_15"
    got(9L) shouldBe "p9"
    got(21L) shouldBe "p21"
    got(9003L) shouldBe "NEW_9003"

    // re-merging the same updates is content-idempotent
    val v3 = ManifestLake.merge(updates, t, Seq("id"), statsCol = Some("id"))
    v3 shouldBe after.version + 1
    val again = ManifestLake.read(spark, t).as[(Long, String)].collect().toMap
    again shouldBe got
  }

  test("delete rewrites only range-intersecting files; a no-match delete " +
    "is a version no-op") {
    import spark.implicits._
    val t = freshTable()
    val base = (1 to 4000).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    ManifestLake.writeClustered(base, t, "id", nFiles = 4)
    val before = ManifestLake.snapshot(spark, t)

    // ids 1..1000 live in file 1 only — the other three carry over
    val v2 = ManifestLake.delete(spark, t,
      org.apache.spark.sql.functions.col("id") <= 150L,
      pruneRange = Some(("id", 0.0, 150.0)))
    v2 shouldBe before.version + 1
    val after = ManifestLake.snapshot(spark, t)
    after.entries.map(_.line)
      .intersect(before.entries.map(_.line)) should have length 3
    ManifestLake.read(spark, t).count() shouldBe 3850
    ManifestLake.read(spark, t)
      .agg(org.apache.spark.sql.functions.min($"id"))
      .collect().head.getLong(0) shouldBe 151L

    // nothing matches now: no new version, nothing rewritten
    ManifestLake.delete(spark, t,
      org.apache.spark.sql.functions.col("id") <= 150L,
      pruneRange = Some(("id", 0.0, 150.0))) shouldBe v2
    ManifestLake.currentVersion(spark, t) shouldBe Some(v2)
  }

  test("merge preserves a partitioned table's layout and a clustered " +
    "table's recorded stats without being told") {
    import spark.implicits._
    // partitioned table: rewritten files must stay partition-pathed or
    // partition discovery fails on the mixed-depth file list
    val t = freshTable()
    val data = (1 to 200).map(i => (i.toLong, s"p$i", s"d${i % 2}"))
      .toDF("id", "payload", "date")
    ManifestLake.write(data, t, partitionBy = Seq("date"))
    ManifestLake.merge(
      Seq((5L, "UPD", "d1"), (999L, "NEW", "d0")).toDF("id", "payload", "date"),
      t, Seq("id"))
    val snap = ManifestLake.snapshot(spark, t)
    all(snap.entries.map(_.path)) should include("date=")
    val merged = ManifestLake.read(spark, t)
    merged.count() shouldBe 201
    merged.filter($"id" === 5L).select("payload", "date")
      .as[(String, String)].collect().head shouldBe ("UPD", "d1")

    // clustered table: an un-hinted merge must not strip footer ranges
    // from the rewritten files (pruning would silently decay)
    val t2 = freshTable()
    ManifestLake.writeClustered(
      (1 to 1000).map(i => (i.toLong, s"p$i")).toDF("id", "payload"),
      t2, "id", nFiles = 4)
    ManifestLake.merge(Seq((10L, "UPD")).toDF("id", "payload"),
      t2, Seq("id"))
    val entries = ManifestLake.snapshot(spark, t2).entries
    // every non-empty rewritten file still carries an id range
    entries.count(_.range.isDefined) should be >= 4
  }

  test("delete keeps rows whose predicate evaluates to NULL (SQL DELETE " +
    "semantics), regardless of file co-location") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.write(
      Seq((1L, Some(900.0)), (2L, None), (3L, Some(1200.0)))
        .toDF("id", "price").coalesce(1), t)
    ManifestLake.delete(spark, t,
      org.apache.spark.sql.functions.col("price") < 950.0)
    val left = ManifestLake.read(spark, t).select("id")
      .as[Long].collect().sorted
    left shouldBe Array(2L, 3L) // the NULL-price row survives
  }

  test("the log is delta-structured: commits are O(changed files), " +
    "resolution reads one checkpoint plus a bounded tail") {
    val saved = ManifestLake.checkpointInterval
    ManifestLake.checkpointInterval = 5
    try {
      val t = freshTable()
      (1 to 23).foreach(i => ManifestLake.write(rows(i * 10 to i * 10 + 9), t))
      val (fs, p) = {
        val path = new org.apache.hadoop.fs.Path(t)
        (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
      }
      val mdir = new org.apache.hadoop.fs.Path(t, "_manifests")
      def size(name: String): Long =
        fs.getFileStatus(new org.apache.hadoop.fs.Path(mdir, name)).getLen
      // checkpoints landed on the cadence, and the hint points at the last
      fs.exists(new org.apache.hadoop.fs.Path(mdir, "v00000020.checkpoint")) shouldBe true
      fs.exists(new org.apache.hadoop.fs.Path(mdir, "_last_checkpoint")) shouldBe true
      // a late APPEND's manifest records only its own files — it must be
      // far smaller than the consolidated checkpoint (O(delta) vs O(table))
      size("v00000023.manifest") should be < size("v00000020.checkpoint") / 3
      // resolution of the head reads the v20 checkpoint + 3 delta tails —
      // never the other 19 manifests. Observed, not trusted:
      val before = ManifestLake.logReads.get()
      val snap = ManifestLake.snapshot(spark, t)
      (ManifestLake.logReads.get() - before) should be <= 4L
      snap.version shouldBe 23L
      snap.files should have length ManifestLake.read(spark, t).inputFiles.length
      ManifestLake.read(spark, t).count() shouldBe 230
      // time travel BETWEEN checkpoints replays from the nearest one below
      val before7 = ManifestLake.logReads.get()
      ManifestLake.read(spark, t, Some(7L)).count() shouldBe 70
      (ManifestLake.logReads.get() - before7) should be <= 3L // v7,v6 + ck5
      // currentVersion probes forward from the hint — no directory listing
      // and no log reads at all
      val beforeCur = ManifestLake.logReads.get()
      ManifestLake.currentVersion(spark, t) shouldBe Some(23L)
      ManifestLake.logReads.get() shouldBe beforeCur
    } finally ManifestLake.checkpointInterval = saved
  }

  test("mergeApply runs the full clause surface: conditional matched " +
    "update/delete, conditional insert, first-match-wins, untouched " +
    "files carried verbatim, duplicate sources rejected") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    ManifestLake.writeClustered(
      (1 to 100).map(i => (i.toLong, i * 1.0, s"p$i")).toDF("id", "v", "payload"),
      t, "id", nFiles = 4)
    val before = ManifestLake.snapshot(spark, t)
    val src = Seq(
      (1L, "del", 0.0), // matched, first clause fires → deleted
      (2L, "upd", 100.0), // matched, second clause fires → updated
      (3L, "other", 0.0), // matched, NO clause fires → unchanged
      (200L, "ins", 5.0), // not matched, insert clause fires
      (201L, "skip", 6.0)) // not matched, condition false → dropped
      .toDF("id", "op", "nv")
    ManifestLake.mergeApply(src, t, Seq("id"),
      matched = Seq(
        ManifestLake.MergeDelete(
          Some(ManifestLake.mergeSrcCol("op") === "del")),
        ManifestLake.MergeUpdate(
          Some(ManifestLake.mergeSrcCol("op") === "upd"),
          Some(Seq("v" -> (ManifestLake.mergeSrcCol("nv") + col("v")))))),
      notMatched = Seq(
        ManifestLake.MergeInsert(
          Some(ManifestLake.mergeSrcCol("op") === "ins"),
          Some(Seq("id" -> ManifestLake.mergeSrcCol("id"),
            "v" -> ManifestLake.mergeSrcCol("nv"))))))
    val after = ManifestLake.read(spark, t)
    after.count() shouldBe 100 // one deleted, one inserted
    after.filter($"id" === 1L).count() shouldBe 0
    after.filter($"id" === 2L).select("v").as[Double].head() shouldBe 102.0
    after.filter($"id" === 3L).select("v").as[Double].head() shouldBe 3.0
    val ins = after.filter($"id" === 200L)
      .select("v", "payload").collect().head
    ins.getDouble(0) shouldBe 5.0
    ins.isNullAt(1) shouldBe true // unassigned column inserts as null
    after.filter($"id" === 201L).count() shouldBe 0
    // only the file(s) holding ids 1..3 were rewritten; the rest of the
    // clustered layout carried over verbatim
    val afterSnap = ManifestLake.snapshot(spark, t)
    (before.files.toSet intersect afterSnap.files.toSet).size shouldBe 3

    // FIRST-match-wins when clause conditions overlap: update listed
    // before delete wins the row
    ManifestLake.mergeApply(
      Seq((10L, "del", 999.0)).toDF("id", "op", "nv"), t, Seq("id"),
      matched = Seq(
        ManifestLake.MergeUpdate(
          Some(ManifestLake.mergeSrcCol("op") === "del"),
          Some(Seq("v" -> ManifestLake.mergeSrcCol("nv")))),
        ManifestLake.MergeDelete(
          Some(ManifestLake.mergeSrcCol("op") === "del"))))
    ManifestLake.read(spark, t).filter($"id" === 10L)
      .select("v").as[Double].head() shouldBe 999.0

    // duplicate-keyed sources raise (multiple source rows matched)
    intercept[IllegalArgumentException] {
      ManifestLake.mergeApply(
        Seq((7L, "x", 0.0), (7L, "y", 0.0)).toDF("id", "op", "nv"),
        t, Seq("id"), matched = Seq(ManifestLake.MergeDelete(None)))
    }.getMessage should include("duplicate keys")
  }

  test("WHEN NOT MATCHED BY SOURCE syncs a scoped mirror: in-scope " +
    "source-missing rows tombstone MERGE-ON-READ in untouched files, " +
    "apply inline in rewritten ones, out-of-scope rows never move") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    // 8 EXACTLY-bounded range files over 1..2000 (one append each:
    // 1..250, 251..500, ...) — repartitionByRange would only sample
    // approximate boundaries, and this test pins per-file outcomes
    (0 until 8).foreach { b =>
      ManifestLake.write(
        (b * 250 + 1 to b * 250 + 250).map(i => (i.toLong, i * 1.0))
          .toDF("id", "v").repartition(1),
        t, append = b > 0, statsCols = Seq("id"))
    }
    val before = ManifestLake.snapshot(spark, t)
    // source covers only keys ≤ 250 (file 1), minus every 7th (those
    // must DELETE), with every 5th's value bumped; scope is id ≤ 500 —
    // so file 2 (251..500) is in scope but holds no matched key: its
    // sync rows go MERGE-ON-READ. Files 3..8 are out of scope.
    val src = (1 to 250).filter(_ % 7 != 0)
      .map(i => (i.toLong, if (i % 5 == 0) i * 10.0 else i * 1.0))
      .toDF("id", "v")
    ManifestLake.mergeApply(src, t, Seq("id"),
      matched = Seq(ManifestLake.MergeUpdate(None, None)), // SET *
      notMatched = Seq(ManifestLake.MergeInsert(None, None)), // INSERT *
      notMatchedBySource = Seq(ManifestLake.MergeDelete(None)),
      scope = Some(col("id") <= 500L))
    val after = ManifestLake.snapshot(spark, t)
    // file 2: tombstoned in place — same path, now vectored
    val file2 = before.entries.find(e =>
      e.range("id").exists(r => r.min == BigDecimal(251))).get
    val file2After = after.entries.find(_.path == file2.path).get
    file2After.dv should not be empty
    file2After.dvRows shouldBe Some(250L)
    // files 3..8: untouched verbatim (no rewrite, no vector)
    val outOfScope = before.entries.filter(e =>
      e.range("id").exists(_.min >= BigDecimal(501))).map(_.path).toSet
    outOfScope.size shouldBe 6
    outOfScope.foreach { pth =>
      val e = after.entries.find(_.path == pth).get
      e.dv shouldBe empty
    }
    // content: mirror of the source within scope, original outside
    val got = ManifestLake.read(spark, t)
    got.count() shouldBe (250 - 250 / 7) + 1500
    got.filter($"id" <= 500L && $"id" % 7 === 0).count() shouldBe 0
    got.filter($"id" > 250L && $"id" <= 500L).count() shouldBe 0
    got.filter($"id" === 25L).select("v").as[Double].head() shouldBe 250.0
    got.filter($"id" === 1999L).select("v").as[Double].head() shouldBe 1999.0
    ManifestLake.fastCount(spark, t) shouldBe got.count()
    // NMBS UPDATE assignments are mandatory (no source row to SET * from)
    intercept[IllegalArgumentException] {
      ManifestLake.mergeApply(src, t, Seq("id"),
        matched = Nil, notMatchedBySource =
          Seq(ManifestLake.MergeUpdate(None, None)),
        scope = Some(col("id") <= 500L))
    }.getMessage should include("explicit")
    // unscoped NMBS without the opt-in names both ways out — pinned
    // with the small-table fast path disabled (threshold 0), since this
    // test table's recorded size would otherwise qualify it
    spark.conf.set(ManifestLake.NmbsSmallTableBytesConf, "0")
    try {
      val e = intercept[IllegalArgumentException] {
        ManifestLake.mergeApply(src, t, Seq("id"),
          matched = Nil,
          notMatchedBySource = Seq(ManifestLake.MergeDelete(None)))
      }
      e.getMessage should include("ON")
      e.getMessage should include("fullTableMerge")
    } finally spark.conf.unset(ManifestLake.NmbsSmallTableBytesConf)
  }

  test("an NMBS UPDATE tombstones the old image and appends the post-" +
    "image — the MOR-update shape — and a fullTableMerge mirror equals " +
    "the source exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val t = freshTable()
    (0 until 4).foreach { b =>
      ManifestLake.write(
        (b * 250 + 1 to b * 250 + 250)
          .map(i => (i.toLong, i * 1.0, "live")).toDF("id", "v", "st")
          .repartition(1),
        t, append = b > 0, statsCols = Seq("id"))
    }
    val before = ManifestLake.snapshot(spark, t)
    // source holds only 1..500; rows the source lost are MARKED, not
    // deleted (the soft-delete mirror idiom)
    val src = (1 to 500).map(i => (i.toLong, i * 1.0, "live")).toDF("id", "v", "st")
    ManifestLake.mergeApply(src, t, Seq("id"),
      matched = Seq(ManifestLake.MergeUpdate(None, None)),
      notMatchedBySource = Seq(ManifestLake.MergeUpdate(None,
        Some(Seq("st" -> lit("gone"))))),
      fullTableMerge = true)
    val got = ManifestLake.read(spark, t)
    got.count() shouldBe 1000
    got.filter($"st" === "gone").count() shouldBe 500
    got.filter($"id" > 500L && $"st" =!= "gone").count() shouldBe 0
    got.filter($"id" === 400L).select("st").as[String].head() shouldBe "live"
    ManifestLake.fastCount(spark, t) shouldBe 1000L
    // the files NOT holding matched keys kept their bytes: old images
    // vectored, post-images appended
    val after = ManifestLake.snapshot(spark, t)
    val unmatchedFiles = before.entries.filter(e =>
      e.range("id").exists(_.min > BigDecimal(500)))
    unmatchedFiles should not be empty
    unmatchedFiles.foreach { e =>
      after.entries.find(_.path == e.path).get.dv should not be empty
    }
  }

  test("truncated string file stats prune point and range lookups on a " +
    "string-clustered table; truncated, non-ASCII and control-char keys " +
    "all stay correct") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    val df = (0 until 4000)
      .map(i => (i.toLong, f"doc-$i%06d", s"payload_$i"))
      .toDF("id", "key", "payload")
    ManifestLake.writeClustered(df, t, "key", nFiles = 16)
    val snap = ManifestLake.snapshot(spark, t)
    // every file records a string range for the cluster key
    all(snap.entries.map(_.strRange("key").isDefined)) shouldBe true
    // a point lookup opens a strict subset of files and finds its row
    val cand = ManifestLake.pointLookupCandidates(spark, t, "key",
      "doc-001234")
    cand.size should be < snap.entries.size
    cand.size should be >= 1
    ManifestLake.readEq(spark, t, "key", "doc-001234").count() shouldBe 1
    // a range scan prunes and loses nothing
    val rc = ManifestLake.strRangeCandidates(snap, "key",
      "doc-001000", "doc-001099")
    rc.size should be < snap.entries.size
    ManifestLake.readRangeStr(spark, t, "key", "doc-001000", "doc-001099")
      .select("key").distinct().count() shouldBe 100
    // a key beyond every range is a correct EMPTY answer, zero files
    ManifestLake.strRangeCandidates(snap, "key", "zzz", "zzz") shouldBe empty
    ManifestLake.readEq(spark, t, "key", "zzz").count() shouldBe 0
    // DML prunes on string predicates too: deleting one key rewrites
    // only the file(s) whose recorded range admits it
    val preSnap = ManifestLake.snapshot(spark, t)
    ManifestLake.delete(spark, t, col("key") === "doc-000777")
    val postSnap = ManifestLake.snapshot(spark, t)
    (preSnap.files.toSet intersect postSnap.files.toSet).size should be >=
      (preSnap.entries.size - 2)
    ManifestLake.read(spark, t).count() shouldBe 3999
    ManifestLake.readEq(spark, t, "key", "doc-000777").count() shouldBe 0

    // keys LONGER than the truncation length record a 32-char prefix
    // min and a bumped upper bound — lookups stay exact even when every
    // file shares the same truncated range
    val t2 = freshTable()
    val df2 = (0 until 1000)
      .map(i => (i.toLong, f"common-prefix-0123456789-abcdefg-$i%04d"))
      .toDF("id", "key")
    ManifestLake.writeClustered(df2, t2, "key", nFiles = 4)
    val s2 = ManifestLake.snapshot(spark, t2)
    all(s2.entries.map(_.strRange("key").get.min.length)) shouldBe 32
    ManifestLake.readEq(spark, t2, "key",
      "common-prefix-0123456789-abcdefg-0500").count() shouldBe 1

    // non-ASCII keys: footer byte order and JVM order can disagree, so
    // nothing is recorded — and nothing is ever wrongly skipped
    val t3 = freshTable()
    ManifestLake.write(
      Seq((1L, "清华大学"), (2L, "мир"), (3L, "ascii")).toDF("id", "key")
        .coalesce(1), // one file, so its stats span the non-ASCII keys
      t3, statsCol = Some("key"))
    ManifestLake.snapshot(spark, t3).entries
      .flatMap(_.strRange("key")) shouldBe empty
    ManifestLake.readEq(spark, t3, "key", "мир").count() shouldBe 1

    // tab/newline keys URL-encode through the line-oriented manifest
    val t4 = freshTable()
    ManifestLake.write(
      Seq((1L, "a\tb"), (2L, "c\nd"), (3L, "e f")).toDF("id", "key"),
      t4, statsCol = Some("key"))
    val ranges4 = ManifestLake.snapshot(spark, t4).entries
      .flatMap(_.strRange("key"))
    ranges4 should not be empty
    ranges4.map(_.min).min shouldBe "a\tb"
    ManifestLake.readEq(spark, t4, "key", "c\nd").count() shouldBe 1
    ManifestLake.read(spark, t4).filter(col("key") === "e f")
      .count() shouldBe 1
  }

  test("history rolls the file set forward from one resolution: " +
    "O(versions) log reads, never a checkpoint walk per version") {
    import org.apache.spark.sql.functions.col
    val saved = ManifestLake.checkpointInterval
    ManifestLake.checkpointInterval = 5
    try {
      val t = freshTable()
      (1 to 20).foreach(i => ManifestLake.write(rows(i * 10 to i * 10 + 9), t))
      ManifestLake.delete(spark, t, col("id") <= 15) // remove-carrying v21
      val before = ManifestLake.logReads.get()
      val hist = ManifestLake.history(spark, t).collect()
      val reads = ManifestLake.logReads.get() - before
      hist.map(_.getLong(0)).toSeq shouldBe (1L to 21L)
      // one read per version + one bounded first-resolution (+ its ts
      // re-read): far under the per-version walk this replaces
      reads should be <= 27L
      // the rolled-forward file count ends exactly at the head's truth
      hist.last.getLong(1) shouldBe
        ManifestLake.snapshot(spark, t).entries.size.toLong
    } finally ManifestLake.checkpointInterval = saved
  }

  test("vacuum checkpoints the oldest retained version so retained " +
    "snapshots never walk into the dropped log range") {
    val saved = ManifestLake.checkpointInterval
    ManifestLake.checkpointInterval = 100 // no cadence checkpoints at all
    try {
      val t = freshTable()
      (1 to 9).foreach(i => ManifestLake.write(rows(i * 10 to i * 10 + 9), t))
      ManifestLake.vacuum(spark, t, keepLast = 3)
      // retained versions resolve even though v1-v6's delta records are gone
      ManifestLake.read(spark, t, Some(7L)).count() shouldBe 70
      ManifestLake.read(spark, t, Some(9L)).count() shouldBe 90
      ManifestLake.versions(spark, t) shouldBe Seq(7L, 8L, 9L)
      intercept[IllegalArgumentException] {
        ManifestLake.read(spark, t, Some(3L))
      }
      // appends keep working after the vacuum
      ManifestLake.write(rows(100 to 109), t)
      ManifestLake.read(spark, t).count() shouldBe 100
    } finally ManifestLake.checkpointInterval = saved
  }

  test("an append with a different partitionBy than the table's layout " +
    "fails fast instead of committing a mixed-depth file list") {
    import spark.implicits._
    val t = freshTable()
    val data = (1 to 100).map(i => (i.toLong, s"d${i % 2}", s"p$i"))
      .toDF("id", "date", "payload")
    ManifestLake.write(data, t, partitionBy = Seq("date"))
    val e = intercept[IllegalArgumentException] {
      ManifestLake.write(data, t, partitionBy = Nil) // append, wrong layout
    }
    e.getMessage should include("layout mismatch")
    // an overwrite may change the layout deliberately
    ManifestLake.write(data, t, append = false, partitionBy = Nil)
    ManifestLake.read(spark, t).count() shouldBe 100
  }

  test("merge rejects duplicate-keyed update sets by default (the " +
    "multiple-source-rows-matched contract); compacted callers can opt out") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.write(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"), t)
    val dup = Seq((1L, "x"), (1L, "y")).toDF("id", "payload")
    val e = intercept[IllegalArgumentException] {
      ManifestLake.merge(dup, t, Seq("id"))
    }
    e.getMessage should include("duplicate keys")
    ManifestLake.read(spark, t).count() shouldBe 2 // nothing committed
    // the documented opt-out for already-compacted CDC batches
    ManifestLake.merge(Seq((2L, "B2")).toDF("id", "payload"), t, Seq("id"),
      checkUniqueKeys = false)
    ManifestLake.read(spark, t).count() shouldBe 2
  }

  test("delete verifyPrune aborts before committing when the given range " +
    "under-covers the predicate") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.writeClustered(
      (1 to 4000).map(i => (i.toLong, s"p$i")).toDF("id", "payload"),
      t, "id", nFiles = 4)
    // predicate matches ids ≤ 1500 but the range only covers ≤ 500: file 2
    // (ids 1001-2000) holds matches the prune would silently retain
    val e = intercept[IllegalArgumentException] {
      ManifestLake.delete(spark, t,
        org.apache.spark.sql.functions.col("id") <= 1500L,
        pruneRange = Some(("id", 0.0, 500.0)), verifyPrune = true)
    }
    e.getMessage should include("under-covers")
    ManifestLake.read(spark, t).count() shouldBe 4000 // aborted pre-commit
    // a COVERING range passes verification and deletes exactly
    ManifestLake.delete(spark, t,
      org.apache.spark.sql.functions.col("id") <= 1500L,
      pruneRange = Some(("id", 0.0, 1500.0)), verifyPrune = true)
    ManifestLake.read(spark, t).count() shouldBe 2500
  }

  test("delete derives prune bounds from simple range predicates — no " +
    "caller hint needed for the manifest-stats skipping") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.writeClustered(
      (1 to 4000).map(i => (i.toLong, s"p$i")).toDF("id", "payload"),
      t, "id", nFiles = 4)
    val before = ManifestLake.snapshot(spark, t)
    // no pruneRange: the bounds come from the predicate's conjuncts
    ManifestLake.delete(spark, t,
      org.apache.spark.sql.functions.col("id") <= 150L &&
        org.apache.spark.sql.functions.col("payload").isNotNull)
    val after = ManifestLake.snapshot(spark, t)
    after.entries.map(_.line)
      .intersect(before.entries.map(_.line)) should have length 3
    ManifestLake.read(spark, t).count() shouldBe 3850
  }

  test("multi-column file stats: a second recorded column prunes reads " +
    "and merge candidates without evicting the first") {
    import spark.implicits._
    val t = freshTable()
    // id and ts are correlated (ts = id * 10): clustering on id also
    // orders ts, so both columns' footer ranges are narrow per file
    val data = (1 to 4000).map(i => (i.toLong, i * 10L, s"p$i"))
      .toDF("id", "ts", "payload")
    ManifestLake.writeClustered(data, t, "id", nFiles = 4,
      extraStatsCols = Seq("ts"))
    val snap = ManifestLake.snapshot(spark, t)
    snap.entries.foreach(_.ranges.map(_.col).toSet shouldBe Set("id", "ts"))
    // both columns skip from the manifest alone
    ManifestLake.readRange(spark, t, "id", 100, 200)
      .inputFiles.length should be <= 2
    val byTs = ManifestLake.readRange(spark, t, "ts", 1000, 2000)
    byTs.count() shouldBe 101
    byTs.inputFiles.length should be <= 2
    // a merge keyed on the SECOND stats column prunes its candidates too:
    // only the file covering ts=1500 is rewritten
    val before = snap.entries.map(_.line)
    ManifestLake.merge(Seq((150L, 1500L, "UPD")).toDF("id", "ts", "payload"),
      t, Seq("ts"))
    val after = ManifestLake.snapshot(spark, t)
    after.entries.map(_.line).intersect(before) should have length 3
    // rewritten files keep BOTH columns' ranges
    after.entries.foreach(_.ranges.map(_.col).toSet shouldBe Set("id", "ts"))
    ManifestLake.read(spark, t).filter($"ts" === 1500L)
      .select("payload").as[String].collect() shouldBe Array("UPD")
  }

  test("merge on an empty table is a plain insert; null-keyed rows on " +
    "either side never match") {
    import spark.implicits._
    val t = freshTable()
    val v1 = ManifestLake.merge(
      Seq((1L, "a"), (2L, "b")).toDF("id", "payload"), t, Seq("id"))
    v1 shouldBe 1L
    ManifestLake.read(spark, t).count() shouldBe 2

    // a null-keyed current row is retained, a null-keyed update inserts
    ManifestLake.write(
      Seq((Option.empty[Long], "null_current")).toDF("id", "payload"), t)
    ManifestLake.merge(
      Seq((Option.empty[Long], "null_update")).toDF("id", "payload"),
      t, Seq("id"))
    val payloads = ManifestLake.read(spark, t)
      .as[(Option[Long], String)].collect().map(_._2).toSet
    payloads should contain allOf ("null_current", "null_update", "a", "b")
  }

  test("bloom sidecars prune point lookups to the files actually holding " +
    "the key; files without a sidecar are kept conservatively and vacuum " +
    "collects sidecars with their data files") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    // clustered by `bucket` so min/max stats are useless for `id` point
    // lookups: every file's id range spans the whole key space
    val base = (1 to 4000).map(i => (i.toLong, (i % 4).toLong, s"p$i"))
      .toDF("id", "bucket", "payload")
    ManifestLake.writeClustered(base, t, "bucket", nFiles = 4,
      bloomCols = Seq("id"))
    val all = ManifestLake.snapshot(spark, t).entries
    all.size should be >= 3 // range clustering may sample fewer boundaries
    // id 17 lives in ONE bucket's file only — blooms must prune the rest
    // (up to rare false positives; 3% FPP across the foreign files makes
    // zero pruning astronomically unlikely)
    val cands = ManifestLake.pointLookupCandidates(spark, t, "id", 17L)
    cands.size should be < all.size
    ManifestLake.readEq(spark, t, "id", 17L)
      .select("payload").as[String].collect() shouldBe Array("p17")
    // a missing key prunes to zero files but still answers (empty)
    ManifestLake.readEq(spark, t, "id", 999999L).count() shouldBe 0L

    val (fs, p) = {
      val path = new org.apache.hadoop.fs.Path(t)
      (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
    }
    val bdir = new org.apache.hadoop.fs.Path(t, "_blooms")
    def bloomFiles(dir: org.apache.hadoop.fs.Path): Seq[String] =
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.flatMap(st =>
        if (st.isDirectory) bloomFiles(st.getPath)
        else Seq(st.getPath.getName))

    // bloom coverage is a table property: a plain append INHERITS it
    // (its new file gets a sidecar without the caller asking)
    ManifestLake.write(Seq((900001L, 9L, "new")).toDF("id", "bucket",
      "payload"), t)
    val after = ManifestLake.snapshot(spark, t)
    after.bloomCols shouldBe Seq("id")
    val appended = after.entries.filterNot(e => all.exists(_.path == e.path))
    appended should have length 1
    bloomFiles(bdir) should contain(
      appended.head.path + ".id.bloom")
    ManifestLake.readEq(spark, t, "id", 900001L)
      .select("payload").as[String].collect() shouldBe Array("new")

    // a file whose sidecar is MISSING (legacy commit, partial coverage)
    // must always survive the vote — delete the appended file's sidecar
    fs.delete(new org.apache.hadoop.fs.Path(bdir,
      appended.head.path + ".id.bloom"), false)
    ManifestLake.pointLookupCandidates(spark, t, "id", 17L)
      .map(_.path) should contain(appended.head.path)

    // compaction + vacuum: old sidecars die with their files, and the
    // compacted file is RE-bloomed (maintenance never decays pruning)
    ManifestLake.compact(spark, t)
    ManifestLake.vacuum(spark, t, keepLast = 1)
    val compacted = ManifestLake.snapshot(spark, t)
    compacted.bloomCols shouldBe Seq("id")
    bloomFiles(bdir).toSet shouldBe
      compacted.entries.map(_.path + ".id.bloom").toSet
    ManifestLake.readEq(spark, t, "id", 17L)
      .select("payload").as[String].collect() shouldBe Array("p17")
    p.toString should not be empty
  }

  test("CHECK constraints gate writes, merges and updates before " +
    "anything commits; NULL passes; existing data is validated on add; " +
    "the property survives maintenance and can be dropped") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val t = freshTable()
    ManifestLake.write(
      Seq((1L, Some(5.0)), (2L, None)).toDF("id", "price"), t)
    // adding over already-violating data is rejected
    intercept[ManifestLake.ConstraintViolationException] {
      ManifestLake.addConstraint(spark, t, "price_pos", "price > 10.0")
    }
    // a line break in the predicate would split the header and corrupt
    // the line-oriented log — rejected at the API
    intercept[IllegalArgumentException] {
      ManifestLake.addConstraint(spark, t, "bad", "price >= 0\nOR true")
    }.getMessage should include("single-line")
    ManifestLake.addConstraint(spark, t, "price_pos", "price >= 0.0")
    val v = ManifestLake.currentVersion(spark, t).get
    // a violating append aborts BEFORE committing; NULL passes (SQL CHECK)
    intercept[ManifestLake.ConstraintViolationException] {
      ManifestLake.write(Seq((3L, Some(-1.0))).toDF("id", "price"), t)
    }.getMessage should include("price_pos")
    ManifestLake.currentVersion(spark, t) shouldBe Some(v)
    ManifestLake.write(
      Seq((3L, Some(7.0)), (4L, None)).toDF("id", "price"), t)
    // a violating merge and a violating update are both rejected —
    // validated against the STAGED rewrite (sound for non-deterministic
    // update sets), and the abort deletes the staged files: the on-disk
    // data-file set is exactly what it was before either attempt
    def dataFiles(): Set[String] = {
      val path = new org.apache.hadoop.fs.Path(t)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(path, true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val f = it.next().getPath.toString
        if (f.endsWith(".parquet") && !f.contains("_manifests") &&
          !f.contains("_staging")) b += f
      }
      b.result()
    }
    val before = dataFiles()
    intercept[ManifestLake.ConstraintViolationException] {
      ManifestLake.merge(Seq((1L, Some(-9.0))).toDF("id", "price"),
        t, Seq("id"))
    }
    intercept[ManifestLake.ConstraintViolationException] {
      ManifestLake.update(spark, t, col("id") === 1L,
        Seq("price" -> lit(-2.0)))
    }
    dataFiles() shouldBe before
    // the constraint is a table property: it survives compaction…
    ManifestLake.compact(spark, t)
    ManifestLake.snapshot(spark, t).checks shouldBe
      Seq("price_pos" -> "price >= 0.0")
    // …and enforcement is gone after dropping it
    ManifestLake.dropConstraint(spark, t, "price_pos")
    ManifestLake.write(Seq((9L, Some(-1.0))).toDF("id", "price"), t)
    ManifestLake.read(spark, t).count() shouldBe 5
  }

  test("bloom coverage AND its per-file sizing persist through " +
    "overwrite and DML as table properties") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val t = freshTable()
    val data = (1 to 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    ManifestLake.write(data, t, append = false, bloomCols = Seq("id"),
      bloomExpectedRows = 5000L)
    ManifestLake.snapshot(spark, t).bloomExpectedRows shouldBe 5000L
    // INSERT OVERWRITE shape: no bloom args, coverage must survive
    ManifestLake.write(data, t, append = false)
    val afterOverwrite = ManifestLake.snapshot(spark, t)
    afterOverwrite.bloomCols shouldBe Seq("id")
    afterOverwrite.bloomExpectedRows shouldBe 5000L
    // DML rewrite: same
    ManifestLake.update(spark, t, col("id") === 1L,
      Seq("payload" -> lit("x")))
    val afterUpdate = ManifestLake.snapshot(spark, t)
    afterUpdate.bloomCols shouldBe Seq("id")
    afterUpdate.bloomExpectedRows shouldBe 5000L
  }

  test("update resolves assignment targets case-insensitively like the " +
    "rest of Spark SQL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val t = freshTable()
    ManifestLake.write(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"), t)
    ManifestLake.update(spark, t, col("id") === 1L,
      Seq("PAYLOAD" -> lit("upd")))
    ManifestLake.read(spark, t).orderBy("id").select("payload")
      .as[String].collect() shouldBe Array("upd", "b")
    // the duplicate check sees through the spelling difference
    intercept[IllegalArgumentException] {
      ManifestLake.update(spark, t, col("id") === 1L,
        Seq("payload" -> lit("x"), "Payload" -> lit("y")))
    }.getMessage should include("more than once")
  }

  test("binPack rewrites only the small-file tail: right-sized files " +
    "carry over verbatim, counts and blooms survive, re-run is a no-op") {
    import spark.implicits._
    val t = freshTable()
    // one right-sized base file + a tail of small appends (the hourly-
    // ingest shape)
    ManifestLake.write(rows(1 to 50000).coalesce(1), t,
      bloomCols = Seq("id"))
    (0 until 4).foreach(i =>
      ManifestLake.write(rows(100000 + i * 10 to 100000 + i * 10 + 9)
        .coalesce(1), t))
    val before = ManifestLake.snapshot(spark, t)
    before.entries should have length 5

    // thresholds scaled to test data: the 50k-row base (~hundreds of
    // KB) must count as right-sized, the 10-row appends as small
    val report = ManifestLake.binPack(spark, t,
      targetFileBytes = 10L * 1024 * 1024, smallFileBytes = 100L * 1024)
    report.filesBefore shouldBe 5
    report.filesAfter shouldBe 2 // base + one packed file
    val after = ManifestLake.snapshot(spark, t)
    // the large file's entry is carried VERBATIM (ranges + row count)
    val baseLine = before.entries.head.line
    after.entries.map(_.line) should contain(baseLine)
    // nothing lost, metadata count still fully covered
    ManifestLake.read(spark, t).count() shouldBe 50040L
    ManifestLake.fastCount(spark, t) shouldBe 50040L
    after.entries.forall(_.rows.nonEmpty) shouldBe true
    // bloom coverage survives the pack: the new file has a sidecar and
    // a point lookup in the packed range still answers
    after.bloomCols shouldBe Seq("id")
    ManifestLake.readEq(spark, t, "id", 100011L).count() shouldBe 1L

    // a second pack finds at most one small file: version no-op
    ManifestLake.binPack(spark, t,
      targetFileBytes = 10L * 1024 * 1024,
      smallFileBytes = 100L * 1024).newVersion shouldBe report.newVersion
  }

  test("fastCount answers COUNT(*) from the manifest alone — provably " +
    "no data IO — and scans only legacy entries without recorded counts") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.write(rows(1 to 500), t)
    ManifestLake.write(rows(501 to 520), t)
    ManifestLake.fastCount(spark, t) shouldBe 520L
    ManifestLake.fastCount(spark, t, Some(1L)) shouldBe 500L

    // proof of zero data IO: delete the data files out-of-band and the
    // metadata count still answers (a scan would crash)
    val (fs, p) = {
      val path = new org.apache.hadoop.fs.Path(t)
      (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
    }
    ManifestLake.snapshot(spark, t).files.foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(p, f), false))
    ManifestLake.fastCount(spark, t) shouldBe 520L

    // hybrid: a fabricated legacy entry (no rows= token) forces a scan
    // of THAT file only; recorded entries still contribute metadata-only
    val t2 = freshTable()
    ManifestLake.write(rows(1 to 100), t2)
    val (fs2, p2) = {
      val path = new org.apache.hadoop.fs.Path(t2)
      (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
    }
    rows(1 to 7).coalesce(1).write.parquet(s"$t2/legacy")
    val legacy = fs2.listStatus(new org.apache.hadoop.fs.Path(s"$t2/legacy"))
      .map(_.getPath.getName).find(_.endsWith(".parquet")).get
    ManifestLake.commitLog(fs2, p2, full = false,
      adds = Seq(s"legacy/$legacy"), removes = Nil, prev = Some(1L))
    ManifestLake.snapshot(spark, t2).entries
      .count(_.rows.isEmpty) shouldBe 1
    ManifestLake.fastCount(spark, t2) shouldBe 107L
  }

  test("bloom point lookups hash under the SESSION time zone: a " +
    "string-keyed timestamp lookup finds its row in a non-UTC session") {
    import spark.implicits._
    import org.apache.spark.sql.functions.to_timestamp
    val saved = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val t = freshTable()
      ManifestLake.write(
        Seq("2026-01-01 00:00:00", "2026-06-15 12:30:00")
          .toDF("s").select(to_timestamp($"s").as("ts")),
        t, bloomCols = Seq("ts"))
      // the key is a STRING cast to timestamp at lookup time — the
      // cast must run in the session zone, like the row filter does
      ManifestLake.readEq(spark, t, "ts", "2026-01-01 00:00:00")
        .count() shouldBe 1L
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
  }

  test("readIn answers a key batch through the blooms in one sidecar " +
    "pass, absent keys included") {
    import spark.implicits._
    val t = freshTable()
    val base = (1 to 4000).map(i => (i.toLong, (i % 4).toLong, s"p$i"))
      .toDF("id", "bucket", "payload")
    ManifestLake.writeClustered(base, t, "bucket", nFiles = 4,
      bloomCols = Seq("id"))
    ManifestLake.readIn(spark, t, "id", Seq(17L, 2500L, 999999L))
      .select("payload").as[String].collect().sorted shouldBe
      Array("p17", "p2500")
    ManifestLake.readIn(spark, t, "id", Seq(999998L, 999999L))
      .count() shouldBe 0L
  }

  test("update rewrites only files holding a match; untouched entries " +
    "carry over verbatim and a no-match update is a version no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, min}
    val t = freshTable()
    val base = (1 to 4000).map(i => (i.toLong, i * 2.0, s"p$i"))
      .toDF("id", "price", "payload")
    ManifestLake.writeClustered(base, t, "id", nFiles = 4)
    val before = ManifestLake.snapshot(spark, t)

    // ids 1..150 live in the first file only — the other three carry over
    val v2 = ManifestLake.update(spark, t, col("id") <= 150L,
      Seq("price" -> (col("price") + 10000.0), "payload" -> lit("UPD")))
    v2 shouldBe before.version + 1
    val after = ManifestLake.snapshot(spark, t)
    after.entries.map(_.line)
      .intersect(before.entries.map(_.line)) should have length 3
    // rewritten files keep their recorded stats (pruning must not decay)
    after.entries.count(_.range("id").isDefined) shouldBe 4
    val head = ManifestLake.read(spark, t)
    head.count() shouldBe 4000 // UPDATE never changes cardinality
    head.filter($"id" <= 150L)
      .agg(min($"price")).collect().head.getDouble(0) shouldBe 10002.0
    head.filter($"id" > 150L).filter($"payload" === "UPD").count() shouldBe 0

    // nothing matches: no new version, nothing rewritten
    ManifestLake.update(spark, t, col("id") < 0L,
      Seq("price" -> lit(0.0))) shouldBe v2
    ManifestLake.currentVersion(spark, t) shouldBe Some(v2)
  }

  test("update leaves NULL-predicate rows unchanged and evaluates all " +
    "assignments against the pre-update row (SET a = b, b = a swaps)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    ManifestLake.write(
      Seq((1L, Some(900.0), 1.0), (2L, None, 2.0), (3L, Some(1200.0), 3.0))
        .toDF("id", "price", "qty").coalesce(1), t)
    ManifestLake.update(spark, t, col("price") < 950.0,
      Seq("price" -> col("qty"), "qty" -> col("price")))
    val rows = ManifestLake.read(spark, t).orderBy("id")
      .as[(Long, Option[Double], Double)].collect()
    rows(0) shouldBe ((1L, Some(1.0), 900.0)) // swapped, both read old row
    rows(1) shouldBe ((2L, None, 2.0))        // NULL predicate: untouched
    rows(2) shouldBe ((3L, Some(1200.0), 3.0))
  }

  test("update rejects unknown and duplicated target columns before " +
    "touching any data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val t = freshTable()
    ManifestLake.write(Seq((1L, "a")).toDF("id", "payload"), t)
    intercept[IllegalArgumentException] {
      ManifestLake.update(spark, t, col("id") === 1L,
        Seq("nope" -> lit("x")))
    }.getMessage should include("unknown column 'nope'")
    intercept[IllegalArgumentException] {
      ManifestLake.update(spark, t, col("id") === 1L,
        Seq("payload" -> lit("x"), "payload" -> lit("y")))
    }.getMessage should include("more than once")
    ManifestLake.currentVersion(spark, t) shouldBe Some(1L)
  }

  test("update records preimage/postimage CDC sidecars when asked, served " +
    "verbatim by the change feed") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    ManifestLake.write(
      (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("id", "price"), t)
    ManifestLake.update(spark, t, col("id") <= 2L,
      Seq("price" -> (col("price") * 100)), recordChangeFeed = true)
    ManifestLake.changesBetween(spark, t, 1, 2)
      .map(_.changeFiles.nonEmpty) shouldBe Seq(true)
    val feed = ManifestLake.changeFeed(spark, t, 1, 2)
      .select("_change_type", "id", "price")
      .as[(String, Long, Double)].collect().toSet
    feed shouldBe Set(
      ("update_preimage", 1L, 1.0), ("update_postimage", 1L, 100.0),
      ("update_preimage", 2L, 2.0), ("update_postimage", 2L, 200.0))
  }

  // ---- deletion vectors (merge-on-read deletes) ----

  /** Relative paths + sizes of every data parquet under the table root
    * (manifests/sidecars excluded) — the observable for "MOR never
    * rewrites data files". */
  private def dataFileSizes(t: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(t)
    val out = scala.collection.mutable.Map.empty[String, Long]
    java.nio.file.Files.walk(root).forEach { p =>
      val rel = root.relativize(p).toString
      if (rel.endsWith(".parquet") && !rel.startsWith("_"))
        out(rel) = java.nio.file.Files.size(p)
    }
    out.toMap
  }

  test("deleteMor removes rows WITHOUT rewriting any data file; " +
    "COUNT(*) stays metadata-exact and a repeat delete is a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    ManifestLake.writeClustered(
      (1 to 4000).map(i => (i.toLong, i * 2.0)).toDF("id", "price"),
      t, "id", nFiles = 8)
    val before = dataFileSizes(t)
    val v = ManifestLake.deleteMor(spark, t, col("id") % 100 === 0)
    v shouldBe 2L
    // data files byte-identical — the whole point of merge-on-read
    dataFileSizes(t) shouldBe before
    // reads serve the delete
    val got = ManifestLake.read(spark, t)
    got.count() shouldBe 3960
    got.filter(col("id") % 100 === 0).count() shouldBe 0
    // the manifest carries dv annotations; COUNT(*) is metadata-only
    val snap = ManifestLake.snapshot(spark, t)
    snap.entries.count(_.dv.nonEmpty) should be > 0
    snap.entries.flatMap(_.dvRows).sum shouldBe 40L
    ManifestLake.fastCount(spark, t) shouldBe 3960L
    // content-idempotent: every match is already vectored → version no-op
    ManifestLake.deleteMor(spark, t, col("id") % 100 === 0) shouldBe 2L
  }

  test("deleteMor vectors are cumulative across commits and time travel " +
    "reads each version's own DV state") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    ManifestLake.write(
      (1 to 1000).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), t)
    ManifestLake.deleteMor(spark, t, col("id") <= 100L)       // v2
    ManifestLake.deleteMor(spark, t, col("id") > 900L)        // v3: same file
    ManifestLake.read(spark, t).count() shouldBe 800
    ManifestLake.fastCount(spark, t) shouldBe 800L
    // time travel: v1 full, v2 after the first delete only
    ManifestLake.read(spark, t, Some(1L)).count() shouldBe 1000
    ManifestLake.read(spark, t, Some(2L)).count() shouldBe 900
    ManifestLake.fastCount(spark, t, Some(2L)) shouldBe 900L
    // null-predicate rows survive, SQL DELETE semantics
    val t2 = freshTable()
    ManifestLake.write(Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
      .toDF("id", "price"), t2)
    ManifestLake.deleteMor(spark, t2, col("price") < 2.0)
    ManifestLake.read(spark, t2).select("id").as[Long].collect()
      .sorted shouldBe Seq(2L, 3L)
  }

  test("copy-on-write DML and compaction over a vectored file " +
    "MATERIALIZE the vector — deleted rows never resurrect") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val t = freshTable()
    ManifestLake.write(
      (1 to 500).map(i => (i.toLong, i * 1.0)).toDF("id", "price"), t)
    ManifestLake.deleteMor(spark, t, col("id") <= 50L)
    // CoW update rewrites the (single) file: dv gone, delete persists
    ManifestLake.update(spark, t, col("id") === 100L,
      Seq("price" -> lit(999.0)))
    val snap = ManifestLake.snapshot(spark, t)
    snap.entries.forall(_.dv.isEmpty) shouldBe true
    ManifestLake.read(spark, t).count() shouldBe 450
    ManifestLake.read(spark, t).filter(col("id") <= 50L).count() shouldBe 0
    ManifestLake.read(spark, t).filter(col("price") === 999.0)
      .count() shouldBe 1
    // compaction materializes too
    val t2 = freshTable()
    (0 until 4).foreach(b => ManifestLake.write(
      (b * 100 + 1 to b * 100 + 100).map(i => (i.toLong, s"p$i"))
        .toDF("id", "payload"), t2))
    ManifestLake.deleteMor(spark, t2, col("id") % 10 === 0)
    ManifestLake.compact(spark, t2)
    val snap2 = ManifestLake.snapshot(spark, t2)
    snap2.entries.forall(_.dv.isEmpty) shouldBe true
    ManifestLake.read(spark, t2).count() shouldBe 360
    ManifestLake.fastCount(spark, t2) shouldBe 360L
  }

  test("the change feed diffs a DV commit to exactly its deleted rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    ManifestLake.write(
      (1 to 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), t)
    ManifestLake.deleteMor(spark, t, col("id") <= 3L)
    val feed = ManifestLake.changeFeed(spark, t, 1, 2)
      .select("_change_type", "id").as[(String, Long)].collect().toSet
    feed shouldBe Set(("delete", 1L), ("delete", 2L), ("delete", 3L))
    // recorded CDC sidecars work for MOR deletes too
    val t2 = freshTable()
    ManifestLake.write(
      (1 to 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), t2)
    ManifestLake.deleteMor(spark, t2, col("id") <= 2L,
      recordChangeFeed = true)
    ManifestLake.changesBetween(spark, t2, 1, 2)
      .map(_.changeFiles.nonEmpty) shouldBe Seq(true)
    ManifestLake.changeFeed(spark, t2, 1, 2)
      .select("_change_type", "id").as[(String, Long)].collect()
      .toSet shouldBe Set(("delete", 1L), ("delete", 2L))
  }

  test("vacuum collects superseded DV sidecars but keeps referenced ones") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    // ONE data file: the second delete touches the same file, so its
    // cumulative sidecar supersedes the first (disjoint-file deletes
    // keep both sidecars live — correctly)
    ManifestLake.write(
      (1 to 1000).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
        .repartition(1), t)
    ManifestLake.deleteMor(spark, t, col("id") <= 100L)  // sidecar A
    ManifestLake.deleteMor(spark, t, col("id") > 900L)   // sidecar B ⊇ A
    def dvFiles(): Seq[String] = {
      val d = java.nio.file.Paths.get(t, "_dv")
      if (!java.nio.file.Files.exists(d)) Seq.empty
      else {
        val s = java.nio.file.Files.list(d)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString)
            .filter(_.endsWith(".bin")).toList
        } finally s.close()
      }
    }
    dvFiles() should have size 2
    // retain only the head: sidecar A is unreferenced → collected
    ManifestLake.vacuum(spark, t, keepLast = 1)
    dvFiles() should have size 1
    ManifestLake.read(spark, t).count() shouldBe 800
    ManifestLake.fastCount(spark, t) shouldBe 800L
  }

  test("updateMor vectors the old images and appends the new ones — no " +
    "touched file rewritten, counts exact, CDC pairs served") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val t = freshTable()
    ManifestLake.writeClustered(
      (1 to 2000).map(i => (i.toLong, i * 1.0)).toDF("id", "price"),
      t, "id", nFiles = 4)
    val before = dataFileSizes(t)
    ManifestLake.updateMor(spark, t, col("id") <= 3L,
      Seq("price" -> (col("price") * 100)), recordChangeFeed = true)
    // every pre-update file is byte-identical; the post-images are a
    // NEW file on top
    val after = dataFileSizes(t)
    before.foreach { case (f, sz) => after(f) shouldBe sz }
    after.size shouldBe before.size + 1
    // reads serve the update exactly
    val got = ManifestLake.read(spark, t)
    got.count() shouldBe 2000
    got.filter(col("id") <= 3L).select("price").as[Double].collect()
      .sorted shouldBe Seq(100.0, 200.0, 300.0)
    ManifestLake.fastCount(spark, t) shouldBe 2000L
    // assignments read the OLD row; NULL-predicate rows untouched
    val feed = ManifestLake.changeFeed(spark, t, 1, 2)
      .select("_change_type", "id", "price")
      .as[(String, Long, Double)].collect().toSet
    feed shouldBe Set(
      ("update_preimage", 1L, 1.0), ("update_postimage", 1L, 100.0),
      ("update_preimage", 2L, 2.0), ("update_postimage", 2L, 200.0),
      ("update_preimage", 3L, 3.0), ("update_postimage", 3L, 300.0))
    // a later CoW pass over the vectored file materializes: the old
    // images stay gone
    ManifestLake.update(spark, t, col("id") === 5L,
      Seq("price" -> lit(555.0)))
    ManifestLake.read(spark, t).count() shouldBe 2000
    ManifestLake.read(spark, t).filter(col("id") === 1L)
      .select("price").as[Double].head() shouldBe 100.0
  }

  test("restore rolls the table back to an old version as a new " +
    "metadata-only commit, keeping the head's streaming watermark") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    ManifestLake.writeBatch(
      (1 to 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload"),
      t, batchId = 7L, appId = "app")
    ManifestLake.write(
      (101 to 120).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), t)
    ManifestLake.delete(spark, t, col("id") <= 50L)
    ManifestLake.read(spark, t).count() shouldBe 70
    val v = ManifestLake.restore(spark, t, 1L)
    v shouldBe 4L
    ManifestLake.read(spark, t).count() shouldBe 100
    // history preserved: the bad versions still time-travel
    ManifestLake.read(spark, t, Some(3L)).count() shouldBe 70
    // the head's streaming watermark survives the rollback: a replayed
    // batch 7 is still recognized as committed
    ManifestLake.snapshot(spark, t).batchId shouldBe Some(7L)
    ManifestLake.writeBatch(
      (1 to 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload"),
      t, batchId = 7L, appId = "app") shouldBe false
    // restoring to the current head is a no-op
    ManifestLake.restore(spark, t, 4L) shouldBe 4L
    // SQL surface
    LakeSql.register("restore_t", t)
    val r = spark.sql(
      "RESTORE TABLE graft_lake.restore_t TO VERSION AS OF 3").collect()
    r.head.getLong(0) shouldBe 3L
    ManifestLake.read(spark, t).count() shouldBe 70
  }

  test("DML predicates on partition columns prune candidates from the " +
    "PATH values — conservative on escapes and unparseables") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // unit-level: the pruning kernel itself
    def e(p: String) = ManifestLake.FileEntry(p)
    val entries = Seq(
      e("date=20250101/v00000001-a-00000.parquet"),
      e("date=20250102/v00000001-a-00001.parquet"),
      e("date=__HIVE_DEFAULT_PARTITION__/v00000001-a-00002.parquet"),
      e("date=a%20b/v00000001-a-00003.parquet"), // escaped: always kept
      e("v00000001-a-00004.parquet"))            // unpartitioned: kept
    val longT = Some(org.apache.spark.sql.types.LongType:
      org.apache.spark.sql.types.DataType)
    val strT = Some(org.apache.spark.sql.types.StringType:
      org.apache.spark.sql.types.DataType)
    ManifestLake.partitionPrune(entries, "date", longT,
      Some(BigDecimal(20250102)), Some(BigDecimal(20250102)), None, None)
      .map(_.path) shouldBe Seq(
        "date=20250102/v00000001-a-00001.parquet",
        "date=a%20b/v00000001-a-00003.parquet",
        "v00000001-a-00004.parquet")
    // string bounds prune lexicographically on STRING columns (ISO
    // dates sort); ASCII-gated both sides
    ManifestLake.partitionPrune(entries, "date", strT, None, None,
      Some("20250102"), None).map(_.path) should contain(
      "date=20250102/v00000001-a-00001.parquet")
    // TYPE GATE: numeric bounds never touch a string column's values
    // and string bounds never touch a numeric column's — both keep all
    // (minus the provably-unmatchable null partition)
    ManifestLake.partitionPrune(entries, "date", strT,
      Some(BigDecimal(20250102)), Some(BigDecimal(20250102)), None, None)
      .size shouldBe entries.size - 1 // only the null partition prunes
    ManifestLake.partitionPrune(entries, "date", longT, None, None,
      Some("x"), Some("x")).size shouldBe entries.size - 1
    // unknown column type: everything kept except the null partition
    ManifestLake.partitionPrune(entries, "date", None,
      Some(BigDecimal(1)), Some(BigDecimal(1)), None, None)
      .size shouldBe entries.size - 1
    // unrelated column: everything kept
    ManifestLake.partitionPrune(entries, "other", longT,
      Some(BigDecimal(1)), Some(BigDecimal(1)), None, None) should
      have size entries.size.toLong
    // end to end: a partitioned DELETE touches only its partition's
    // files; every other partition's files carry over verbatim
    val t = freshTable()
    ManifestLake.write(
      (1 to 300).map(i => (i.toLong, s"d${i % 3}", s"p$i"))
        .toDF("id", "part", "payload"),
      t, partitionBy = Seq("part"))
    val before = dataFileSizes(t)
    ManifestLake.delete(spark, t, col("part") === "d1")
    val after = dataFileSizes(t)
    // files of d0/d2 are byte-identical and still present
    before.filterNot(_._1.startsWith("part=d1")).foreach {
      case (f, sz) => after(f) shouldBe sz
    }
    ManifestLake.read(spark, t).count() shouldBe 200
    ManifestLake.read(spark, t).filter(col("part") === "d1")
      .count() shouldBe 0
  }

  test("DECIMAL column stats record SCALED values — range pruning and " +
    "stats-served MIN/MAX stay exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    // DECIMAL(10,2): parquet stores the unscaled int/long in its
    // statistics — recording that raw value would shift every bound by
    // 10^2 and make range pruning skip files that hold matching rows
    val df = (1 to 800).map(i => (i.toLong, BigDecimal(i) / 100))
      .toDF("id", "price")
      .select(col("id"), col("price").cast("decimal(10,2)").as("price"))
    ManifestLake.writeClustered(df, t, "price", nFiles = 4)
    val snap = ManifestLake.snapshot(spark, t)
    // recorded bounds are in COLUMN units: the global min/max are
    // 0.01 .. 8.00, not 1 .. 800
    snap.entries.flatMap(_.range("price")).map(_.min).min shouldBe
      BigDecimal("0.01")
    snap.entries.flatMap(_.range("price")).map(_.max).max shouldBe
      BigDecimal("8.00")
    // the pruned range read returns exactly the matching rows (an
    // unscaled-stats bug would prune every file for this window)
    ManifestLake.readRange(spark, t, "price", 2.0, 3.0)
      .count() shouldBe 101 // 2.00..3.00
    // SQL stats-served MIN/MAX return scaled decimals
    LakeSql.register("dec1", t)
    val q = spark.sql(
      "SELECT MIN(price) AS lo, MAX(price) AS hi, COUNT(*) AS n " +
        "FROM graft_lake.dec1")
    q.queryExecution.executedPlan.toString should not include "FileScan"
    val r = q.collect().head
    r.getDecimal(0) shouldBe new java.math.BigDecimal("0.01")
    r.getDecimal(1) shouldBe new java.math.BigDecimal("8.00")
    r.getLong(2) shouldBe 800L
  }

  test("the DV read applies vectors PER FILE — no join or exchange in " +
    "the plan, predicate pushdown intact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    ManifestLake.writeClustered(
      (1 to 2000).map(i => (i.toLong, i * 1.0)).toDF("id", "price"),
      t, "id", nFiles = 4)
    ManifestLake.deleteMor(spark, t, col("id") === 777L)
    val q = ManifestLake.read(spark, t).filter(col("price") > 1500.0)
    val plan = q.queryExecution.executedPlan.toString
    // the r8 shape (global broadcast anti-join of every file's pairs)
    // is gone: vectors apply as a dv_live filter inside the scan stage
    (plan should not).include("BroadcastExchange")
    (plan should not).include("Join")
    plan should include("dv_live")
    plan should include("PushedFilters: [IsNotNull(price), " +
      "GreaterThan(price,1500.0)")
    q.count() shouldBe 500 // 1501..2000; 777 not in range, none missing
  }

  test("a MASS MOR delete (50% of rows across many files) reads back " +
    "exactly with no broadcast and no driver-side pair set") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    ManifestLake.writeClustered(
      (1 to 20000).map(i => (i.toLong, i * 1.0)).toDF("id", "price"),
      t, "id", nFiles = 16)
    ManifestLake.deleteMor(spark, t, col("id") % 2 === 0)
    val snap = ManifestLake.snapshot(spark, t)
    snap.entries.count(_.dv.nonEmpty) shouldBe 16 // every file vectored
    val q = ManifestLake.read(spark, t)
    val plan = q.queryExecution.executedPlan.toString
    (plan should not).include("BroadcastExchange")
    plan should include("dv_live")
    q.count() shouldBe 10000
    q.filter(col("id") % 2 === 0).count() shouldBe 0
    ManifestLake.fastCount(spark, t) shouldBe 10000L
    // a second mass delete unions into each file's cumulative block
    ManifestLake.deleteMor(spark, t, col("id") % 3 === 0)
    // survivors: odd and not divisible by 3 → 1,5,7,11,... (2/6 of 20k
    // are odd non-multiples-of-3... exactly: odds 10000 minus odd
    // multiples of 3 (3,9,...,19997 = 3333) = 6667
    ManifestLake.read(spark, t).count() shouldBe 6667
    ManifestLake.fastCount(spark, t) shouldBe 6667L
    ManifestLake.read(spark, t)
      .filter(col("id") % 2 === 0 || col("id") % 3 === 0)
      .count() shouldBe 0
  }

  test("binPack purges a file once its deletion-vector ratio crosses " +
    "the threshold — vector materialized, dv= gone, neighbors verbatim") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    ManifestLake.writeClustered(
      (1 to 4000).map(i => (i.toLong, s"p$i")).toDF("id", "payload"),
      t, "id", nFiles = 4)
    // ~50% of ONE file's rows (ids 1..500 live in the first range file)
    ManifestLake.deleteMor(spark, t, col("id") <= 500L)
    val before = ManifestLake.snapshot(spark, t)
    before.entries.count(_.dv.nonEmpty) shouldBe 1
    val untouched = before.entries.filter(_.dv.isEmpty).map(_.path).toSet
    // below the threshold: a 50%-deleted file survives a 0.9 pass
    ManifestLake.binPack(spark, t, smallFileBytes = 1,
      purgeDvRatio = 0.9).newVersion shouldBe before.version
    // at 0.3 the file rewrites: vector materialized, dv= disappears
    val r = ManifestLake.binPack(spark, t, smallFileBytes = 1,
      purgeDvRatio = 0.3)
    r.newVersion shouldBe before.version + 1
    val after = ManifestLake.snapshot(spark, t)
    after.entries.forall(_.dv.isEmpty) shouldBe true
    // the three clean files carried verbatim — same manifest paths
    untouched.subsetOf(after.entries.map(_.path).toSet) shouldBe true
    ManifestLake.read(spark, t).count() shouldBe 3500
    ManifestLake.read(spark, t).filter(col("id") <= 500L)
      .count() shouldBe 0
    ManifestLake.fastCount(spark, t) shouldBe 3500L
    // maintenance commit: incremental consumers skip it
    ManifestLake.changesBetween(spark, t, before.version, r.newVersion)
      .map(_.maintenance) shouldBe Seq(true)
  }

  test("time-derived partitioning: a ts range resolves only its days' " +
    "partitions, the generation is enforced on appends, and a table " +
    "without the generation still answers unpruned") {
    import spark.implicits._
    val t = freshTable()
    def ts(day: Int, h: Int) = java.sql.Timestamp.from(
      java.time.LocalDateTime.of(2024, 1, day, h, 0)
        .toInstant(java.time.ZoneOffset.UTC))
    val events = (1 to 10).flatMap(day => (0 until 4).map(h =>
      (day.toLong * 100 + h, ts(day, h * 6), s"e$day-$h")))
      .toDF("event_id", "ts", "tag")
    ManifestLake.writeTimePartitioned(events, t, "ts")
    // 10 day partitions on disk; a 2-day closed range reads only 2
    val snap = ManifestLake.snapshot(spark, t)
    snap.entries.flatMap(e => e.path.split('/')
      .find(_.startsWith("p_day="))).distinct.size shouldBe 10
    val out = ManifestLake.readTsRange(spark, t, "ts",
      ts(3, 0), ts(4, 23))
    out.count() shouldBe 8L
    // pruning is observable in the scan: only the two days' files
    val scanned = out.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    scanned should include("p_day=2024-01-03")
    scanned should not include "p_day=2024-01-05"
    // appends materialize the day column and re-validate the recorded
    // generation; a plain write carrying a WRONG day value aborts by
    // the constraint's name and commits nothing
    ManifestLake.writeTimePartitioned(
      Seq((9901L, ts(7, 3), "late")).toDF("event_id", "ts", "tag"),
      t, "ts", append = true)
    ManifestLake.readTsRange(spark, t, "ts", ts(7, 0), ts(7, 6))
      .count() shouldBe 3L
    val bad = Seq((9902L, ts(8, 0), "bad"))
      .toDF("event_id", "ts", "tag")
      .withColumn("p_day", org.apache.spark.sql.functions.lit("2024-02-27"))
    val before = ManifestLake.currentVersion(spark, t)
    intercept[ManifestLake.ConstraintViolationException] {
      ManifestLake.write(bad, t, partitionBy = Seq("p_day"))
    }.getMessage should include("p_day_gen")
    ManifestLake.currentVersion(spark, t) shouldBe before
    // no recorded generation -> full snapshot, same answer
    val plain = freshTable()
    ManifestLake.write(events, plain)
    ManifestLake.readTsRange(spark, plain, "ts", ts(3, 0), ts(4, 23))
      .count() shouldBe 8L
  }

  test("month and hour granularities: partition values, range pruning, " +
    "and retention DML all follow the recorded pattern") {
    import spark.implicits._
    def ts(mo: Int, day: Int, h: Int) = java.sql.Timestamp.from(
      java.time.LocalDateTime.of(2024, mo, day, h, 0)
        .toInstant(java.time.ZoneOffset.UTC))
    // MONTH: a year of monthly rows, one quarter queried
    val tm = freshTable()
    val monthly = (1 to 12).map(mo => (mo.toLong, ts(mo, 15, 12), "m"))
      .toDF("event_id", "ts", "tag")
    ManifestLake.writeTimePartitioned(monthly, tm, "ts",
      granularity = "month")
    val msnap = ManifestLake.snapshot(spark, tm)
    msnap.entries.flatMap(_.path.split('/').find(_.startsWith("p_day=")))
      .distinct.size shouldBe 12
    msnap.entries.exists(_.path.contains("p_day=2024-03")) shouldBe true
    val q = ManifestLake.readTsRange(spark, tm, "ts",
      ts(4, 1, 0), ts(6, 30, 23))
    q.collect().map(_.getLong(0)).sorted shouldBe Array(4L, 5L, 6L)
    q.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString should not include "p_day=2024-01"
    // retention DML prunes by month period too
    ManifestLake.delete(spark, tm,
      org.apache.spark.sql.functions.col("ts") < ts(3, 1, 0),
      verifyPrune = true)
    ManifestLake.read(spark, tm).count() shouldBe 10L
    // HOUR: one day of hourly rows, a 3-hour window
    val th = freshTable()
    val hourly = (0 until 24).map(h => (h.toLong, ts(8, 1, h), "h"))
      .toDF("event_id", "ts", "tag")
    ManifestLake.writeTimePartitioned(hourly, th, "ts",
      granularity = "hour")
    ManifestLake.snapshot(spark, th).entries
      .flatMap(_.path.split('/').find(_.startsWith("p_day=")))
      .distinct.size shouldBe 24
    val hq = ManifestLake.readTsRange(spark, th, "ts",
      ts(8, 1, 10), ts(8, 1, 12))
    hq.collect().map(_.getLong(0)).sorted shouldBe Array(10L, 11L, 12L)
    hq.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString should not include "p_day=2024-08-01-20"
    // unknown granularity is a named error
    intercept[IllegalArgumentException] {
      ManifestLake.writeTimePartitioned(hourly, freshTable(), "ts",
        granularity = "week")
    }.getMessage should include("granularity")
  }

  test("time partitioning in a non-UTC session: day derivation and " +
    "range pruning agree on the session zone — no rows lost across " +
    "local midnight") {
    import spark.implicits._
    val t = freshTable()
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try {
      // 2024-06-01 20:00 UTC = 2024-06-02 05:00 Tokyo — the row lands
      // in the Tokyo day-2 partition; a UTC-day reader would prune it
      // away from a day-1 UTC range and silently lose it
      def utc(day: Int, h: Int) = java.sql.Timestamp.from(
        java.time.LocalDateTime.of(2024, 6, day, h, 0)
          .toInstant(java.time.ZoneOffset.UTC))
      val rows = Seq((1L, utc(1, 10), "mid"), (2L, utc(1, 20), "late"),
        (3L, utc(2, 10), "next")).toDF("event_id", "ts", "tag")
      ManifestLake.writeTimePartitioned(rows, t, "ts")
      // Tokyo days: 01 10:00Z → 06-01 19:00 local; 01 20:00Z →
      // 06-02 05:00 local (across local midnight); 02 10:00Z →
      // 06-02 19:00 local
      val snap = ManifestLake.snapshot(spark, t)
      snap.entries.flatMap(_.path.split('/').find(_.startsWith("p_day=")))
        .distinct.sorted shouldBe Seq("p_day=2024-06-01",
        "p_day=2024-06-02")
      // closed interval covering all three instants returns all three,
      // whatever local days they landed on
      ManifestLake.readTsRange(spark, t, "ts", utc(1, 0), utc(2, 23))
        .count() shouldBe 3L
      // the narrow range [20:00Z, 20:00Z] hits exactly the
      // across-midnight row — pruned by TOKYO day, read back exactly
      ManifestLake.readTsRange(spark, t, "ts", utc(1, 20), utc(1, 20))
        .collect().map(_.getLong(0)) shouldBe Array(2L)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("recorded generation zone: writes, reads and DML in a different " +
    "session zone raise TimeZoneMismatchException by name; the matching " +
    "zone works; a legacy constraint without the token checks nothing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, date_format}
    val t = freshTable()
    def ts(day: Int, h: Int) = java.sql.Timestamp.from(
      java.time.LocalDateTime.of(2024, 3, day, h, 0)
        .toInstant(java.time.ZoneOffset.UTC))
    val events = (1 to 5).map(day => (day.toLong, ts(day, 12), "e"))
      .toDF("event_id", "ts", "tag")
    // session zone is UTC (GraftSession) — recorded in the constraint
    ManifestLake.writeTimePartitioned(events, t, "ts")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try {
      intercept[ManifestLake.TimeZoneMismatchException] {
        ManifestLake.readTsRange(spark, t, "ts", ts(2, 0), ts(3, 23))
      }.getMessage should include("UTC")
      intercept[ManifestLake.TimeZoneMismatchException] {
        ManifestLake.writeTimePartitioned(
          Seq((9L, ts(6, 1), "late")).toDF("event_id", "ts", "tag"),
          t, "ts", append = true)
      }.getMessage should include("Asia/Tokyo")
      intercept[ManifestLake.TimeZoneMismatchException] {
        ManifestLake.delete(spark, t, col("ts") < ts(2, 0))
      }.getMessage should include("UTC")
      // nothing committed by any refused attempt
      ManifestLake.read(spark, t).count() shouldBe 5L
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    // back in the recorded zone everything works
    ManifestLake.readTsRange(spark, t, "ts", ts(2, 0), ts(3, 23))
      .count() shouldBe 2L
    // zone SPELLINGS that derive identical periods are not mismatches:
    // 'Etc/UTC' normalizes to the recorded 'UTC'
    spark.conf.set("spark.sql.session.timeZone", "Etc/UTC")
    try ManifestLake.readTsRange(spark, t, "ts", ts(2, 0), ts(3, 23))
      .count() shouldBe 2L
    finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    ManifestLake.writeTimePartitioned(
      Seq((9L, ts(6, 1), "late")).toDF("event_id", "ts", "tag"),
      t, "ts", append = true)
    ManifestLake.read(spark, t).count() shouldBe 6L
    // legacy shape (pre-zone constraint, recorded by hand): no token,
    // no check — the old pin-one-zone convention, unchanged
    val legacy = freshTable()
    ManifestLake.write(events.withColumn("p_day",
      date_format(col("ts"), "yyyy-MM-dd")), legacy,
      partitionBy = Seq("p_day"))
    ManifestLake.addConstraint(spark, legacy, "p_day_gen",
      "p_day = date_format(ts, 'yyyy-MM-dd')")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try {
      // a full-span range still answers (pruning may keep extra days;
      // it must never throw on a legacy table)
      ManifestLake.readTsRange(spark, legacy, "ts", ts(1, 0), ts(5, 23))
        .count() shouldBe 5L
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    // UPGRADE path: the claimed zone is validated against the data —
    // this table's 12:00Z rows satisfy the generation under UTC, so
    // recording succeeds in a UTC session and is a metadata-only
    // commit; afterwards a Tokyo session is refused by name
    val vBefore = ManifestLake.currentVersion(spark, legacy).get
    ManifestLake.recordGenerationZone(spark, legacy) shouldBe vBefore + 1
    // idempotent with a matching zone
    ManifestLake.recordGenerationZone(spark, legacy) shouldBe vBefore + 1
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try {
      intercept[ManifestLake.TimeZoneMismatchException] {
        ManifestLake.readTsRange(spark, legacy, "ts", ts(1, 0), ts(5, 23))
      }
      // and a DIFFERENT-zone session cannot re-record either
      intercept[ManifestLake.TimeZoneMismatchException] {
        ManifestLake.recordGenerationZone(spark, legacy)
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    // a WRONG zone claim is refused by the data itself: this table has
    // a 20:00Z row whose Tokyo day differs from its stored UTC p_day,
    // so a Tokyo session's claim violates the generation on that row
    val straddle = freshTable()
    ManifestLake.write(
      Seq((1L, ts(1, 12), "mid"), (2L, ts(1, 20), "late"))
        .toDF("event_id", "ts", "tag")
        .withColumn("p_day", date_format(col("ts"), "yyyy-MM-dd")),
      straddle, partitionBy = Seq("p_day"))
    ManifestLake.addConstraint(spark, straddle, "p_day_gen",
      "p_day = date_format(ts, 'yyyy-MM-dd')")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try {
      intercept[ManifestLake.ConstraintViolationException] {
        ManifestLake.recordGenerationZone(spark, straddle)
      }.getMessage should include("p_day_gen")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("hot-period write sub-splitting: a skewed period parallelizes " +
    "into multiple files from multiple tasks; cold periods still write " +
    "one file each") {
    import spark.implicits._
    val t = freshTable()
    val advKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prevAdv = spark.conf.get(advKey, "64MB")
    // shrink the AQE advisory size so the test-sized hot period is
    // "oversized" the way a skewed ingest day is at production scale
    spark.conf.set(advKey, (64 * 1024).toString)
    try {
      def ts(day: Int, m: Int) = java.sql.Timestamp.from(
        java.time.LocalDateTime.of(2024, 7, day, m / 60, m % 60)
          .toInstant(java.time.ZoneOffset.UTC))
      // one hot day with the overwhelming mass; four cold single-row
      // days (single-row so the file count claim is deterministic
      // whatever reduce partition each day hashes into)
      val hot = (0 until 20000).map(i =>
        (i.toLong, ts(15, i % 1440), "x" * 64))
      val cold = (1 to 4).map(day => (100000L + day, ts(day, 30), "c"))
      ManifestLake.writeTimePartitioned(
        (hot ++ cold).toDF("event_id", "ts", "tag"), t, "ts")
      val byDay = ManifestLake.snapshot(spark, t).entries
        .groupBy(_.path.split('/').find(_.startsWith("p_day=")).get)
      // the hot period wrote from MULTIPLE tasks — the one-task funnel
      // is gone
      byDay("p_day=2024-07-15").size should be > 1
      (1 to 4).foreach { day =>
        byDay(f"p_day=2024-07-0$day").size shouldBe 1
      }
      // correctness and pruning untouched by the split
      ManifestLake.read(spark, t).count() shouldBe 20004L
      ManifestLake.readTsRange(spark, t, "ts", ts(2, 0), ts(3, 1440 - 1))
        .count() shouldBe 2L
    } finally spark.conf.set(advKey, prevAdv)
  }

  test("bucket partitioning: appends land in the same N buckets with " +
    "the generation enforced, and a key lookup reads only its bucket's " +
    "files") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    val first = (0 until 4000).map(i => (i.toLong, s"payload_$i"))
      .toDF("id", "payload")
    ManifestLake.writeBucketPartitioned(first, t, "id", nBuckets = 8)
    val snap = ManifestLake.snapshot(spark, t)
    val buckets = snap.entries.flatMap(_.path.split('/')
      .find(_.startsWith("p_bucket="))).distinct
    buckets.size shouldBe 8
    // an APPEND lands in the same layout — no re-cluster, same 8 dirs
    ManifestLake.writeBucketPartitioned(
      (4000 until 5000).map(i => (i.toLong, s"payload_$i"))
        .toDF("id", "payload"), t, "id", nBuckets = 8, append = true)
    ManifestLake.snapshot(spark, t).entries.flatMap(_.path.split('/')
      .find(_.startsWith("p_bucket="))).distinct.size shouldBe 8
    // a key lookup reads ONLY its bucket — every scanned file is in
    // one partition dir, and the answer is exact across both commits
    val hit = ManifestLake.readKeyEq(spark, t, "id", 4321L)
    hit.collect().map(_.getString(1)) shouldBe Array("payload_4321")
    val dirs = hit.inputFiles.flatMap(_.split('/')
      .find(_.startsWith("p_bucket="))).distinct
    dirs.length shouldBe 1
    // absent key: same single-bucket scan, empty exact answer
    ManifestLake.readKeyEq(spark, t, "id", 999999L).count() shouldBe 0L
    // batch lookup: k keys touch at most min(k, N) buckets' files and
    // answer exactly (absent key contributes nothing)
    val batch = ManifestLake.readKeyIn(spark, t, "id",
      Seq(7L, 4321L, 999999L))
    batch.collect().map(_.getLong(0)).sorted shouldBe Array(7L, 4321L)
    batch.inputFiles.flatMap(_.split('/')
      .find(_.startsWith("p_bucket="))).distinct.length should be <= 3
    // the recorded generation REJECTS a write carrying wrong buckets
    // (-1 is outside pmod's [0, n) range, so it can never be correct)
    val bad = Seq((9001L, "rogue")).toDF("id", "payload")
      .withColumn("p_bucket", org.apache.spark.sql.functions.lit(-1))
    intercept[ManifestLake.ConstraintViolationException] {
      ManifestLake.write(bad, t, partitionBy = Seq("p_bucket"))
    }.getMessage should include("p_bucket_gen")
    // a NULL bucket PASSES the check (SQL CHECK semantics) and lands
    // under the Hive default partition — the pruners must keep that
    // partition conservatively, or this row would silently vanish
    // from keyed reads and survive keyed deletes
    ManifestLake.write(
      Seq((9100L, "ghost")).toDF("id", "payload")
        .withColumn("p_bucket",
          org.apache.spark.sql.functions.lit(null).cast("int")),
      t, partitionBy = Seq("p_bucket"))
    ManifestLake.readKeyEq(spark, t, "id", 9100L)
      .collect().map(_.getString(1)) shouldBe Array("ghost")
    ManifestLake.delete(spark, t, col("id") === 9100L,
      verifyPrune = true)
    ManifestLake.readKeyEq(spark, t, "id", 9100L).count() shouldBe 0L
    // a COERCING probe (string literal against the bigint key) prunes
    // nothing — the comparison runs under DOUBLE coercion, a different
    // value space than the hash's — but stays exactly correct
    ManifestLake.delete(spark, t, col("id") === "2345")
    ManifestLake.readKeyEq(spark, t, "id", 2345L).count() shouldBe 0L
    // appending with CHANGED layout parameters fails fast by name,
    // before any staging
    intercept[IllegalArgumentException] {
      ManifestLake.writeBucketPartitioned(
        Seq((1L, "x")).toDF("id", "payload"), t, "id",
        nBuckets = 16, append = true)
    }.getMessage should include("cannot change")
    // a table without the generation still answers, unpruned
    val plain = freshTable()
    ManifestLake.write(first, plain)
    ManifestLake.readKeyEq(spark, plain, "id", 4321L)
      .count() shouldBe 0L
    ManifestLake.readKeyEq(spark, plain, "id", 321L).count() shouldBe 1L
    // DML derives the SAME bucket pruning: a keyed DELETE touches only
    // the key's bucket — every other bucket's entries carry over
    // VERBATIM (same manifest lines), and verifyPrune double-checks
    // the pruned-out complement holds no match
    val before = ManifestLake.snapshot(spark, t)
    ManifestLake.delete(spark, t, col("id") === 1234L,
      verifyPrune = true)
    val after = ManifestLake.snapshot(spark, t)
    val hitBucket = before.entries.flatMap(e =>
      ManifestLake.partitionValues(e.path).get("p_bucket")).distinct.find { b =>
      // the deleted key's bucket: the one whose entries changed
      val beforeLines = before.entries.filter(e =>
        ManifestLake.partitionValues(e.path).get("p_bucket")
          .contains(b)).map(_.line)
      val afterLines = after.entries.filter(e =>
        ManifestLake.partitionValues(e.path).get("p_bucket")
          .contains(b)).map(_.line)
      beforeLines.toSet != afterLines.toSet
    }
    hitBucket should not be empty
    val untouched = before.entries.filterNot(e =>
      ManifestLake.partitionValues(e.path).get("p_bucket") == hitBucket)
      .map(_.line)
    untouched.toSet.subsetOf(after.entries.map(_.line).toSet) shouldBe true
    ManifestLake.read(spark, t).filter(col("id") === 1234L)
      .count() shouldBe 0L
    // 5000 written, minus the coercion-probe and keyed deletions (the
    // ghost row came and went above)
    ManifestLake.read(spark, t).count() shouldBe 4998L
  }

  test("dim-pruned star join: the dim's keys resolve the fact's buckets " +
    "at the manifest; empty, null-keyed and oversized dims fall back " +
    "safely") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    val fact = (0 until 4000).map(i => (i.toLong, i * 2.0))
      .toDF("id", "amount")
    ManifestLake.writeBucketPartitioned(fact, t, "id", nBuckets = 8)
    val dim = Seq((7L, "seven"), (1234L, "big")).toDF("k", "name")
    val out = ManifestLake.dimPrunedJoin(spark, t, "id", dim, "k")
    out.select($"id", $"amount", $"name").as[(Long, Double, String)]
      .collect().sortBy(_._1) shouldBe
      Array((7L, 14.0, "seven"), (1234L, 2468.0, "big"))
    // the fact scan touched at most the 2 probed keys' buckets
    out.inputFiles.flatMap(_.split('/')
      .find(_.startsWith("p_bucket="))).distinct.length should be <= 2
    // an EMPTY dim never plans a fact scan: the filter(false) fact
    // side collapses to an empty LocalRelation
    ManifestLake.dimPrunedJoin(spark, t, "id",
      dim.filter(col("k") < 0), "k").count() shouldBe 0L
    // NULL dim keys can never equi-match and are dropped from the
    // probe set (a NULL probe would otherwise disable pruning)
    val withNull = Seq((java.lang.Long.valueOf(7L), "seven"),
      (null.asInstanceOf[java.lang.Long], "ghost")).toDF("k", "name")
    val nn = ManifestLake.dimPrunedJoin(spark, t, "id", withNull, "k")
    nn.select($"name").as[String].collect() shouldBe Array("seven")
    nn.inputFiles.flatMap(_.split('/')
      .find(_.startsWith("p_bucket="))).distinct.length shouldBe 1
    // a dim past maxKeys falls back to the unpruned join — warn, not
    // a driver OOM — and stays exact
    ManifestLake.dimPrunedJoin(spark, t, "id", dim, "k", maxKeys = 1)
      .count() shouldBe 2L
  }

  test("maintenance loses races gracefully: a binPack racing a " +
    "committed MERGE re-plans and packs the merge's output; the merge " +
    "never redoes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = freshTable()
    (0 until 6).foreach(b =>
      ManifestLake.write(rows(b * 10 until b * 10 + 10), t,
        statsCol = Some("id")))
    var merged = false
    // deterministic interleave: the merge commits AFTER binPack plans
    // and stages its rewrite, BEFORE its commit attempt — the exact
    // compaction-vs-DML race
    ManifestLake.maintenanceRaceHook.set(() => {
      ManifestLake.merge(Seq((5L, "updated_5")).toDF("id", "payload"),
        t, Seq("id"), statsCol = Some("id"))
      merged = true
    })
    val mergesBefore = ManifestLake.history(spark, t).count()
    val report = ManifestLake.binPack(spark, t,
      smallFileBytes = 1024 * 1024)
    merged shouldBe true
    report.filesAfter should be < report.filesBefore
    // the merge's payload survives the pack — applied exactly once
    val out = ManifestLake.read(spark, t)
    out.count() shouldBe 60L
    out.filter(col("id") === 5L).select("payload")
      .as[String].head() shouldBe "updated_5"
    // two commits landed after the race: the merge's, then the pack's
    ManifestLake.history(spark, t).count() shouldBe mergesBefore + 2
  }

  test("retention delete on a time-partitioned table prunes candidates " +
    "to expired days from the generation — fresh days carried verbatim") {
    import spark.implicits._
    val t = freshTable()
    def ts(day: Int, h: Int) = java.sql.Timestamp.from(
      java.time.LocalDateTime.of(2024, 5, day, h, 0)
        .toInstant(java.time.ZoneOffset.UTC))
    val events = (1 to 8).flatMap(day => (0 until 3).map(h =>
      (day.toLong * 10 + h, ts(day, h * 8), s"e$day-$h")))
      .toDF("event_id", "ts", "tag")
    ManifestLake.writeTimePartitioned(events, t, "ts")
    val before = ManifestLake.snapshot(spark, t)
    // the retention idiom: drop everything before day 3 (TS literal →
    // generation-derived day pruning; verifyPrune double-checks that
    // the pruned-out complement truly holds no match)
    ManifestLake.delete(spark, t,
      org.apache.spark.sql.functions.col("ts") < ts(3, 0),
      verifyPrune = true)
    val after = ManifestLake.snapshot(spark, t)
    // fresh days' entries carried VERBATIM (same manifest lines);
    // expired days gone entirely
    val freshLines = before.entries.filterNot(e =>
      e.path.contains("p_day=2024-05-01") ||
        e.path.contains("p_day=2024-05-02")).map(_.line).toSet
    freshLines.subsetOf(after.entries.map(_.line).toSet) shouldBe true
    after.entries.exists(_.path.contains("p_day=2024-05-01")) shouldBe false
    ManifestLake.read(spark, t).count() shouldBe 18L
    // SQL DML derives the same pruning from its typed literal
    LakeSql.register("ret_del", t)
    spark.sql(
      """DELETE FROM graft_lake.ret_del
        |WHERE ts < TIMESTAMP '2024-05-04 00:00:00'""".stripMargin)
    ManifestLake.read(spark, t).count() shouldBe 15L
  }

  test("auto bin-pack: crossing the small-file threshold triggers a " +
    "maintenance pack after the write; under it (or unset) nothing fires") {
    import spark.implicits._
    val t = freshTable()
    spark.conf.set(ManifestLake.AutoBinPackConf, "4")
    spark.conf.set(ManifestLake.AutoBinPackBytesConf, (100L * 1024).toString)
    try {
      (0 until 3).foreach(i =>
        ManifestLake.write(rows(i * 10 to i * 10 + 9).coalesce(1), t))
      // 3 small files < threshold 4: untouched
      ManifestLake.snapshot(spark, t).entries should have length 3
      val vBefore = ManifestLake.currentVersion(spark, t).get
      ManifestLake.write(rows(30 to 39).coalesce(1), t)
      // the 4th small file crossed the threshold: the write committed,
      // then the pack collapsed the tail in a follow-up MAINTENANCE
      // version (streams skip it)
      val snap = ManifestLake.snapshot(spark, t)
      snap.entries should have length 1
      snap.version shouldBe vBefore + 2
      ManifestLake.changesBetween(spark, t, vBefore + 1, snap.version)
        .map(_.maintenance) shouldBe Seq(true)
      ManifestLake.read(spark, t).count() shouldBe 40L
    } finally {
      spark.conf.unset(ManifestLake.AutoBinPackConf)
      spark.conf.unset(ManifestLake.AutoBinPackBytesConf)
    }
    // conf now unset: small appends accumulate again
    (0 until 2).foreach(i =>
      ManifestLake.write(rows(100 + i * 10 to 100 + i * 10 + 9)
        .coalesce(1), t))
    ManifestLake.snapshot(spark, t).entries should have length 3
  }

  test("$files inventory: one row per manifest entry with recorded " +
    "sizes, counts, stats bounds, and deletion-vector load") {
    import spark.implicits._
    val t = freshTable()
    ManifestLake.writeClustered(rows(1 to 1000), t, "id", nFiles = 4)
    ManifestLake.deleteMor(spark, t,
      org.apache.spark.sql.functions.col("id") <= 10L)
    val inv = ManifestLake.files(spark, t).collect()
    inv should have length 4
    inv.map(_.getAs[Long]("rows")).sum shouldBe 1000L
    inv.map(_.getAs[Long]("dv_rows")).sum shouldBe 10L
    inv.count(_.getAs[Boolean]("has_dv")) shouldBe 1
    all(inv.map(_.getAs[Long]("bytes"))) should be > 0L
    all(inv.map(_.getAs[String]("stats_col"))) shouldBe "id"
    // bounds come back as the recorded numeric range strings
    inv.map(r => (BigDecimal(r.getAs[String]("stats_min")),
      BigDecimal(r.getAs[String]("stats_max"))))
      .map(_._1).min shouldBe BigDecimal(1)
    // and the SQL surface serves the same inventory
    LakeSql.register("files_inv", t)
    spark.sql("SELECT count(*) AS n FROM graft_lake.`files_inv$files`")
      .head().getLong(0) shouldBe 4L
  }
}
