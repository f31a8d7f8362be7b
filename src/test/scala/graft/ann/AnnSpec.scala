package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.Tables

class AnnSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("brute-force top-k: k rows, descending cosine, query excluded") {
    val top = Similarity.bruteForceTopK(Tables.embeddings(spark, sf),
      queryId = 0L, k = 10).collect()
    top should have length 10
    top.map(_.getDouble(1)).sliding(2).foreach {
      case Array(a, b) => a should be >= b
      case _ =>
    }
    top.map(_.getLong(0)) should not contain 0L
    all(top.map(_.getDouble(1))) should (be >= -1.0 and be <= 1.0)
  }

  test("IVF-probed top-k recalls most of the exact top-k at 4/16 probes") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val (assigned, centroids) = Similarity.ivfIndex(emb, nCells = 16)
    val queryVec = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    val approx = Similarity.ivfTopK(
      assigned.filter(col("vec_id") =!= 0L), centroids, queryVec,
      k = 10, nProbe = 4).collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size / 10.0
    recall should be >= 0.7
  }

  test("lake-persisted IVF index: a fresh session probes without " +
    "re-fitting and matches the in-memory index; unprobed cells are " +
    "never read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndexStore.build(spark, sf, dir)
    val emb = Tables.embeddings(spark, sf)
    val queryVec = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    // a FRESH session (new session state over the shared context): the
    // load path is a snapshot read + an nCells×dim centroid collect —
    // structurally no KMeans fit, no assignment pass
    val fresh = spark.newSession()
    val (_, centroidsFromLake) = IvfIndexStore.load(fresh, dir)
    centroidsFromLake should have length 16
    val viaLake = IvfIndexStore.probe(fresh, dir, queryVec, k = 10,
      nProbe = 4, excludeId = Some(0L)).collect()
    // identical ranking to the in-memory index path (same fixed-seed
    // quantizer, same probe metric, same strict-fold cosine)
    val (assigned, centroids) = Similarity.ivfIndex(emb, nCells = 16)
    val viaMemory = Similarity.ivfTopK(
      assigned.filter(col("vec_id") =!= 0L), centroids, queryVec,
      k = 10, nProbe = 4).collect()
    viaLake.map(r => (r.getLong(0), r.getDouble(2))) shouldBe
      viaMemory.map(r => (r.getLong(0), r.getDouble(2)))
    // manifest pruning: the probed frame's input files are a strict
    // subset of the committed index files (unprobed cells never listed)
    val snap = graft.sources.ManifestLake.snapshot(fresh, s"$dir/assignments")
    val probedFiles = IvfIndexStore.probe(fresh, dir, queryVec, 10, 4)
      .inputFiles.length
    probedFiles should be > 0
    probedFiles should be < snap.files.size
    // a rebuild is a new lake version: old snapshot stays readable
    IvfIndexStore.build(spark, sf, dir)
    graft.sources.ManifestLake.read(fresh, s"$dir/assignments",
      Some(snap.version)).count() shouldBe
      graft.sources.ManifestLake.read(fresh, s"$dir/assignments").count()
  }

  test("IVF append: assignCells reproduces the model's assignments, and " +
    "appended vectors are probe-visible without a refit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-ap").toString
    IvfIndexStore.build(spark, sf, dir)
    val emb = Tables.embeddings(spark, sf)

    // assignCells must agree with the ML model's own assignment on
    // every vector (same normalized metric, ties to the lowest cell)
    val (assigned, centroids) = Similarity.ivfIndex(emb, nCells = 16)
    val expected = assigned.select($"vec_id", $"cell".as("cell_model"))
    val recomputed = Similarity.assignCells(emb, centroids)
      .select($"vec_id", $"cell")
    recomputed.join(expected, "vec_id")
      .filter($"cell" =!= $"cell_model").count() shouldBe 0L

    // append a copy of vector 0 under a new id: it lands in 0's cell
    // and the probe for 0's own vector now returns it at cosine 1.0 —
    // no refit, centroids unchanged, assignment version advanced
    val beforeV = graft.sources.ManifestLake
      .currentVersion(spark, s"$dir/assignments").get
    val newVec = emb.filter($"vec_id" === 0L)
      .withColumn("vec_id", lit(900000L))
    val report = IvfIndexStore.append(newVec, dir)
    report.version shouldBe beforeV + 1
    report.committed shouldBe true
    // a copy of an indexed vector is in-distribution by construction
    report.rebuildRecommended shouldBe false
    val queryVec = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    val top = IvfIndexStore.probe(spark, dir, queryVec, k = 1,
      nProbe = 4, excludeId = Some(0L)).collect()
    top.head.getLong(0) shouldBe 900000L
    top.head.getDouble(2) shouldBe 1.0 +- 1e-12
    // the old centroid snapshot still pins the pre-append assignments
    val oldCents = graft.sources.ManifestLake
      .read(spark, s"$dir/centroids", Some(1L))
    oldCents.select(max($"assign_version")).collect()
      .head.getLong(0) shouldBe beforeV
  }

  test("IVF append drift guard: an in-distribution batch passes, a " +
    "shifted batch trips rebuildRecommended; an epoch replay commits " +
    "nothing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-dr").toString
    IvfIndexStore.build(spark, sf, dir)
    val emb = Tables.embeddings(spark, sf)
    val assignments = s"$dir/assignments"

    // in-distribution: a sample of the corpus itself under new ids
    val inDist = emb.filter($"vec_id" % 5 === 0)
      .withColumn("vec_id", $"vec_id" + 200000L)
    val r1 = IvfIndexStore.append(inDist, dir, epoch = Some(("maint", 1L)))
    r1.committed shouldBe true
    r1.rebuildRecommended shouldBe false
    r1.occupancyDivergence should be < 0.5
    r1.batchMeanDist2 should be < 1.5 * r1.buildMeanDist2
    val countAfterR1 = graft.sources.ManifestLake
      .read(spark, assignments).count()

    // replaying the SAME maintenance epoch (crash/retry) is a no-op:
    // writeBatch's guard sees the epoch already on the snapshot
    val r2 = IvfIndexStore.append(inDist, dir, epoch = Some(("maint", 1L)))
    r2.committed shouldBe false
    graft.sources.ManifestLake.read(spark, assignments).count() shouldBe
      countAfterR1

    // a shifted batch (all vectors pushed toward one direction) lands
    // in few cells — occupancy divergence trips the flag even though
    // each vector still HAS a nearest centroid
    val shifted = emb.filter($"vec_id" % 5 === 1)
      .withColumn("vec_id", $"vec_id" + 300000L)
      .withColumn("embedding",
        transform($"embedding", x => x + lit(3.0f)))
    val r3 = IvfIndexStore.append(shifted, dir, epoch = Some(("maint", 2L)))
    r3.committed shouldBe true
    r3.rebuildRecommended shouldBe true
    r3.occupancyDivergence should be > 0.5
  }

  test("IVF append retry heals a half-done two-table commit: a replay " +
    "whose original attempt died between the assignment commit and the " +
    "centroid re-point re-runs the re-point, no duplicates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-hl").toString
    IvfIndexStore.build(spark, sf, dir)
    val emb = Tables.embeddings(spark, sf)
    val assignments = s"$dir/assignments"
    val centroidsT = s"$dir/centroids"
    val beforeV = graft.sources.ManifestLake
      .currentVersion(spark, assignments).get

    val batch = emb.filter($"vec_id" === 0L)
      .withColumn("vec_id", lit(910000L))
    val r1 = IvfIndexStore.append(batch, dir, epoch = Some(("heal", 1L)))
    r1.committed shouldBe true
    val appendedV = r1.version
    val countAfter = graft.sources.ManifestLake.read(spark, assignments)
      .count()

    // simulate the crash: roll the centroid table's recorded
    // assign_version back to the pre-append snapshot, as if the first
    // attempt committed the assignments but died before the re-point —
    // the appended vector is now invisible to probes
    val cents = graft.sources.ManifestLake.read(spark, centroidsT)
    graft.sources.ManifestLake.write(
      cents.withColumn("assign_version", lit(beforeV)),
      centroidsT, append = false)
    val queryVec = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    IvfIndexStore.probe(spark, dir, queryVec, k = 1, nProbe = 4,
      excludeId = Some(0L)).collect().head.getLong(0) should not be 910000L

    // the replayed batch commits nothing new (epoch guard) but HEALS
    // the lagging centroid re-point
    val r2 = IvfIndexStore.append(batch, dir, epoch = Some(("heal", 1L)))
    r2.committed shouldBe false
    graft.sources.ManifestLake.read(spark, assignments).count() shouldBe
      countAfter
    graft.sources.ManifestLake.read(spark, centroidsT)
      .select(max($"assign_version")).collect()
      .head.getLong(0) shouldBe appendedV
    IvfIndexStore.probe(spark, dir, queryVec, k = 1, nProbe = 4,
      excludeId = Some(0L)).collect().head.getLong(0) shouldBe 910000L
  }

  test("IVF reindex: drift recovery re-trains the quantizer from the " +
    "index's own vectors — counts preserved exactly, the drifted region " +
    "becomes probe-reachable, and the guard re-arms on the new baseline") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-ri").toString
    IvfIndexStore.build(spark, sf, dir)
    val emb = Tables.embeddings(spark, sf)
    val assignments = s"$dir/assignments"

    // drift the corpus: a shifted batch lands, trips the guard
    val shifted = emb.filter($"vec_id" % 5 === 1)
      .withColumn("vec_id", $"vec_id" + 300000L)
      .withColumn("embedding",
        transform($"embedding", x => x + lit(3.0f)))
    val r1 = IvfIndexStore.append(shifted, dir, epoch = Some(("ri", 1L)))
    r1.committed shouldBe true
    r1.rebuildRecommended shouldBe true
    val nBefore = graft.sources.ManifestLake.read(spark, assignments).count()
    val (_, centsBefore) = IvfIndexStore.load(spark, dir)

    val v = IvfIndexStore.reindex(spark, dir)
    // every indexed vector survives the rebuild, exactly once — the
    // training input was the index itself, no external feed needed
    val (reAssigned, centsAfter) = IvfIndexStore.load(spark, dir)
    reAssigned.count() shouldBe nBefore
    reAssigned.select("vec_id").distinct().count() shouldBe nBefore
    // the quantizer actually retrained (the drifted mass moved it)
    centsAfter.flatten.toSeq should not equal centsBefore.flatten.toSeq
    // a probe in the drifted region finds its exact vector at cosine 1
    val q = shifted.filter($"vec_id" === 300001L)
      .select($"embedding".cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    val top = IvfIndexStore.probe(spark, dir, q, k = 1, nProbe = 4)
      .collect()
    top.head.getLong(0) shouldBe 300001L
    top.head.getDouble(2) shouldBe 1.0 +- 1e-9
    // the guard re-armed around the REBUILT distribution: copies of
    // indexed vectors under fresh ids are in-distribution again (small
    // batch, so only the distance ratio can trip — and doesn't)
    val inDist = emb.filter($"vec_id" < 50)
      .withColumn("vec_id", $"vec_id" + 400000L)
    val r2 = IvfIndexStore.append(inDist, dir, epoch = Some(("ri", 2L)))
    r2.committed shouldBe true
    r2.rebuildRecommended shouldBe false
    r2.version shouldBe v + 1
  }

  test("hyperplane LSH near-dup: planted perturbed vectors recovered at " +
    "cosine ≥ 0.95") {
    val emb = Tables.embeddings(spark, sf)
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val planted = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding",
        zip_with(col("embedding"),
          sequence(lit(0),
            org.apache.spark.sql.functions.size(col("embedding")) - 1),
          (x, i) => x + (pmod(xxhash64(col("vec_id"), i), lit(1001))
            .cast("double") / 1000.0 - 0.5) * 0.002))
    val pairs = Similarity.hyperplanePairs(emb.unionByName(planted),
      threshold = 0.95).collect()
    val plantedPairs = pairs.filter(r => r.getLong(1) == r.getLong(0) + 100000)
    plantedPairs should have length 5
    all(plantedPairs.map(_.getDouble(2))) should be > 0.99
  }

  test("SemDeDup: planted near-dup pairs resolve to one survivor, the " +
    "survivor is the centroid-closer member, no same-cell kept pair " +
    "remains above the threshold, and a re-run reproduces the verdict") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val planted = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding",
        zip_with(col("embedding"),
          sequence(lit(0),
            org.apache.spark.sql.functions.size(col("embedding")) - 1),
          (x, i) => x + (pmod(xxhash64(col("vec_id"), i), lit(1001))
            .cast("double") / 1000.0 - 0.5) * 0.002))
    val corpus = emb.unionByName(planted)
    val out = Similarity.semanticDedup(corpus, nCells = 8)
    val rows = out.select($"vec_id", $"cell", $"centroid_dist2", $"kept")
      .as[(Long, Int, Double, Boolean)].collect()
    rows.length shouldBe corpus.count()
    val byId = rows.map(r => r._1 -> r).toMap
    // every planted pair that shares a cell resolves to ONE survivor,
    // and the survivor is the closer-to-centroid member (id tiebreak)
    val shared = (0L until 5L).filter(o =>
      byId(o)._2 == byId(o + 100000)._2)
    shared should not be empty
    shared.foreach { o =>
      val (orig, copy) = (byId(o), byId(o + 100000))
      orig._4 should not be copy._4
      val kept = if (orig._4) orig else copy
      val dropped = if (orig._4) copy else orig
      assert(kept._3 < dropped._3 ||
        (kept._3 == dropped._3 && kept._1 < dropped._1))
    }
    // the SemDeDup invariant: no two KEPT docs in one cell at cosine
    // ≥ threshold (any such pair would have had a strict winner)
    val keptDf = out.filter($"kept")
      .select($"cell", $"vec_id", $"embedding")
    val survivors = keptDf.as("x").join(keptDf.as("y"), "cell")
      .filter($"x.vec_id" < $"y.vec_id")
      .withColumn("cos", Similarity.cosine(
        col("x.embedding").cast("array<double>"),
        col("y.embedding").cast("array<double>")))
      .filter($"cos" >= 0.95 && !isnan($"cos"))
    survivors.count() shouldBe 0L
    // same seed, same frame → identical verdicts on a re-run
    val re = Similarity.semanticDedup(corpus, nCells = 8)
      .select($"vec_id", $"kept").as[(Long, Boolean)].collect().toMap
    re shouldBe rows.map(r => r._1 -> r._4).toMap
    // pre-trained centroids skip the fit and reproduce the verdicts
    val (_, cents) = Similarity.ivfIndex(corpus, nCells = 8)
    Similarity.semanticDedup(corpus, nCells = 8,
      centroids = Some(cents))
      .select($"vec_id", $"kept").as[(Long, Boolean)].collect()
      .toMap shouldBe re
  }

  test("native cosine_sim expression is bit-identical to the fold form " +
    "and callable from SQL") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .withColumn("e", col("embedding").cast("array<double>"))
    val q = emb.filter(col("vec_id") === 3L)
      .select(col("e")).collect().head.getSeq[Double](0)
    val qLit = array(q.map(lit): _*)
    val diffs = emb.select(
      (Similarity.cosine(col("e"), qLit) =!=
        Similarity.cosineFold(col("e"), qLit)).as("diff"))
      .filter(col("diff")).count()
    diffs shouldBe 0L
    // SQL registration via GraftExtensions
    emb.createOrReplaceTempView("emb_sql_test")
    spark.sql(
      "SELECT cosine_sim(e, e) AS c FROM emb_sql_test LIMIT 5")
      .as[Double].collect().foreach(_ shouldBe 1.0 +- 1e-12)
  }

  test("native hyperplane sketch is bit-identical to the declarative " +
    "fold form") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val native = Similarity.withSketch(emb, nPlanes = 48)
      .select($"vec_id", $"sketch").as[(Long, Long)].collect().toMap
    val declarative = Similarity.withSketchDeclarative(emb, nPlanes = 48)
      .select($"vec_id", $"sketch").as[(Long, Long)].collect().toMap
    native.size should be > 0
    native shouldBe declarative
  }

  test("dot fold is strict left-to-right (bit-reproducibility contract)") {
    import spark.implicits._
    val df = Seq((Array(1e16, 1.0, -1e16), Array(1.0, 1.0, 1.0)))
      .toDF("a", "b")
    // left-assoc: (1e16 + 1) absorbs the +1, then -1e16 → 0.0 exactly;
    // any re-association would give 1.0
    df.select(Similarity.dotFold(col("a"), col("b"))).as[Double]
      .collect().head shouldBe 0.0
  }
}
