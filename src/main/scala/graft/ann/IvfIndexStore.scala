package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.ManifestLake

/** The IVF index as a LAKE TABLE instead of a session-lifetime memo:
  * the real offline-build contract. [[AnnQueries.ivfIndexFor]]'s
  * memoized frame dies with the JVM — an overnight index build must
  * outlive its session, be shared by every query session, and survive
  * engine restarts. Here the build writes the assignment table
  * (partitioned by `cell`) and the tiny centroid table through
  * [[ManifestLake]], so the index inherits the lake's contracts:
  * atomic publish (a half-written index is never visible), snapshot
  * isolation against concurrent rebuilds, and time travel to the
  * previous index version while a rebuild is racing.
  *
  * Scale shape: a probe calls [[ManifestLake.readPruned]] per probed
  * cell — manifest-level pruning resolves the file list from the
  * manifest STRING LIST, so the (nCells − nProbe) unprobed cells cost
  * no directory listing and no footer reads. At 16 cells / probe 4,
  * a query touches ~1/4 of the index files; the Spark-level partition
  * filter inside [[Similarity.ivfTopK]] would prune the same rows but
  * only AFTER listing every file — at 100 TB the listing itself is
  * the latency.
  *
  * ==Drift monitoring==
  * [[append]] assigns to FROZEN centroids, which is correct for a
  * stationary corpus and silently recall-decaying under distribution
  * shift — so every append measures its batch against the build's
  * recorded distribution (mean squared assignment distance + per-cell
  * occupancy, both stored in the centroid table) and returns an
  * [[AppendReport]] whose `rebuildRecommended` flag trips when the
  * batch sits far from every centroid (distance ratio) or collapses
  * into cells the build spread load across (occupancy divergence).
  * The flag recommends scheduling a [[build]] rebuild; it never blocks
  * the append — the vectors are still probe-visible either way. */
object IvfIndexStore {

  private def assignTable(indexDir: String) = s"$indexDir/assignments"
  private def centroidTable(indexDir: String) = s"$indexDir/centroids"
  private def pqTable(indexDir: String) = s"$indexDir/pq"

  /** What one [[append]] did and observed. `committed = false` means
    * the epoch guard recognized a replay and wrote nothing (the stats
    * still describe the batch). Drift fields compare the batch to the
    * build: `batchMeanDist2 / buildMeanDist2 > distFactor` or
    * `occupancyDivergence > occupancyThreshold` ⇒ `rebuildRecommended`. */
  final case class AppendReport(version: Long, committed: Boolean,
                                batchMeanDist2: Double,
                                buildMeanDist2: Double,
                                occupancyDivergence: Double,
                                rebuildRecommended: Boolean)

  /** Offline build job: fit + assign once, publish both index tables.
    * Commit ORDER is the atomicity story for the two-table index: the
    * assignment table commits FIRST, then the centroid table commits
    * carrying that assignment version in `assign_version` — readers
    * always enter through the centroids and pin the assignment snapshot
    * they name. A crash between the two commits leaves the old centroid
    * snapshot pointing at the old (still-retained) assignment version:
    * consistent, just not yet rebuilt. A rebuild is therefore one
    * atomic switch at the centroid commit; old-index readers keep their
    * pinned snapshot. Returns the committed assignment version.
    *
    * Alongside the centroids, the build records its distribution
    * baseline for [[append]]'s drift guard: per-cell occupancy (counted
    * from the just-written assignment table — a cell-column-only scan)
    * and the mean squared assignment distance of a bounded
    * deterministic sample (one small job; never a second full pass). */
  def build(s: SparkSession, d: String, indexDir: String,
            nCells: Int = 16): Long =
    publishIndex(Tables.embeddings(s, d), indexDir, nCells)

  /** DRIFT RECOVERY — the path [[AppendReport.rebuildRecommended]]
    * points at, closing the monitoring loop: re-train the quantizer
    * from the CURRENT corpus and republish both index tables as new
    * lake versions. The training input is the assignment table ITSELF
    * (cell column dropped) — the original build feed may be long gone,
    * but every indexed vector is by construction in the index; a
    * reindex therefore needs no external input and reflects every
    * append that drifted the distribution in the first place. The
    * atomic switch is [[build]]'s: the rebuilt assignments commit
    * first, then the centroid table re-points — a probe racing the
    * reindex either keeps the old (still-retained) snapshot pair or
    * sees the full rebuilt pair, never a mixed quantizer. The recorded
    * drift baseline resets to the rebuilt distribution, re-arming
    * [[append]]'s guard. An append racing the reindex is refused by
    * name on the append side ([[ConcurrentReindexException]]) before
    * it can land stale cells or clobber the rebuilt centroids.
    *
    * Trains on the assignment table's HEAD, not the centroid-pinned
    * snapshot: a crashed append may have committed assignments the
    * centroid table does not point at yet (the half-done state the
    * append replay heals) — those vectors are committed corpus and
    * must survive the rebuild, so the rebuild must see them. */
  def reindex(s: SparkSession, indexDir: String, nCells: Int = 16): Long =
    publishIndex(
      ManifestLake.read(s, assignTable(indexDir)).drop("cell", "pq_code"),
      indexDir, nCells)

  /** The shared fit-assign-publish pass behind [[build]] (external
    * vectors) and [[reindex]] (the index's own vectors).
    *
    * The assignment table carries a PRODUCT-QUANTIZED code column
    * alongside each vector ([[ProductQuantizer.encode]], one extra
    * codegen'd projection in the same staging pass) and the codebook
    * publishes as a third tiny lake table, version-pinned from the
    * centroid row (`pq_version`) exactly like the assignments — so
    * [[probePq]]'s candidate scan can read `(vec_id, pq_code)` ONLY:
    * manifest pruning skips the unprobed cells' files, and parquet
    * column pruning skips the embedding column of the probed ones.
    * Commit order extends the two-table atomic switch: assignments,
    * then codebook, then the centroid re-point naming both versions —
    * a reader entering through the centroids can never pair a new
    * quantizer with old codes or vice versa. */
  private def publishIndex(vectors: DataFrame, indexDir: String,
                           nCells: Int): Long = {
    val s = vectors.sparkSession
    val (assignedRaw, centroids) = Similarity.ivfIndex(vectors, nCells)
    // subspace count adapts to the dimension (largest power-of-two
    // divisor ≤ 16) so synthetic/odd dims still index
    val dim = centroids.head.length
    val m = Seq(16, 8, 4, 2, 1).find(dim % _ == 0).get
    val pq = ProductQuantizer.train(vectors, m = m)
    val assigned = ProductQuantizer.encode(assignedRaw, pq)
    val v = ManifestLake.write(assigned, assignTable(indexDir),
      append = false, partitionBy = Seq("cell"))
    val pqV = commitPqBooks(s, indexDir, pq)
    // occupancy from the written table: column-pruned cell-only read
    val counts = ManifestLake.read(s, assignTable(indexDir), Some(v))
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = math.max(1L, counts.values.sum)
    val shares = Array.tabulate(nCells)(i =>
      counts.getOrElse(i, 0L).toDouble / total)
    // mean dist² over a bounded sample (same budget as the fit sample)
    val n = math.max(vectors.count(), 1L)
    val fraction = math.min(1.0, 4096.0 * 1.2 / n)
    val meanDist2 = Similarity.assignCellsScored(
        vectors.sample(withReplacement = false, fraction, 11L), centroids)
      .agg(avg("assign_dist2")).collect().head.getDouble(0)
    commitCentroids(s, indexDir, centroids, v, pqV, shares, meanDist2)
    v
  }

  /** Publish the PQ codebook as its own tiny lake table (m·ksub rows of
    * dsub-dim codewords) and return the committed version — readers pin
    * it via the centroid row's `pq_version`, never by HEAD. */
  private def commitPqBooks(s: SparkSession, indexDir: String,
                            pq: ProductQuantizer.PqModel): Long = {
    import s.implicits._
    val rows = for {
      sub <- 0 until pq.m
      j <- 0 until pq.ksub
    } yield (sub, j, pq.codewords(sub)(j).toSeq)
    ManifestLake.write(rows.toDF("sub", "j", "codeword"),
      pqTable(indexDir), append = false)
  }

  /** Load the codebook at the version the centroid snapshot names. */
  private def loadPqBooks(s: SparkSession, indexDir: String,
                          version: Long): ProductQuantizer.PqModel = {
    val rows = ManifestLake.read(s, pqTable(indexDir), Some(version))
      .collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val ksub = rows.map(_._2).max + 1
    val books = Array.ofDim[Array[Double]](m, ksub)
    rows.foreach { case (sub, j, cw) => books(sub)(j) = cw }
    ProductQuantizer.PqModel(m, ksub, rows.head._3.length,
      books.map(_.toArray))
  }

  /** The centroid-table commit both [[build]] and [[append]] end with —
    * ONE copy of the schema and of the commit-order invariant (this runs
    * AFTER the assignment commit, carrying its version, so readers
    * atomically switch to a consistent (centroids, assignments) pair).
    * `build_share`/`build_mean_dist2` are the build-time distribution
    * baseline appends drift-check against; appends carry them forward
    * unchanged (the baseline is the BUILD's, by definition). */
  private def commitCentroids(s: SparkSession, indexDir: String,
                              centroids: Array[Array[Double]],
                              assignVersion: Long, pqVersion: Long,
                              buildShares: Array[Double],
                              buildMeanDist2: Double): Unit = {
    import s.implicits._
    val centDf = centroids.zipWithIndex.toSeq
      .map { case (c, i) =>
        (i, c.toSeq, assignVersion, pqVersion, buildShares(i),
          buildMeanDist2) }
      .toDF("cell", "centroid", "assign_version", "pq_version",
        "build_share", "build_mean_dist2")
    ManifestLake.write(centDf, centroidTable(indexDir), append = false): Unit
  }

  /** Index MAINTENANCE: assign `newVectors` to the EXISTING centroids
    * (no refit — [[Similarity.assignCells]], the same normalized metric
    * the build used) and append them to the assignment table per cell.
    * The commit order mirrors [[build]]'s atomic-switch story: the
    * assignment append commits first, then the centroid table re-commits
    * UNCHANGED centroids carrying the new `assign_version` — a reader
    * either still enters through the old centroid snapshot (pinning the
    * pre-append assignments, consistent) or through the new one (seeing
    * every appended vector). Probes never pay a refit; the quantizer
    * only changes on a full [[build]] rebuild.
    *
    * `epoch = Some((appId, batchId))` makes the append REPLAY-SAFE: the
    * commit goes through [[ManifestLake.writeBatch]]'s epoch guard, so
    * a crashed-and-retried maintenance batch commits nothing twice
    * (`committed = false` in the report). Without an epoch the append
    * is NOT idempotent — a bare retry duplicates the batch.
    *
    * Every append also measures drift against the build's recorded
    * distribution (see class doc) and reports `rebuildRecommended`. */
  def append(newVectors: DataFrame, indexDir: String,
             epoch: Option[(String, Long)] = None,
             distFactor: Double = 1.5,
             occupancyThreshold: Double = 0.5,
             minOccupancyRows: Long = 64L): AppendReport = {
    val s = newVectors.sparkSession
    val st = loadCentroidStats(s, indexDir)
    val (centroids, recordedAssignV, buildShares, buildMeanDist2) =
      (st.centroids, st.assignVersion, st.shares, st.meanDist2)
    // encode under the CURRENT codebook — the guard below refuses the
    // commit if a concurrent reindex replaced it (new books commit
    // before the centroid re-point, so centroid equality covers both)
    val pq = loadPqBooks(s, indexDir, st.pqVersion)
    // the scored assignment feeds the stats agg AND the lake write;
    // persist so the 16-way score fan-out runs once per batch
    val scored = Similarity.assignCellsScored(newVectors, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cellStats = scored.groupBy("cell")
        .agg(count(lit(1)).as("n"), sum("assign_dist2").as("d2"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      val batchN = math.max(1L, cellStats.values.map(_._1).sum)
      val batchMeanDist2 = cellStats.values.map(_._2).sum / batchN
      // total-variation distance between the batch's cell occupancy and
      // the build's: 0 = identical spread, 1 = disjoint. Catches the
      // "new data collapses into two cells" failure mode long before
      // mean distance moves.
      val divergence = buildShares.indices.map { i =>
        val batchShare = cellStats.get(i).fold(0.0)(_._1.toDouble / batchN)
        math.abs(batchShare - buildShares(i))
      }.sum / 2.0
      val assigned = ProductQuantizer.encode(
        scored.drop("assign_dist2"), pq)
      // QUANTIZER GUARD, pre-commit: a [[reindex]] that finished while
      // this batch was being assigned replaced the centroids — landing
      // rows assigned under the OLD quantizer into the NEW assignment
      // table would silently mis-cell them (the lake's append rebase
      // cannot know the cells are stale). Re-read the centroid table at
      // the last responsible moment and refuse by name; the caller just
      // re-runs append, which re-assigns under the new centroids. A
      // reindex landing inside the residual commit window is caught by
      // the post-commit check below.
      requireQuantizerUnchanged(s, indexDir, centroids, "before committing")
      val committed = epoch match {
        case Some((appId, batchId)) =>
          ManifestLake.writeBatch(assigned, assignTable(indexDir), batchId,
            partitionBy = Seq("cell"), appId = appId)
        case None =>
          ManifestLake.write(assigned, assignTable(indexDir),
            append = true, partitionBy = Seq("cell"))
          true
      }
      val v = ManifestLake.currentVersion(s, assignTable(indexDir)).get
      // QUANTIZER GUARD, post-commit: if a reindex won the residual
      // window, do NOT re-point the centroid table (that would clobber
      // the rebuilt quantizer with the stale one) — surface the name
      // instead so the operator re-runs reindex (which re-trains over
      // every committed row, healing this batch's stale cells too).
      requireQuantizerUnchanged(s, indexDir, centroids,
        "after committing its assignments; re-run reindex to re-cell " +
          "the batch, then")
      // committed = false can mean two things: a clean replay of a batch
      // whose ORIGINAL attempt finished both commits (nothing to do), or
      // a retry of an attempt that crashed BETWEEN the assignment commit
      // and the centroid re-point — then the assignment table is ahead
      // of the centroid table's recorded assign_version and the appended
      // vectors are invisible to probes. The retry heals that half-done
      // two-table commit by re-running the centroid commit whenever the
      // recorded version lags, which is idempotent (same centroids, same
      // baseline, just the new assign_version).
      if (committed || v > recordedAssignV)
        commitCentroids(s, indexDir, centroids, v, st.pqVersion,
          buildShares, buildMeanDist2)
      // occupancy of a tiny batch is sampling noise (one vector is 100%
      // of one cell) — the divergence is still REPORTED but only trips
      // the flag once the batch is big enough to estimate a spread
      AppendReport(v, committed, batchMeanDist2, buildMeanDist2, divergence,
        rebuildRecommended =
          batchMeanDist2 > distFactor * buildMeanDist2 ||
            (batchN >= minOccupancyRows && divergence > occupancyThreshold))
    } finally { scored.unpersist(); () }
  }

  /** Raised when [[append]] detects that a concurrent [[reindex]]
    * replaced the quantizer while the batch was in flight — the batch's
    * cell assignments are (or would be) stale. Named so the operator's
    * remedy is in the message, not in a debugging session. */
  final class ConcurrentReindexException(msg: String)
    extends IllegalStateException(msg)

  private def requireQuantizerUnchanged(s: SparkSession, indexDir: String,
      loaded: Array[Array[Double]], when: String): Unit = {
    val current = loadCentroidStats(s, indexDir).centroids
    val same = current.length == loaded.length &&
      current.indices.forall(i =>
        java.util.Arrays.equals(current(i), loaded(i)))
    if (!same) throw new ConcurrentReindexException(
      s"a concurrent reindex of $indexDir replaced the quantizer $when " +
        "this append could finish — its cell assignments were computed " +
        "against the old centroids. Re-run the append (it will re-assign " +
        "under the current quantizer).")
  }

  /** Centroids + the assignment version they were fit against — the
    * nCells × dim collect every reader starts from. */
  private def loadCentroids(s: SparkSession, indexDir: String)
      : (Array[Array[Double]], Long) = {
    val st = loadCentroidStats(s, indexDir)
    (st.centroids, st.assignVersion)
  }

  /** Everything the centroid snapshot pins: the quantizer, the
    * assignment and codebook versions it names, and the build-time
    * distribution baseline. */
  private final case class CentroidState(centroids: Array[Array[Double]],
                                         assignVersion: Long,
                                         pqVersion: Long,
                                         shares: Array[Double],
                                         meanDist2: Double)

  private def loadCentroidStats(s: SparkSession,
                                indexDir: String): CentroidState = {
    val rows = ManifestLake.read(s, centroidTable(indexDir))
      .select(col("cell"), col("centroid"), col("assign_version"),
        col("pq_version"), col("build_share"), col("build_mean_dist2"))
      .collect().sortBy(_.getInt(0))
    CentroidState(rows.map(_.getSeq[Double](1).toArray),
      rows.head.getLong(2), rows.head.getLong(3),
      rows.map(_.getDouble(4)), rows.head.getDouble(5))
  }

  /** Load the index from the lake — NO fitting, no assignment pass:
    * the centroid collect is nCells × dim doubles and the assignment
    * frame is a lazy snapshot read PINNED to the version the centroids
    * name, so a racing rebuild can never hand back new centroids over
    * old cells (or vice versa). */
  def load(s: SparkSession,
           indexDir: String): (DataFrame, Array[Array[Double]]) = {
    val (centroids, v) = loadCentroids(s, indexDir)
    (ManifestLake.read(s, assignTable(indexDir), Some(v)), centroids)
  }

  /** Probe the lake-resident index: rank cells driver-side against the
    * loaded centroids, then read ONLY the probed cells' files via
    * manifest pruning and rank exact cosine inside them. Semantically
    * identical to [[Similarity.ivfTopK]] over the full assignment
    * frame (same cell ranking, same in-cell rerank); the difference is
    * what never gets read. */
  def probe(s: SparkSession, indexDir: String, queryVec: Array[Double],
            k: Int, nProbe: Int, excludeId: Option[Long] = None): DataFrame = {
    // centroids ONLY — never resolve the full assignment frame here (its
    // construction stats every index file, the exact metadata cost the
    // pruned probe exists to avoid); all probed cells pin the SAME
    // assignment version, so a racing rebuild cannot split the probe
    // across two snapshots
    val (centroids, version) = loadCentroids(s, indexDir)
    val probeCells = Similarity.rankCells(centroids, queryVec, nProbe)
    val probed = ManifestLake.readPrunedIn(s, assignTable(indexDir),
      "cell", probeCells.map(_.toString).toSet, Some(version))
    val base = excludeId.fold(probed)(id => probed.filter(col("vec_id") =!= id))
    // the in-cell rerank is exactly the in-memory probe's (its own cell
    // filter is a no-op on the already-pruned frame)
    Similarity.ivfTopK(base, centroids, queryVec, k, nProbe)
  }

  /** The IVF-PQ probe — BOTH pruning dimensions at once, the canonical
    * billion-vector read path: manifest pruning keeps only the probed
    * cells' FILES, and the candidate pass selects `(vec_id, pq_code)`
    * so parquet column pruning never materializes the embedding column
    * there — per candidate row the scan pays m small ints instead of
    * the full vector (≈16× narrower at the 64-dim demo shape, ≈64× at
    * a 1536-dim production embedding). ADC scores rank a `rerank`-size
    * candidate pool, and only those rows' embeddings are read back
    * (broadcast semi-join inside the same probed cells) for the exact
    * cosine top-k — [[probe]]'s answer quality at a fraction of its
    * candidate-scan IO. All three tables pin to the versions the ONE
    * centroid read names, so a racing rebuild can never mix quantizer,
    * codes and vectors across snapshots. */
  def probePq(s: SparkSession, indexDir: String, queryVec: Array[Double],
              k: Int, nProbe: Int, rerank: Int,
              excludeId: Option[Long] = None): DataFrame = {
    val st = loadCentroidStats(s, indexDir)
    val pq = loadPqBooks(s, indexDir, st.pqVersion)
    val probeCells = Similarity.rankCells(st.centroids, queryVec, nProbe)
    val probed = ManifestLake.readPrunedIn(s, assignTable(indexDir),
      "cell", probeCells.map(_.toString).toSet, Some(st.assignVersion))
    val base = excludeId.fold(probed)(id =>
      probed.filter(col("vec_id") =!= id))
    ProductQuantizer.adcTopK(base, base, pq, queryVec, k, rerank)
  }
}
