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
  * the latency. */
object IvfIndexStore {

  private def assignTable(indexDir: String) = s"$indexDir/assignments"
  private def centroidTable(indexDir: String) = s"$indexDir/centroids"

  /** Offline build job: fit + assign once, publish both index tables.
    * Commit ORDER is the atomicity story for the two-table index: the
    * assignment table commits FIRST, then the centroid table commits
    * carrying that assignment version in `assign_version` — readers
    * always enter through the centroids and pin the assignment snapshot
    * they name. A crash between the two commits leaves the old centroid
    * snapshot pointing at the old (still-retained) assignment version:
    * consistent, just not yet rebuilt. A rebuild is therefore one
    * atomic switch at the centroid commit; old-index readers keep their
    * pinned snapshot. Returns the committed assignment version. */
  def build(s: SparkSession, d: String, indexDir: String,
            nCells: Int = 16): Long = {
    import s.implicits._
    val (assigned, centroids) =
      Similarity.ivfIndex(Tables.embeddings(s, d), nCells)
    val v = ManifestLake.write(assigned, assignTable(indexDir),
      append = false, partitionBy = Seq("cell"))
    commitCentroids(s, indexDir, centroids, v)
    v
  }

  /** The centroid-table commit both [[build]] and [[append]] end with —
    * ONE copy of the schema and of the commit-order invariant (this runs
    * AFTER the assignment commit, carrying its version, so readers
    * atomically switch to a consistent (centroids, assignments) pair). */
  private def commitCentroids(s: SparkSession, indexDir: String,
                              centroids: Array[Array[Double]],
                              assignVersion: Long): Unit = {
    import s.implicits._
    val centDf = centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq, assignVersion) }
      .toDF("cell", "centroid", "assign_version")
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
    * only changes on a full [[build]] rebuild (worth scheduling when
    * drift makes cells unbalanced). Returns the new assignment version. */
  def append(newVectors: DataFrame, indexDir: String): Long = {
    val s = newVectors.sparkSession
    val (centroids, _) = loadCentroids(s, indexDir)
    val assigned = Similarity.assignCells(newVectors, centroids)
    val v = ManifestLake.write(assigned, assignTable(indexDir),
      append = true, partitionBy = Seq("cell"))
    commitCentroids(s, indexDir, centroids, v)
    v
  }

  /** Centroids + the assignment version they were fit against — the
    * nCells × dim collect every reader starts from. */
  private def loadCentroids(s: SparkSession, indexDir: String)
      : (Array[Array[Double]], Long) = {
    val rows = ManifestLake.read(s, centroidTable(indexDir))
      .select(col("cell"), col("centroid"), col("assign_version"))
      .collect()
    (rows.sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray),
      rows.head.getLong(2))
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
}
