package graft.ann

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Three tiers, by scale:
  *   - [[bruteForceTopK]] — exact cosine top-k via a single scan +
  *     TakeOrdered. The correctness baseline; O(N·d) per query. The
  *     arithmetic is a strict left-to-right fold in element order, so the
  *     result is bit-reproducible (and DuckDB-oracle-checkable).
  *   - [[ivfTopK]] — inverted-file search: K-Means coarse quantizer
  *     assigns each vector to a cell; queries probe only the `nProbe`
  *     nearest cells. Cuts the scan by ~nCells/nProbe at the cost of
  *     recall; the cell assignment is a one-off batch job and the probe
  *     filter pushes down to the cell column.
  *   - [[hyperplanePairs]] — sign-sketch LSH for all-pairs near-dup
  *     mining: deterministic pseudo-random hyperplanes → bit sketch →
  *     banded bucket join → exact cosine verify. Bucketed, never N².
  */
object Similarity {

  /** Strict sequential-fold dot product over double arrays — the
    * evaluation order is part of the contract (bit-reproducibility). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0),
      (acc: Column, x: Column) => acc + x)

  def norm2Fold(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0.0),
      (acc: Column, x: Column) => acc + x)

  /** Cosine similarity between two double-array columns — the native
    * codegen'd expression ([[graft.functions.CosineSimilarity]]); bit-
    * identical to the fold form `dotFold(a,b)/(√norm2·√norm2)` (both are
    * strict left-to-right IEEE accumulation; pinned in AnnSpec). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Fold-based cosine (interpreted) — kept as the reference semantics
    * the native expression must match. */
  def cosineFold(a: Column, b: Column): Column =
    dotFold(a, b) / (sqrt(norm2Fold(a)) * sqrt(norm2Fold(b)))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k nearest by cosine to the vector of `queryId`, excluding
    * the query row. Single scan; `orderBy.limit` plans TakeOrdered (a
    * per-partition k-heap + driver merge, never a global sort). */
  def bruteForceTopK(embeddings: DataFrame, queryId: Long, k: Int,
                     idCol: String = "vec_id",
                     embCol: String = "embedding"): DataFrame =
    rankAgainstQuery(embeddings, embeddings, queryId, k, idCol, embCol)

  /** The shared exact-rank pipeline: look the query row up in
    * `querySource`, rank `candidates` against it. ONE copy of the
    * query-exclusion, NaN-cosine guard, and tie-break contract — the
    * filtered and unfiltered searches must never drift apart on these. */
  private def rankAgainstQuery(candidates: DataFrame, querySource: DataFrame,
                               queryId: Long, k: Int,
                               idCol: String, embCol: String): DataFrame = {
    val query = querySource.filter(col(idCol) === queryId)
      .select(asDouble(col(embCol)).as("q"))
    candidates.crossJoin(broadcast(query))
      .filter(col(idCol) =!= queryId)
      .withColumn("cosine", cosine(asDouble(col(embCol)), col("q")))
      // zero-norm vectors have undefined (NaN) cosine, and Spark's desc
      // ordering puts NaN ABOVE every real value — they must never rank
      .filter(!isnan(col("cosine")))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .select(col(idCol), col("cosine"))
      .limit(k)
  }

  /** [[bruteForceTopK]] with a metadata predicate on the CANDIDATE set
    * (the query row is looked up unfiltered — its own metadata is
    * irrelevant to what it may match). This is pre-filtered search: the
    * predicate reaches the scan as a pushed filter, so the ranked set is
    * O(selectivity) rows and k is always filled from qualifying rows —
    * unlike post-filtering an ANN probe, which silently under-fills k
    * when the predicate is selective. At IVF scale the same predicate
    * composes with cell pruning (filter ∧ cell ∈ probed). */
  def filteredTopK(embeddings: DataFrame, queryId: Long, k: Int,
                   predicate: Column,
                   idCol: String = "vec_id",
                   embCol: String = "embedding"): DataFrame =
    rankAgainstQuery(embeddings.filter(predicate), embeddings, queryId, k,
      idCol, embCol)

  /** IVF index: assign every vector to its nearest of `nCells` K-Means
    * centroids. Returns (assignments with a `cell` column, fitted
    * centroids).
    *
    * The coarse quantizer is fit on a bounded random sample
    * (~`fitSampleRows`, fixed seed): centroid placement needs a
    * representative sample, not the full table, and an iterative
    * full-table fit is a scale-killer — default K-Means is ~20 iterations
    * × kmeans|| init, each a full scan; at 100 TB that is petabytes of
    * reads to place 16 centroids. With the sample fit, the full table is
    * touched exactly once, by the assignment pass, and the index is just
    * an extra int column — re-clusterable offline, partitionable by cell.
    */
  def ivfIndex(embeddings: DataFrame, nCells: Int, seed: Long = 7L,
               embCol: String = "embedding",
               fitSampleRows: Int = 4096): (DataFrame, Array[Array[Double]]) = {
    // L2-normalize before clustering (spherical K-Means): the index
    // serves COSINE queries, and on unit vectors Euclidean assignment
    // and cosine agree (‖a−b‖² = 2 − 2·cosθ). Clustering the raw
    // vectors would assign by a metric the probe doesn't rank by, and a
    // cosine-near neighbor could land in a never-probed cell.
    val normalizer = new org.apache.spark.ml.feature.Normalizer()
      .setInputCol("__raw_features").setOutputCol("features").setP(2.0)
    val featured = normalizer.transform(
        embeddings.withColumn("__raw_features",
          array_to_vector(asDouble(col(embCol)))))
      .drop("__raw_features")
    // count() over parquet is answered from footer metadata — no data read.
    val n = math.max(embeddings.count(), 1L)
    val fraction = math.min(1.0, fitSampleRows.toDouble * 1.2 / n)
    // NOTE on determinism: the fit is deterministic for a fixed seed,
    // input, and PARTITION LAYOUT — k-means|| draws per partition, so
    // re-clustering a differently-partitioned copy of the corpus may
    // place centroids differently (and move probe/keep verdicts).
    // Inherent to sampled distributed clustering; verdicts that must be
    // layout-stable should run against a PERSISTED index
    // ([[IvfIndexStore]]) rather than refit per job.
    val fitSample = featured.select("features")
      .sample(withReplacement = false, fraction, seed)
    // the sample is bounded, so a quality fit is cheap: k-means|| init +
    // full iteration budget cost scales with the SAMPLE, not the table
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setMaxIter(30)
      .fit(fitSample)
    val assigned = model.transform(featured)
      .withColumnRenamed("prediction", "cell").drop("features")
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** Assign vectors to the nearest of EXISTING centroids — the index
    * MAINTENANCE half of IVF: appending a day's new embeddings must not
    * refit the quantizer (that is a rebuild). Assignment metric is
    * exactly the build's: Euclidean of the L2-NORMALIZED vector to the
    * raw centroid, decomposed as argmax(c·v̂ − ‖c‖²/2) so the per-cell
    * constant folds driver-side. Shape: broadcast the nCells-row
    * centroid table, score narrowly, keep the argmax row per vector via
    * max_by — ONE shuffle on the vector id per append batch. Ties break
    * to the lowest cell, matching Spark ML's argmin scan order. */
  def assignCells(embeddings: DataFrame, centroids: Array[Array[Double]],
                  embCol: String = "embedding"): DataFrame =
    assignCellsScored(embeddings, centroids, embCol).drop("assign_dist2")

  /** [[assignCells]] plus `assign_dist2`, the squared Euclidean distance
    * of the NORMALIZED vector to its chosen centroid — recovered for
    * free from the winning score (‖v̂ − c‖² = 1 − 2·(c·v̂ − ‖c‖²/2)).
    * This is the drift statistic index maintenance monitors: a batch
    * whose vectors sit far from every centroid is a batch the frozen
    * quantizer describes poorly ([[IvfIndexStore.append]]). */
  def assignCellsScored(embeddings: DataFrame, centroids: Array[Array[Double]],
                        embCol: String = "embedding"): DataFrame = {
    val s = embeddings.sparkSession
    import s.implicits._
    val cols = embeddings.columns.toSeq
    val cent = centroids.zipWithIndex.map { case (c, i) =>
      (i, c.toSeq, c.map(x => x * x).sum)
    }.toSeq.toDF("__cell", "__c", "__c2")
    val nv = {
      val v = asDouble(col(embCol))
      val n = sqrt(norm2Fold(v))
      // zero vectors stay zero (cosine-undefined anyway; cell 0 by tie)
      when(n === 0.0, v).otherwise(transform(v, x => x / n))
    }
    // grouping on the FULL original row makes max_by partial-aggregate
    // map-side: the 16× score blowup collapses back to one row per
    // vector before anything crosses the shuffle. (Exact duplicate rows
    // would merge — an id-carrying index never has any.)
    embeddings.withColumn("__nv", nv)
      .crossJoin(broadcast(cent))
      .withColumn("__score", dotFold(col("__nv"), col("__c")) -
        col("__c2") / 2.0)
      .groupBy(cols.map(col): _*)
      .agg(expr("max_by(__cell, struct(__score, -__cell))").as("cell"),
        (lit(1.0) - lit(2.0) * max(col("__score"))).as("assign_dist2"))
  }

  /** The query's `nProbe` nearest cells, ranked by Euclidean distance
    * of the NORMALIZED query to each centroid — the same metric the
    * (normalized) assignment used, so probe order and cell membership
    * agree. THE one definition of cell ranking: the in-memory probe
    * ([[ivfTopK]]) and the lake probe ([[IvfIndexStore.probe]]) must
    * never rank cells differently. */
  def rankCells(centroids: Array[Array[Double]], queryVec: Array[Double],
                nProbe: Int): Array[Int] = {
    val qNorm = {
      val n = math.sqrt(queryVec.map(x => x * x).sum)
      if (n == 0.0) queryVec else queryVec.map(_ / n)
    }
    def euclid2(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
      d
    }
    centroids.zipWithIndex
      .sortBy { case (c, _) => euclid2(c, qNorm) }
      .take(nProbe).map(_._2)
  }

  /** IVF probe: compute the query's `nProbe` nearest cells driver-side
    * (centroid table is tiny, [[rankCells]]), then brute-force ONLY
    * those cells. The cell filter prunes ~ (1 - nProbe/nCells) of the
    * scan. The exact re-rank inside the probed cells stays cosine
    * (scale-invariant). */
  def ivfTopK(assigned: DataFrame, centroids: Array[Array[Double]],
              queryVec: Array[Double], k: Int, nProbe: Int,
              idCol: String = "vec_id",
              embCol: String = "embedding"): DataFrame = {
    val probeCells = rankCells(centroids, queryVec, nProbe)
    val q = array(queryVec.map(lit).toIndexedSeq: _*)
    assigned
      .filter(col("cell").isInCollection(probeCells))
      .withColumn("cosine", cosine(asDouble(col(embCol)), q))
      .filter(!isnan(col("cosine"))) // zero-norm vectors never rank
      .orderBy(col("cosine").desc, col(idCol).asc)
      .select(col(idCol), col("cell"), col("cosine"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64-derived
    * components in [-1, 1]) — reproducible across executors and runs by
    * construction. Components come from the single shared formula in
    * [[graft.functions.HyperplaneSketch.planeComponent]]. */
  def planes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)(
      graft.functions.HyperplaneSketch.planeComponent)

  /** Sign-sketch: bit p = (v · plane_p) > 0, packed into a long — the
    * native one-pass expression ([[graft.functions.HyperplaneSketch]]);
    * bit-identical to the declarative fold form below (pinned in
    * AnnSpec). */
  def withSketch(embeddings: DataFrame, nPlanes: Int = 16,
                 embCol: String = "embedding",
                 out: String = "sketch"): DataFrame =
    embeddings.withColumn(out,
      graft.functions.HyperplaneSketch(asDouble(col(embCol)), nPlanes))

  /** The declarative reference form of [[withSketch]] (literal plane
    * arrays + interpreted folds) — kept as the independently-derived
    * semantics the native expression is pinned against. */
  def withSketchDeclarative(embeddings: DataFrame, nPlanes: Int = 16,
                            dim: Int = 64, embCol: String = "embedding",
                            out: String = "sketch"): DataFrame = {
    require(nPlanes <= 63, "sketch packs into a single long")
    val v = asDouble(col(embCol))
    val planeLits = planes(nPlanes, dim).map(p =>
      array(p.map(lit).toIndexedSeq: _*))
    val packed = (0 until nPlanes).map { p =>
      when(dotFold(v, planeLits(p)) > 0, lit(1L << p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    embeddings.withColumn(out, packed)
  }

  /** Embedding near-dup pairs: sketch → banded chunks → bucket join →
    * sketch-Hamming pre-filter → exact cosine ≥ threshold.
    *
    * Parameter shape matters at scale: small chunks (few bits) flood the
    * bucket join with random collisions — measured 22 s on 5k vectors at
    * 4-bit chunks vs ~3 s at 8-bit. 48 planes / 6 bands keeps per-band
    * recall ≈ 0.43 for cosine 0.95 (union over bands ≈ 0.97) while a
    * random pair collides anywhere with p ≈ 2%. The `bit_count` Hamming
    * gate then kills ~all surviving random pairs for one instruction
    * each, so the expensive exact cosine touches only real candidates. */
  def hyperplanePairs(embeddings: DataFrame, threshold: Double = 0.9,
                      nPlanes: Int = 48, bands: Int = 6,
                      maxHamming: Int = 10,
                      idCol: String = "vec_id",
                      embCol: String = "embedding"): DataFrame = {
    require(nPlanes % bands == 0,
      "bands must divide nPlanes — a remainder would silently drop the " +
        "top sketch bits from banding (unannounced recall loss)")
    val bitsPerBand = nPlanes / bands
    val mask = (1L << bitsPerBand) - 1
    val sketched = withSketch(embeddings, nPlanes)
    val banded = sketched.select(col(idCol), col(embCol), col("sketch"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("sketch"), b * bitsPerBand).bitwiseAND(mask)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "chunk")
    val bandedCached = graft.core.TransientCache.persist(banded)
    val x = bandedCached.select(col("band"), col("chunk"), col(idCol).as("id_a"),
      col(embCol).as("emb_a"), col("sketch").as("sk_a"))
    val y = bandedCached.select(col("band"), col("chunk"), col(idCol).as("id_b"),
      col(embCol).as("emb_b"), col("sketch").as("sk_b"))
    x.join(y, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .filter(bit_count(col("sk_a").bitwiseXOR(col("sk_b"))) <= maxHamming)
      .select(col("id_a"), col("id_b"), col("emb_a"), col("emb_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", cosine(asDouble(col("emb_a")),
        asDouble(col("emb_b"))))
      // NaN (zero-norm) compares GREATER than the threshold under
      // Spark's nan-safe ordering — exclude it explicitly, or every
      // pair of zero vectors (which collide in every band) is emitted
      .filter(col("cosine") >= threshold && !isnan(col("cosine")))
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** SemDeDup (Abbas et al. 2023): semantic deduplication by clustered
    * pairwise cosine — cluster the embeddings with the bounded-sample
    * spherical K-Means ([[ivfIndex]]'s quantizer), compare pairs only
    * WITHIN a cluster, and for every pair above `threshold` keep the
    * member closer to its centroid (the paper's "low similarity to
    * centroid is dropped last" rule, inverted to a keep rule; exact
    * ties break to the lower id). A document is dropped iff some
    * same-cluster neighbor above the threshold beats it — one
    * deterministic anti-join over the pair set, no iteration.
    *
    * Scale shape — the clustering IS the cost model: the quadratic
    * pair join runs per cell, so total work is Σ n_c² ≈ N²/k; pick
    * `nCells` ≈ N / (desired cluster size) exactly as the paper does
    * (110k clusters for LAION-440M). One bounded-sample fit, ONE full
    * scan to assign (cell + centroid distance in the same pass), one
    * shuffle on cell for the join. Keep-verdicts are a pure function of
    * the fitted centroids: re-running over the same frame reproduces
    * them exactly; a differently-partitioned copy may cluster (and so
    * dedup) differently, as with any sampled clustering — persist the
    * assignments when the verdict must be durable.
    *
    * Returns every input row with `cell`, `centroid_dist2` (the
    * normalized-vector squared distance to its centroid) and `kept`.
    *
    * `centroids` reuses a quantizer that already exists — the common
    * production case where the corpus carries a lake IVF index
    * ([[IvfIndexStore]]): dedup then costs assignment + the cell join
    * only, no fit, and the dedup's cells agree with the index's. */
  def semanticDedup(embeddings: DataFrame, nCells: Int,
                    threshold: Double = 0.95, idCol: String = "vec_id",
                    embCol: String = "embedding",
                    seed: Long = 7L,
                    centroids: Option[Array[Array[Double]]] = None)
      : DataFrame = {
    require(nCells >= 1, "need at least one cluster")
    // only the bounded-sample FIT job runs here — the discarded
    // assignment frame is lazy and never executed; the one full-table
    // pass below gets cell AND distance together
    val cents = centroids.getOrElse(
      ivfIndex(embeddings, nCells, seed, embCol)._2)
    val scored = graft.core.TransientCache.persist(
      assignCellsScored(embeddings, cents, embCol))
    val a = scored.select(col("cell"), col(idCol).as("id_a"),
      col(embCol).as("emb_a"), col("assign_dist2").as("d_a"))
    val b = scored.select(col("cell"), col(idCol).as("id_b"),
      col(embCol).as("emb_b"), col("assign_dist2").as("d_b"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("id_a") =!= col("id_b"))
      // the loser check first — it halves the cosine evaluations and
      // makes the verdict antisymmetric by construction
      .filter(col("d_b") < col("d_a") ||
        (col("d_b") === col("d_a") && col("id_b") < col("id_a")))
      .withColumn("cosine", cosine(asDouble(col("emb_a")),
        asDouble(col("emb_b"))))
      .filter(col("cosine") >= threshold && !isnan(col("cosine")))
      .select(col("id_a").as(idCol)).distinct()
    scored.join(dropped.withColumn("__dropped", lit(true)),
        Seq(idCol), "left")
      .withColumn("kept", col("__dropped").isNull)
      .withColumnRenamed("assign_dist2", "centroid_dist2")
      .drop("__dropped")
  }
}
