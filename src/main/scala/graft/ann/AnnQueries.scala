package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Correctness-gate entries for similarity search over `embeddings`. */
object AnnQueries {

  val QueryId = 0L
  val K = 10
  private val Dim = 64 // embeddings table dimension (TESTDATA.md)

  /** nn1 — exact brute-force cosine top-k. The fold order in
    * [[Similarity.dotFold]] is strict left-to-right, so the doubles are
    * bit-reproducible and the DuckDB oracle (an explicit left-associated
    * 64-term chain) hash-matches exactly. */
  def nn1BruteTopK(s: SparkSession, d: String): DataFrame =
    Similarity.bruteForceTopK(Tables.embeddings(s, d), QueryId, K)

  val nn1Oracle: String = {
    def chain(f: Int => String): String = (1 to Dim).map(f).mkString(" + ")
    val dot = chain(i => s"e.emb[$i] * q.emb[$i]")
    val nE = chain(i => s"e.emb[$i] * e.emb[$i]")
    val nQ = chain(i => s"q.emb[$i] * q.emb[$i]")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |           FROM embeddings),
       |q AS (SELECT emb FROM v WHERE vec_id = $QueryId),
       |e AS (SELECT * FROM v WHERE vec_id <> $QueryId)
       |SELECT e.vec_id,
       |  ($dot) / (sqrt($nQ) * sqrt($nE)) AS cosine
       |FROM e, q
       |ORDER BY cosine DESC, e.vec_id ASC
       |LIMIT $K""".stripMargin
  }

  /** The IVF index (sample-fit coarse quantizer + one assignment pass),
    * built once per dataset and memoized with the assignments persisted.
    * Index construction is an offline batch job in a real deployment —
    * queries share the index; rebuilding it per query was r2's worst
    * bench entry (10 s of K-Means inside nn2's timed path). The persist
    * is deliberate and long-lived: it IS the index. [[dropIndex]] frees it.
    */
  private val indexCache =
    scala.collection.mutable.Map.empty[String, (DataFrame, Array[Array[Double]])]

  def ivfIndexFor(s: SparkSession, d: String): (DataFrame, Array[Array[Double]]) =
    indexCache.synchronized {
      // key by application too: a memoized frame is bound to the context
      // that built it — after a session restart in the same JVM, a
      // dir-only hit would hand back lineage into a stopped SparkContext
      val appPrefix = s"${s.sparkContext.applicationId}:"
      // entries from previous (stopped) contexts can never be hit again
      // and would pin dead lineage for the JVM's lifetime — evict them
      indexCache.keys.filterNot(_.startsWith(appPrefix)).toList
        .foreach(indexCache.remove)
      val key = appPrefix + d
      indexCache.getOrElseUpdate(key, {
        val (assigned, centroids) =
          Similarity.ivfIndex(Tables.embeddings(s, d), nCells = 16)
        val cached = assigned.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // materialize NOW: persist is lazy, and an unmaterialized index
        // would push the full-table assignment scan into the first
        // query's timed path — the exact cost the offline build exists
        // to exclude
        cached.count()
        (cached, centroids)
      })
    }

  def dropIndex(s: SparkSession, d: String): Unit = indexCache.synchronized {
    indexCache.remove(s"${s.sparkContext.applicationId}:$d")
      .foreach(_._1.unpersist())
  }

  /** The LAKE-resident IVF index for a dataset: built once per
    * (application, dataset) into a scratch ManifestLake table —
    * the offline-build analog of [[ivfIndexFor]]'s in-memory memo.
    * Only the DIRECTORY is memoized (strings, no lineage), so there is
    * no dead-context hazard; a new app in the same JVM simply builds
    * its own index table. */
  private val lakeIndexCache =
    scala.collection.mutable.Map.empty[String, String]

  def lakeIndexFor(s: SparkSession, d: String): String =
    lakeIndexCache.synchronized {
      val key = s"${s.sparkContext.applicationId}:$d"
      lakeIndexCache.getOrElseUpdate(key, {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-ivf-lake").toString
        IvfIndexStore.build(s, d, dir)
        dir
      })
    }

  /** nn2 — IVF-probed top-k (16 cells, probe 4): the scale path. Runs
    * against the shared memoized index, so the timed work is the probe —
    * a cell-pruned scan (12/16 of rows skipped) + TakeOrdered rank, plus
    * the brute-force baseline the result is graded against. HASH-EXACT
    * since r14 via [[recallGated]]: the oracle re-derives the emitted
    * brute values bit-for-bit and the probe's recall floor gates
    * survival. AnnSpec pins the same floor in-test. */
  def nn2IvfTopK(s: SparkSession, d: String): DataFrame = {
    val (assigned, centroids) = ivfIndexFor(s, d)
    val queryVec = Tables.embeddings(s, d)
      .filter(col("vec_id") === QueryId)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    val ivf = Similarity.ivfTopK(
      assigned.filter(col("vec_id") =!= QueryId),
      centroids, queryVec, K, nProbe = 4)
    recallGated(s, d, ivf)
  }

  /** The dd2 gate shape shared by nn2/nn3 — what upgrades them from
    * rows-only to HASH-EXACT: the emitted rows are the DETERMINISTIC
    * portion — the brute-force top-k with its bit-reproducible
    * cosines (nn1's strict-fold arithmetic, which the DuckDB oracle
    * re-derives term by term) — and they survive ONLY when the IVF
    * probe (the timed, cell-pruned path, which still runs) recovered
    * `recall_at_10 >= 0.7` of them. The probe's exact recall scalar
    * is the one thing no SQL oracle can re-derive (it depends on the
    * trained cells), so it gates rather than lands: a probe
    * regression empties the result and the hash fails loudly, while
    * a healthy probe hash-matches values AND cardinality. */
  private def recallGated(s: SparkSession, d: String,
                          probeResult: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, sum, when}
    // ONE persist, on the flagged k-row join result: it feeds both
    // the recall aggregate and the final crossJoin, so the probe (its
    // only upstream consumer) executes exactly once per invocation
    val brute = Similarity.bruteForceTopK(Tables.embeddings(s, d),
      QueryId, K)
    val flagged = graft.core.TransientCache.persist(
      brute.join(
        probeResult.select(col("vec_id"), lit(true).as("probed")),
        Seq("vec_id"), "left")
        .withColumn("probed", coalesce(col("probed"), lit(false))))
    val recall = flagged.agg(
      (sum(when(col("probed"), 1).otherwise(0)).cast("double") / K)
        .as("recall"))
    flagged.crossJoin(broadcast(recall))
      .filter(col("recall") >= 0.7)
      .select(col("vec_id"), col("cosine"),
        (col("recall") >= 0.7).as("recall_floor_met"))
  }

  /** nn3 — the LAKE-index probe ([[IvfIndexStore]]): same hash-exact
    * gate shape as nn2 ([[recallGated]]), but the index is read from
    * ManifestLake tables
    * (manifest-pruned per-cell files, version-pinned snapshot) instead
    * of the session memo — the path a fresh query session takes against
    * an offline-built index. The build itself runs once per dataset
    * outside the timed path ([[lakeIndexFor]]; Bench warms it with the
    * in-memory index). Rows survive only at `recall_at_10 >= 0.7`, so
    * the driver's cardinality pins recall through the whole
    * lake-read → prune → probe chain. */
  def nn3LakeTopK(s: SparkSession, d: String): DataFrame = {
    val dir = lakeIndexFor(s, d)
    val queryVec = Tables.embeddings(s, d)
      .filter(col("vec_id") === QueryId)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    recallGated(s, d,
      IvfIndexStore.probe(s, dir, queryVec, K, nProbe = 4,
        excludeId = Some(QueryId)))
  }

  /** The PQ index for a dataset — trained codebooks + the encoded frame
    * persisted — memoized with the same application-scoped key
    * discipline as [[ivfIndexFor]] (a memoized frame is bound to the
    * context that built it). Encoding is the one full-table pass; the
    * per-query work is LUT + narrow ADC scan + targeted rerank. */
  private val pqCache = scala.collection.mutable.Map
    .empty[String, (DataFrame, ProductQuantizer.PqModel)]

  def pqIndexFor(s: SparkSession, d: String)
      : (DataFrame, ProductQuantizer.PqModel) =
    pqCache.synchronized {
      val appPrefix = s"${s.sparkContext.applicationId}:"
      pqCache.keys.filterNot(_.startsWith(appPrefix)).toList
        .foreach(pqCache.remove)
      pqCache.getOrElseUpdate(appPrefix + d, {
        val model = ProductQuantizer.train(Tables.embeddings(s, d))
        val encoded = ProductQuantizer
          .encode(Tables.embeddings(s, d), model)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        encoded.count() // materialize outside the first query's timed path
        (encoded, model)
      })
    }

  /** nn5 — product-quantized top-k ([[ProductQuantizer]]): the
    * COMPRESSION tier of the ANN story. Candidate generation scores
    * `(vec_id, pq_code)` ONLY — 16 small ints per 256-byte vector, the
    * embedding column never read — then the ≤8k-candidate pool reranks
    * by exact cosine. Same recall-pinned rows-only gate shape as
    * nn2/nn3 (no SQL oracle can re-derive the trained codebooks):
    * every surviving row carries `recall_at_10` vs the in-engine exact
    * top-k and rows only survive at ≥ 0.7, so the driver's recorded
    * cardinality pins the recall floor. */
  def nn5PqTopK(s: SparkSession, d: String): DataFrame = {
    val (encoded, model) = pqIndexFor(s, d)
    val queryVec = Tables.embeddings(s, d)
      .filter(col("vec_id") === QueryId)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    recallGated(s, d, ProductQuantizer.adcTopK(
      encoded.filter(col("vec_id") =!= QueryId),
      Tables.embeddings(s, d), model, queryVec, K, rerank = 8 * K))
  }

  /** nn6 — the LAKE-resident IVF-PQ probe: both pruning dimensions of
    * the billion-vector read path at once — manifest pruning keeps only
    * the probed cells' files AND the candidate scan reads only
    * `(vec_id, pq_code)` (the embedding column stays unread until the
    * exact rerank of the bounded candidate pool). Same recall-pinned
    * rows-only gate shape as nn2/nn3/nn5; the build is [[lakeIndexFor]]'s
    * shared offline step. */
  def nn6LakePqTopK(s: SparkSession, d: String): DataFrame = {
    val dir = lakeIndexFor(s, d)
    val queryVec = Tables.embeddings(s, d)
      .filter(col("vec_id") === QueryId)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    recallGated(s, d, IvfIndexStore.probePq(s, dir, queryVec, K,
      nProbe = 4, rerank = 8 * K, excludeId = Some(QueryId)))
  }

  /** nn4 — metadata-filtered exact search: top-k by cosine AMONG vectors
    * with `label = 2` ([[Similarity.filteredTopK]]). The label predicate
    * is pushed to the parquet scan, the query row is looked up
    * unfiltered, and k fills from qualifying rows only — pre-filtered
    * search, the shape a training-data pipeline needs for "nearest
    * in-domain examples". Same strict-fold arithmetic as nn1, so the
    * DuckDB oracle hash-matches exactly. */
  def nn4FilteredTopK(s: SparkSession, d: String): DataFrame =
    Similarity.filteredTopK(Tables.embeddings(s, d), QueryId, K,
      col("label") === 2)

  val nn4Oracle: String = {
    def chain(f: Int => String): String = (1 to Dim).map(f).mkString(" + ")
    val dot = chain(i => s"e.emb[$i] * q.emb[$i]")
    val nE = chain(i => s"e.emb[$i] * e.emb[$i]")
    val nQ = chain(i => s"q.emb[$i] * q.emb[$i]")
    s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
       |           FROM embeddings),
       |q AS (SELECT emb FROM v WHERE vec_id = $QueryId),
       |e AS (SELECT * FROM v WHERE vec_id <> $QueryId AND label = 2)
       |SELECT e.vec_id,
       |  ($dot) / (sqrt($nQ) * sqrt($nE)) AS cosine
       |FROM e, q
       |ORDER BY cosine DESC, e.vec_id ASC
       |LIMIT $K""".stripMargin
  }

  /** Memoized PCA model per (app, dataset) — the fit is one covariance
    * pass + driver eigendecomposition, an offline batch job like the
    * quantizer fits; em1 times the reduced-space SEARCH. */
  private val pcaCache =
    scala.collection.mutable.Map.empty[String, Pca.PcaModel]

  def pcaModelFor(s: SparkSession, d: String): Pca.PcaModel =
    pcaCache.synchronized {
      val appPrefix = s"${s.sparkContext.applicationId}:"
      pcaCache.keys.filterNot(_.startsWith(appPrefix)).toList
        .foreach(pcaCache.remove)
      pcaCache.getOrElseUpdate(appPrefix + d,
        Pca.fit(Tables.embeddings(s, d), k = 32))
    }

  /** em1_pca_topk — PCA-reduced similarity search through the gate,
    * in the production two-stage shape (the ADC-rerank pattern):
    * embeddings project to 32 of 64 dimensions (centered literal-dot
    * projection, [[Pca.project]]), candidate generation is a top-50
    * scan in the REDUCED space (2× narrower per candidate — on this
    * synthetic corpus's deliberately flat spectrum, 32 components
    * retain only ~60% variance, so raw reduced-space RANKING is not
    * servable; candidates + exact rerank is, exactly as in PQ), and
    * the exact cosine reranks the 50 survivors to the final top-10.
    * Every surviving row carries `recall_at_10` vs the full-dimension
    * exact top-k and rows survive only at ≥ 0.7, the nn2 pinning
    * shape; eigenvector sign/summation-order nondeterminism keeps the
    * surface rows-only like the other fitted-model rows. */
  def em1PcaTopK(s: SparkSession, d: String): DataFrame = {
    val model = pcaModelFor(s, d)
    val emb = Tables.embeddings(s, d)
    val proj = graft.core.TransientCache.persist(
      Pca.project(emb, model).select(col("vec_id"), col("pca")))
    val candIds = Similarity.bruteForceTopK(proj, QueryId, 50,
      embCol = "pca").collect().map(_.getLong(0))
    recallGated(s, d, Similarity.filteredTopK(emb, QueryId, K,
      col("vec_id").isin(candIds.map(Long.box).toIndexedSeq: _*)))
  }

  /** rr1_hybrid_rrf — HYBRID retrieval through the gate: the bm1 BM25
    * top-15 over `documents` and a cosine top-15 over `embeddings`
    * (vec_id standing as the document id) fuse by Reciprocal Rank
    * Fusion into one consensus top-10, DuckDB re-deriving both ranked
    * lists (the bm1 and nn1 oracle bodies verbatim, as CTEs) and the
    * identical `1/(60+rank)` sums — rank fusion is integer-driven, so
    * the fused doubles are bit-exact despite two float rankers. */
  def rr1HybridRrf(s: SparkSession, d: String): DataFrame = {
    val bm = graft.text.TextQueries.bm1Bm25TopK(s, d)
      .select(col("doc_id"), col("score"))
    val vec = Similarity.bruteForceTopK(Tables.embeddings(s, d),
      QueryId, 15)
      .select(col("vec_id").as("doc_id"), col("cosine"))
    HybridRetrieval.rrfFuse(
      Seq(bm -> "score", vec -> "cosine"), "doc_id")
  }

  val rr1Oracle: String = {
    val vecList = nn1Oracle.replace(s"LIMIT $K", "LIMIT 15")
    s"""WITH bm AS (${graft.text.TextQueries.bm1Oracle}),
       |vec AS ($vecList),
       |bmr AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS r
       |  FROM bm),
       |vr AS (
       |  SELECT vec_id AS doc_id,
       |    row_number() OVER (ORDER BY cosine DESC, vec_id) AS r
       |  FROM vec),
       |u AS (
       |  SELECT doc_id, 1e0 / (60 + r) AS c FROM bmr
       |  UNION ALL
       |  SELECT doc_id, 1e0 / (60 + r) AS c FROM vr)
       |SELECT doc_id, round(sum(c), 6) AS rrf,
       |  count(*) AS lists_hit
       |FROM u GROUP BY doc_id
       |ORDER BY sum(c) DESC, doc_id
       |LIMIT 10""".stripMargin
  }

  /** rr2_hybrid_lake — the same fusion with the BM25 leg served from
    * the LAKE-RESIDENT inverted index (bm2's term-pruned lookups, no
    * corpus scan): index-served fusion must equal scan-served fusion
    * hash-exactly — rr1's oracle verbatim, the index≡scan invariant
    * extended through the fusion layer. */
  def rr2HybridLake(s: SparkSession, d: String): DataFrame = {
    val bm = graft.text.TextQueries.bm2Bm25Index(s, d)
      .select(col("doc_id"), col("score"))
    val vec = Similarity.bruteForceTopK(Tables.embeddings(s, d),
      QueryId, 15)
      .select(col("vec_id").as("doc_id"), col("cosine"))
    HybridRetrieval.rrfFuse(
      Seq(bm -> "score", vec -> "cosine"), "doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "em1_pca_topk" -> (em1PcaTopK _),
    "nn1_brute_topk" -> (nn1BruteTopK _),
    "nn2_ivf_topk" -> (nn2IvfTopK _),
    "nn3_lake_topk" -> (nn3LakeTopK _),
    "nn4_filtered_topk" -> (nn4FilteredTopK _),
    "nn5_pq_topk" -> (nn5PqTopK _),
    "nn6_lakepq_topk" -> (nn6LakePqTopK _),
    "rr1_hybrid_rrf" -> (rr1HybridRrf _),
    "rr2_hybrid_lake" -> (rr2HybridLake _))

  /** nn2/nn3's oracle — nn1's exact brute-force arithmetic with the
    * gate outcome asserted: the full top-k present (at `>= 0.7`
    * recall the Spark side emits ALL brute rows or NONE) with
    * `recall_floor_met` TRUE. A probe regression empties the Spark
    * side and the compare fails on cardinality; a value drift fails
    * on the bit-exact cosines. */
  val nnRecallOracle: String =
    s"""SELECT vec_id, cosine, TRUE AS recall_floor_met
       |FROM ($nn1Oracle)""".stripMargin

  val oracles: Map[String, String] = Map(
    "nn1_brute_topk" -> nn1Oracle,
    "nn2_ivf_topk" -> nnRecallOracle,
    "nn3_lake_topk" -> nnRecallOracle,
    "nn5_pq_topk" -> nnRecallOracle,
    "nn6_lakepq_topk" -> nnRecallOracle,
    "em1_pca_topk" -> nnRecallOracle,
    "nn4_filtered_topk" -> nn4Oracle,
    "rr1_hybrid_rrf" -> rr1Oracle,
    "rr2_hybrid_lake" -> rr1Oracle)
}
