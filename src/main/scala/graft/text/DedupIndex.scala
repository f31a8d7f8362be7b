package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.ManifestLake

/** INCREMENTAL cross-corpus deduplication against a lake-resident
  * signature index — the shape a production training-data pipeline
  * actually runs: the corpus is deduped ONCE, its signatures persist in
  * the lake, and every new ingest batch is classified against the index
  * WITHOUT touching (or re-signaturing) corpus text. Batch work is
  * O(batch); corpus work is O(files that can match), served by the
  * lake's bloom/stats skipping.
  *
  * Two lake tables under the index directory:
  *  - `signatures` — one row per admitted doc: id, `content_hash`
  *    (sha-256 of the text), `sig` (the MinHash signature). Bloom
  *    sidecars on `content_hash` make the exact-dup probe a point
  *    lookup.
  *  - `postings` — one row per (band, bucket, doc) from LSH banding.
  *    Bloom sidecars on `bucket` make the near-dup probe read only the
  *    files whose buckets the batch can collide with.
  *
  * Classification of a batch doc (mirrors [[Dedup]]'s one-shot
  * semantics, but against corpus + batch):
  *  - EXACT dup: its content hash appears in the corpus (any id,
  *    self excluded) or on a SMALLER-id batch doc. `dup_of` is the
  *    minimum such id — stable across re-runs even after admission,
  *    because a doc never duplicates itself.
  *  - NEAR dup (exact dups excluded): an LSH band collision (corpus
  *    postings or within-batch) whose signature agreement —
  *    `|{i : sigA[i] = sigB[i]}| / H`, the standard unbiased MinHash
  *    estimate of Jaccard — reaches `simThreshold`. Within-batch
  *    collisions only count against SMALLER-id partners (the keeper
  *    stays unique), which keeps re-classification after admission
  *    bit-stable: the keeper becomes the corpus partner.
  *
  * [[admit]] appends the non-duplicate docs' signatures and postings
  * through [[ManifestLake.writeBatch]]'s replay guard, so an ingest
  * retry (same appId/batchId) is exactly-once per table; a crash
  * between the two table commits costs only near-dup RECALL against
  * the half-admitted batch until the retry completes, never
  * correctness of what was already admitted.
  *
  * Reference runs no dedup at all (its corpus is bike telemetry); this
  * family extends the engine toward the LLM-pipeline operators the
  * build brief names. Scale: nothing here reads corpus text after
  * indexing; probes prune through sidecars; within-batch LSH is
  * banded + hot-bucket-capped exactly like [[Dedup.nearDupPairs]]. */
object DedupIndex {

  /** Tuning knobs; defaults match [[Dedup.nearDupPairs]]. */
  final case class Config(numHashes: Int = 32, bands: Int = 16,
                          shingleN: Int = 3, simThreshold: Double = 0.5,
                          maxBucketSize: Int = 1000,
                          maxProbeKeys: Int = 100000) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  def signaturesTable(indexDir: String): String = s"$indexDir/signatures"
  def postingsTable(indexDir: String): String = s"$indexDir/postings"

  /** id + content_hash + sig for `df`, via the native one-pass
    * signature kernel. */
  private def signed(df: DataFrame, idCol: String, textCol: String,
                     cfg: Config): DataFrame =
    df.select(col(idCol), col(textCol))
      .withColumn("content_hash", sha2(col(textCol), 256))
      .withColumn("sig", graft.functions.MinHashSignature(
        col(textCol), cfg.shingleN, cfg.numHashes))

  /** Create the index from an initial corpus (or extend it with more
    * pre-deduped docs). One corpus pass computes hash + signature; the
    * postings derive from the signatures without re-reading text. */
  def buildIndex(corpus: DataFrame, indexDir: String,
                 idCol: String = "doc_id", textCol: String = "text",
                 cfg: Config = Config()): Unit = {
    val sigs = graft.core.TransientCache.persist(
      signed(corpus, idCol, textCol, cfg).drop(textCol))
    ManifestLake.write(sigs, signaturesTable(indexDir),
      bloomCols = Seq("content_hash"))
    ManifestLake.write(
      Dedup.lshBuckets(sigs, idCol, cfg.bands, cfg.rowsPerBand)
        .select(col(idCol), col("band"), col("bucket")),
      postingsTable(indexDir), bloomCols = Seq("bucket"))
  }

  /** The lake read for a key-batch probe: bloom/stats-pruned
    * [[ManifestLake.readIn]] when the key set is collectable, full read
    * otherwise (the IN-list pruning needs the keys on the driver; past
    * `maxProbeKeys` a shuffle join against the full table is the better
    * plan anyway). */
  private def probe(spark: SparkSession, table: String, keyCol: String,
                    keys: DataFrame, cfg: Config): DataFrame = {
    // one job: collect up to the cap + 1 — the overflow row alone
    // decides full-read, no separate count pass
    val vals = keys.distinct().limit(cfg.maxProbeKeys + 1)
      .collect().map(_.get(0)).toSeq
    if (vals.isEmpty) ManifestLake.read(spark, table).filter(lit(false))
    else if (vals.size <= cfg.maxProbeKeys)
      ManifestLake.readIn(spark, table, keyCol, vals)
    else ManifestLake.read(spark, table)
  }

  /** MinHash-estimated Jaccard: the fraction of agreeing signature
    * lanes. */
  private def estSim(a: Column, b: Column, cfg: Config): Column =
    aggregate(zip_with(a, b, (x, y) => (x === y).cast("int")),
      lit(0), (acc, v) => acc + v).cast("double") / cfg.numHashes

  /** Classify `batch` against the index (and itself). Read-only: the
    * index advances only via [[admit]]. Output: the batch's id column
    * plus `is_exact_dup`, `dup_of` (the exact keeper's id, null for
    * non-exact rows) and `is_near_dup`. */
  def classifyBatch(spark: SparkSession, batch: DataFrame, indexDir: String,
                    idCol: String = "doc_id", textCol: String = "text",
                    cfg: Config = Config()): DataFrame = {
    val b = graft.core.TransientCache.persist(
      signed(batch, idCol, textCol, cfg))
    // a not-yet-created index (the streaming-bootstrap first epoch)
    // classifies against an EMPTY corpus: every probe below short-
    // circuits to a zero-row frame of the right shape, and within-batch
    // dedup still applies in full
    val indexExists = ManifestLake
      .currentVersion(spark, signaturesTable(indexDir)).nonEmpty
    // ---- exact: corpus probe (point lookups through the blooms) ----
    val corpusHash = (if (indexExists)
      probe(spark, signaturesTable(indexDir), "content_hash",
        b.select(col("content_hash")), cfg)
      else b.filter(lit(false)))
      .select(col("content_hash"), col(idCol).as("__c_id"))
    val exactCorpus = b.select(col(idCol), col("content_hash"))
      .join(corpusHash, "content_hash")
      .filter(col("__c_id") =!= col(idCol)) // self after admission
      .groupBy(col(idCol)).agg(min(col("__c_id")).as("__exact_corpus"))
    // ---- exact: within batch (smallest id keeps) ----
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("content_hash"))
    val exactBatch = b.select(col(idCol), col("content_hash"))
      .withColumn("__batch_min", min(col(idCol)).over(wb))
      .filter(col("__batch_min") < col(idCol))
      .select(col(idCol), col("__batch_min").as("__exact_batch"))
    // ---- near: corpus postings probe (bucket blooms) + batch self ----
    val bBuckets = graft.core.TransientCache.persist(
      Dedup.lshBuckets(b, idCol, cfg.bands, cfg.rowsPerBand))
    val corpusPost = (if (indexExists)
      probe(spark, postingsTable(indexDir), "bucket",
        bBuckets.select(col("bucket")), cfg)
      else bBuckets.filter(lit(false)))
      .select(col("band"), col("bucket"), col(idCol).as("__p_id"))
    val corpusCand = bBuckets.join(corpusPost, Seq("band", "bucket"))
      .filter(col("__p_id") =!= col(idCol))
      .select(col(idCol), col("__p_id").as("__partner")).distinct()
    val batchCand = Dedup.candidatePairs(bBuckets, idCol, cfg.maxBucketSize)
      // only the larger id of a within-batch pair is the near-dup (the
      // keeper stays unique) — the orientation that survives admission
      .select(col("id_b").as(idCol), col("id_a").as("__partner"))
    val partnerIds = corpusCand.select(col("__partner")).distinct()
    val partnerSigs = (if (indexExists)
      probe(spark, signaturesTable(indexDir), idCol, partnerIds, cfg)
      else b.filter(lit(false)))
      .select(col(idCol).as("__partner"), col("sig").as("__partner_sig"))
    val bSigs = b.select(col(idCol), col("sig"))
    val nearCorpus = corpusCand
      .join(partnerSigs, "__partner")
      .join(bSigs, idCol)
      .filter(estSim(col("sig"), col("__partner_sig"), cfg)
        >= cfg.simThreshold)
      .select(col(idCol)).distinct()
    val nearBatch = batchCand
      .join(bSigs.select(col(idCol).as("__partner"),
        col("sig").as("__partner_sig")), "__partner")
      .join(bSigs, idCol)
      .filter(estSim(col("sig"), col("__partner_sig"), cfg)
        >= cfg.simThreshold)
      .select(col(idCol)).distinct()
    val near = nearCorpus.unionByName(nearBatch).distinct()
      .withColumn("__near", lit(true))
    val out = b.select(col(idCol))
      .join(exactCorpus, Seq(idCol), "left")
      .join(exactBatch, Seq(idCol), "left")
      .join(near, Seq(idCol), "left")
      .withColumn("is_exact_dup",
        col("__exact_corpus").isNotNull || col("__exact_batch").isNotNull)
      .withColumn("dup_of", least(col("__exact_corpus"), col("__exact_batch")))
      .withColumn("is_near_dup",
        !col("is_exact_dup") && coalesce(col("__near"), lit(false)))
      .select(col(idCol), col("is_exact_dup"), col("dup_of"),
        col("is_near_dup"))
    out
  }

  /** Append the batch's NON-duplicate docs (per [[classifyBatch]]'s
    * verdict, passed back in) to the index, replay-guarded by
    * (appId, batchId): a retried ingest batch commits each table once.
    * Returns the number of admitted docs. */
  def admit(spark: SparkSession, batch: DataFrame, verdict: DataFrame,
            indexDir: String, batchId: Long, appId: String = "dedup-index",
            idCol: String = "doc_id", textCol: String = "text",
            cfg: Config = Config()): Long = {
    val fresh = batch.join(
      verdict.filter(!col("is_exact_dup") && !col("is_near_dup"))
        .select(col(idCol)),
      idCol)
    val sigs = graft.core.TransientCache.persist(
      signed(fresh, idCol, textCol, cfg).drop(textCol))
    val n = sigs.count()
    // blooms named explicitly so a streaming-bootstrap FIRST admission
    // (no prior buildIndex) still creates the index with its probe
    // sidecars; on an existing index this re-states the same set
    ManifestLake.writeBatch(sigs, signaturesTable(indexDir), batchId,
      appId = appId, bloomCols = Seq("content_hash"))
    ManifestLake.writeBatch(
      Dedup.lshBuckets(sigs, idCol, cfg.bands, cfg.rowsPerBand)
        .select(col(idCol), col("band"), col("bucket")),
      postingsTable(indexDir), batchId, appId = appId,
      bloomCols = Seq("bucket"))
    n
  }
}
