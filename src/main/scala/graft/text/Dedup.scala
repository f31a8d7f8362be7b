package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline (exact, MinHash-
  * LSH, SimHash, n-gram Jaccard). All candidate generation is BUCKETED —
  * band-hash shuffles and bucket-local self-joins — never an all-pairs
  * cartesian: at 100 TB the candidate set scales with collisions, not N².
  *
  * Everything is built from codegen'd higher-order array functions (no
  * UDFs, no ML-pipeline detours): signatures are computed in one narrow
  * pass per document.
  */
object Dedup {

  // ---- shared text prep ----

  /** Distinct word n-gram shingles (default 3) per document. Tokens are
    * NON-EMPTY whitespace-separated runs — `split` alone keeps a leading/
    * trailing empty token on padded text, which the native kernels
    * ([[graft.functions.ShingleHashing]]) never produce; filtering keeps
    * the declarative and native forms value-identical on any input. */
  def withShingles(df: DataFrame, textCol: String = "text", n: Int = 3,
                   out: String = "shingles"): DataFrame = {
    val toks = org.apache.spark.sql.functions.filter(
      split(col(textCol), "\\s+"), t => t =!= "")
    df.withColumn(out,
      array_distinct(
        when(size(toks) >= n,
          transform(sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
          .otherwise(array(concat_ws(" ", toks)))))
  }

  // ---- D1: exact dedup ----

  /** Exact dedup on the full content hash: every row keeps its group key
    * and whether it is the keeper (minimal id in its hash group). The
    * group-by is a shuffle on a 256-bit key — the cheapest possible exact
    * dedup at any scale. */
  def exactDedup(df: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val h = sha2(col(textCol), 256)
    df.withColumn("content_hash", h)
      .withColumn("is_keeper",
        col(idCol) === min(col(idCol))
          .over(Window.partitionBy(col("content_hash"))))
  }

  // ---- D2: MinHash + LSH ----

  /** H-permutation MinHash signature over the shingle set. Each
    * "permutation" is xxhash64 seeded by the permutation index; min over
    * the shingle set approximates the Jaccard kernel.
    *
    * Shaped as ONE sequential fold over the shingle array with an
    * elementwise-min accumulator: each shingle is hashed H times and the
    * shingle array is walked exactly once. (The transposed form —
    * `transform(seeds, i => array_min(transform(shingles, ...)))` —
    * re-evaluates the shingle-construction expression per seed after
    * Catalyst collapses projections: 32× the work, measured 85 s vs ~3 s
    * on 5k docs at sf0.1.) */
  def withMinhashSignature(df: DataFrame, numHashes: Int = 32,
                           shingleCol: String = "shingles",
                           out: String = "sig"): DataFrame =
    df.withColumn(out,
      aggregate(
        // hash each shingle string ONCE; the H "permutations" then mix
        // the resulting long, which is ~20× cheaper than re-hashing the
        // string per permutation
        transform(col(shingleCol), sh => xxhash64(sh)),
        array_repeat(lit(Long.MaxValue), numHashes),
        (acc: Column, sh: Column) =>
          zip_with(acc,
            array((0 until numHashes).map(i => xxhash64(lit(i), sh)): _*),
            (a: Column, h: Column) => least(a, h))))

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * and emit one (band, bucket) key per band. Documents sharing any
    * band bucket become candidates — the only shuffle keys are band
    * hashes, so co-bucketed docs land on the same partition. */
  def lshBuckets(df: DataFrame, idCol: String, bands: Int, rowsPerBand: Int,
                 sigCol: String = "sig"): DataFrame =
    df.select(col(idCol),
        posexplode(array((0 until bands).map(b =>
          hash(slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand),
            lit(b))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

  /** Hot-bucket guard: deterministically truncate every (band, bucket)
    * group to its first `maxBucketSize` members (ordered by id). A bucket
    * holding B documents otherwise emits B² candidate pairs, and
    * degenerate-but-common corpora — empty strings, shared boilerplate
    * headers — put millions of docs in ONE bucket at 100 TB: the one
    * shape that turns a bucketed join back into a cartesian product. The
    * cap bounds any bucket's contribution at maxBucketSize² while keeping
    * a deterministic representative sample, so planted near-dups still
    * pair within the kept prefix. (Docs truncated from a hot bucket can
    * still pair in their other bands; fully-identical docs are the
    * exact-dedup operator's job, not LSH's.) The cap is OBSERVABLE, not
    * self-announcing: the hot path stays action-free, so the chains do
    * not log truncation inline — run [[truncatedBuckets]] (same keys,
    * one aggregation) as the monitoring query alongside any production
    * dedup job to see exactly which buckets were cut and how big they
    * really were. The specs pin both the bound and the diagnostic. */
  private def capBuckets(buckets: DataFrame, keyCols: Seq[String],
                         idCol: String, maxBucketSize: Int): DataFrame =
    buckets
      .withColumn("__bucket_rank",
        // ordered by a hash of the id (id itself only breaks ties):
        // deterministic, but id-UNIFORM — ranking by raw id would keep
        // the smallest ids, systematically evicting whatever sorts last
        // (late-ingested docs, planted copies in the gate corpora)
        // instead of a representative sample of the bucket
        row_number().over(Window.partitionBy(keyCols.map(col): _*)
          .orderBy(xxhash64(col(idCol)), col(idCol))))
      .filter(col("__bucket_rank") <= maxBucketSize)
      .drop("__bucket_rank")

  /** Diagnostic: every (band, bucket) whose occupancy exceeds
    * `maxBucketSize`, with its true size — the buckets [[capBuckets]]
    * truncates. One aggregation on the same keys as the candidate join. */
  def truncatedBuckets(buckets: DataFrame, keyCols: Seq[String],
                       maxBucketSize: Int): DataFrame =
    buckets.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucketSize)

  /** Shuffle width sized to the DATA, not the core count: partitions =
    * clamp(optimizer size estimate / `targetBytes`, 1, session
    * `spark.sql.shuffle.partitions`). The banded dedup self-joins
    * shuffle a few MB at bench scale; fanning that into `cores`
    * partitions costs a task launch per ~kilobyte and measured 8 cores
    * BEATING 32 on dd2/dd3/dd6 (r16 scaling ratios 0.31–0.45). The cap
    * keeps cluster scale intact: a 100 TB banded table estimates far
    * above the cap and keeps the session's full shuffle width (guide
    * §2.2 fewer-larger partitions, scale-adaptive not constant). */
  private[text] def sizedPartitions(df: DataFrame,
                                    targetBytes: Long = 8L << 20): Int = {
    // cap = max(session shuffle width, default parallelism): the conf
    // alone would race with Streaming.runToMemory, which temporarily
    // lowers spark.sql.shuffle.partitions on the SHARED session while
    // a stream runs — a dedup plan built concurrently (Verify's 4-way
    // pool) must not bake the streaming state-store knob in as its cap.
    // Taking the max restores a sane ceiling (the race only ever
    // lowers the conf).
    val max = math.max(math.max(1,
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt),
      df.sparkSession.sparkContext.defaultParallelism)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes > BigInt(targetBytes) * max) max
    else math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
  }

  /** Bucket-local candidate pairs (a < b), deduplicated across bands.
    * Buckets over `maxBucketSize` are truncated first (see
    * [[capBuckets]]) so a degenerate hot bucket cannot go B². */
  def candidatePairs(buckets: DataFrame, idCol: String,
                     maxBucketSize: Int = 1000): DataFrame = {
    // persisted: the capped frame feeds BOTH sides of the self-join, and
    // the row_number window (one shuffle + sort) must not run twice.
    // The explicit data-sized repartition on the window/join key means
    // the cap window AND both self-join sides reuse ONE right-width
    // exchange instead of three cores-wide ones.
    val capped = graft.core.TransientCache.persist(
      capBuckets(buckets.repartition(sizedPartitions(buckets),
        col("band"), col("bucket")), Seq("band", "bucket"), idCol,
        maxBucketSize))
    val x = capped.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val y = capped.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    x.join(y, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact Jaccard verification for candidate pairs. */
  def jaccardVerify(pairs: DataFrame, shingled: DataFrame, idCol: String,
                    shingleCol: String = "shingles"): DataFrame = {
    val a = shingled.select(col(idCol).as("id_a"),
      col(shingleCol).as("sh_a"))
    val b = shingled.select(col(idCol).as("id_b"),
      col(shingleCol).as("sh_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full near-dup chain: native minhash signature → band → bucket join
    * → native exact-Jaccard filter. Never materializes an all-pairs
    * product, and never materializes shingle strings at all — both the
    * signature and the verify kernel are single-pass native expressions
    * ([[graft.functions.MinHashSignature]] /
    * [[graft.functions.NgramJaccard]]); the declarative
    * shingle/sig/verify building blocks above remain available for the
    * oracle-checked paths. */
  def nearDupPairs(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", threshold: Double = 0.5,
                   numHashes: Int = 32, bands: Int = 16,
                   maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val base = graft.core.TransientCache.persist(
      df.select(col(idCol), col(textCol)))
    val signed = base.withColumn("sig",
      graft.functions.MinHashSignature(col(textCol), 3, numHashes))
    val buckets = graft.core.TransientCache.persist(
      lshBuckets(signed, idCol, bands, numHashes / bands))
    val a = base.select(col(idCol).as("id_a"), col(textCol).as("text_a"))
    val b = base.select(col(idCol).as("id_b"), col(textCol).as("text_b"))
    candidatePairs(buckets, idCol, maxBucketSize)
      .join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard",
        graft.functions.NgramJaccard(col("text_a"), col("text_b"), 3))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---- D3: SimHash ----

  /** 64-bit SimHash fingerprint: per token, xxhash64 contributes ±1 to
    * each bit position; the sign of each accumulated bit becomes the
    * fingerprint bit. Entirely within one narrow pass via a sequential
    * array fold — no explode, no shuffle. */
  def withSimhash(df: DataFrame, textCol: String = "text",
                  out: String = "simhash"): DataFrame = {
    // hash each token exactly once, THEN fold the hash array — putting
    // xxhash64 inside the 64-way bit expansion would recompute it per bit
    val tokenHashes = transform(split(col(textCol), "\\s+"),
      t => xxhash64(t))
    val contributions = aggregate(
      tokenHashes,
      array_repeat(lit(0L), 64),
      (acc: Column, h: Column) =>
        zip_with(acc,
          array((0 until 64).map(b =>
            when(shiftright(h, b).bitwiseAND(1) === 1, 1L)
              .otherwise(-1L)): _*),
          (a: Column, c: Column) => a + c))
    val packed = (0 until 64).map(b =>
      when(element_at(col("__simhash_contrib"), b + 1) > 0, lit(1L << b))
        .otherwise(0L))
      .reduce((a, c) => a.bitwiseOR(c))
    df.withColumn("__simhash_contrib", contributions)
      .withColumn(out, packed)
      .drop("__simhash_contrib")
  }

  /** SimHash near-dup candidates: band the 64-bit fingerprint into four
    * 16-bit chunks (any exact chunk match → candidate — guaranteed to
    * catch all pairs within Hamming distance 3), then verify
    * `bit_count(xor) <= maxHamming`. Fingerprints come from the native
    * [[graft.functions.SimHash64]] expression (one JVM pass per doc);
    * [[withSimhash]] stays as the declarative reference form. */
  def simhashPairs(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", maxHamming: Int = 3,
                   maxBucketSize: Int = 1000): DataFrame = {
    val hashed = graft.core.TransientCache.persist(
      df.select(col(idCol),
        graft.functions.SimHash64(col(textCol)).as("simhash")))
    // capped + persisted for the same reason as [[candidatePairs]]: a
    // 16-bit chunk shared by a degenerate corpus (all-empty docs hash to
    // one fingerprint) would otherwise self-join B². Repartitioned to
    // the data-sized width on the window/join key (see
    // [[sizedPartitions]]) so the cap window and the self-join reuse
    // one right-width exchange.
    val bandedRaw = hashed.select(col(idCol), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "chunk")
    val banded = graft.core.TransientCache.persist(
      capBuckets(
        bandedRaw.repartition(sizedPartitions(bandedRaw),
          col("band"), col("chunk")),
        Seq("band", "chunk"), idCol, maxBucketSize))
    val x = banded.select(col("band"), col("chunk"),
      col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val y = banded.select(col("band"), col("chunk"),
      col(idCol).as("id_b"), col("simhash").as("sh_b"))
    x.join(y, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- D5: winnowing fingerprint overlap ----

  /** Near-dup pairs by winnowed rolling-hash fingerprint overlap (the
    * MOSS scheme): each document's sparse fingerprint set
    * ([[graft.functions.WinnowFingerprint]]) explodes to (fingerprint,
    * doc) rows; documents sharing a fingerprint pair up bucket-locally —
    * candidates scale with collisions, never N². Fingerprints appearing
    * in more than `maxDocFreq` documents are dropped first (stop-
    * fingerprints: boilerplate shared by everything would otherwise
    * create hot buckets — the same reason inverted indexes drop
    * stopwords). The winnowing guarantee bounds recall: any shared
    * substring of ≥ window+k-1 chars shares ≥ 1 fingerprint. */
  def winnowPairs(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", k: Int = 8, window: Int = 16,
                  minShared: Int = 3, maxDocFreq: Int = 10): DataFrame = {
    val fpRaw = df.select(col(idCol),
      explode(graft.functions.WinnowFingerprint(col(textCol), k, window))
        .as("fp"))
    // repartitioned to the data-sized width on the window/join key
    // (see [[sizedPartitions]]): the doc-frequency window, the pruning
    // filter, and BOTH pair-join sides then reuse one right-width
    // exchange instead of three cores-wide ones.
    val fps = graft.core.TransientCache.persist(
      fpRaw.repartition(sizedPartitions(fpRaw), col("fp"))
        // stop-fingerprint pruning: one narrow agg over the exploded rows
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("fp"))))
        .filter(col("df") <= maxDocFreq)
        .drop("df"))
    val a = fps.select(col("fp"), col(idCol).as("id_a"))
    val b = fps.select(col("fp"), col(idCol).as("id_b"))
    a.join(b, "fp")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // ---- D6: near-dup cluster formation ----

  /** Connected components over an undirected pair graph — the step that
    * turns near-dup PAIRS into dedup CLUSTERS (pairs alone can't pick
    * keepers: a–b and b–c must collapse to ONE surviving document even
    * when a–c was never emitted as a pair). HashMin label propagation:
    * every node starts labeled with its own id, and each iteration joins
    * labels across edges and keeps the minimum — one hop of propagation
    * per iteration, so convergence takes O(graph diameter) iterations.
    * Near-dup graphs are short-diameter by construction (clusters are
    * dense blobs of mutual similarity), which makes HashMin the right
    * trade at 100 TB: each iteration is ONE shuffle join + ONE key
    * aggregate, with `localCheckpoint` truncating the iterative lineage
    * so the final plan doesn't replay every round. (For adversarially
    * long chains the literature's large–small-star alternation gives
    * O(log n) rounds; not needed for dedup-shaped graphs.) Throws if the
    * labels have not stabilized within `maxIter` — a silent partial
    * merge would under-deduplicate. */
  def connectedComponents(nodes: DataFrame, idCol: String, pairs: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    val e0 = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = graft.core.TransientCache.persist(
      e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    var ckpt = nodes.select(col(idCol).as("id"), col(idCol).as("label"))
      .localCheckpoint(true)
    var labels = ckpt
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges.join(labels, col("src") === col("id"))
        .groupBy(col("dst")).agg(min(col("label")).as("nbr_label"))
      val next = labels.join(nbrMin, col("id") === col("dst"), "left")
        .select(col("id"), col("label").as("prev"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
        .localCheckpoint(true)
      changed = next.filter(col("label") =!= col("prev")).count()
      // `next` is materialized with truncated lineage: the superseded
      // round's checkpoint RDD can be freed NOW instead of leaking one
      // persisted RDD per iteration for the life of the session. This
      // must go through the RDD — Dataset.unpersist on a checkpointed
      // frame is a CacheManager no-op (CheckpointBridge scaladoc).
      org.apache.spark.sql.graftbridge.CheckpointBridge
        .unpersistCheckpointed(ckpt)
      ckpt = next
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter iterations — " +
        "raise maxIter (diameter exceeds it) or check the edge set")
    // the surviving checkpoint lives until the caller's drain, like
    // every other transient intermediate
    graft.core.TransientCache.registerCheckpointed(ckpt)
    labels
  }

  /** Pairs → clusters: each document with its component id (the minimal
    * doc id reachable through the pair graph), component size, and the
    * keeper flag. Downstream dedup keeps `is_keeper` rows. */
  def dedupClusters(nodes: DataFrame, idCol: String,
                    pairs: DataFrame): DataFrame =
    connectedComponents(nodes, idCol, pairs)
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("label"))))
      .select(col("id").as(idCol), col("label").as("cluster_id"),
        col("cluster_size"), (col("id") === col("label")).as("is_keeper"))

  // ---- D4: blocked n-gram Jaccard ----

  /** Exact n-gram Jaccard over a deterministic blocking scheme: each doc
    * is compared with its successor inside its block (lang here). The
    * window-lead pairing is the degenerate-but-deterministic form of
    * blocked comparison — the point is the Jaccard kernel and the
    * block-local shuffle, both of which survive any blocking choice.
    *
    * Only RAW TEXT crosses the block shuffle; the shingle sets are never
    * materialized as string arrays — the native
    * [[graft.functions.NgramJaccard]] kernel computes |∩|/|∪| per pair in
    * one JVM pass. Shuffling pre-built shingle arrays instead (the
    * declarative form below) moves ~n× the bytes per row and allocates a
    * string per shingle; measured 4.4 s → native kernel at sf0.1. The
    * two forms are value-identical (NativeTextExprSpec). */
  def blockedNgramJaccard(df: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text",
                          blockCol: String = "lang", n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col(blockCol)).orderBy(col(idCol))
    df.select(col(blockCol), col(idCol), col(textCol))
      .withColumn("next_id", lead(col(idCol), 1).over(w))
      .withColumn("next_text", lead(col(textCol), 1).over(w))
      .filter(col("next_id").isNotNull)
      .withColumn("jaccard",
        graft.functions.NgramJaccard(col(textCol), col("next_text"), n))
      .select(col(blockCol), col(idCol).as("id_a"),
        col("next_id").as("id_b"), col("jaccard"))
  }

  /** Blocked n-gram CONTAINMENT — [[blockedNgramJaccard]]'s pairing with
    * the asymmetric kernel |A∩B|/|A| ([[graft.functions.NgramContainment]]):
    * scores how much of the first document reappears in its successor,
    * which is what catches SUBSET duplication (quoted bodies, boilerplate-
    * wrapped articles) that symmetric Jaccard dilutes toward 0 as the
    * containing doc grows. Same one-key block shuffle, raw text only. */
  def blockedNgramContainment(df: DataFrame, idCol: String = "doc_id",
                              textCol: String = "text",
                              blockCol: String = "lang",
                              n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col(blockCol)).orderBy(col(idCol))
    df.select(col(blockCol), col(idCol), col(textCol))
      .withColumn("next_id", lead(col(idCol), 1).over(w))
      .withColumn("next_text", lead(col(textCol), 1).over(w))
      .filter(col("next_id").isNotNull)
      .withColumn("containment",
        graft.functions.NgramContainment(col(textCol), col("next_text"), n))
      .select(col(blockCol), col(idCol).as("id_a"),
        col("next_id").as("id_b"), col("containment"))
  }

  /** CROSS-DOCUMENT duplicated k-gram spans — the corpus-level
    * complement of the Gopher within-doc repetition signals: for every
    * document, how many of its k-token windows also occur in at least
    * one OTHER document (the "duplicated n-gram fraction" quality
    * signal of the RefinedWeb/CCNet recipes, and the detection half of
    * exact-substring dedup at fixed granularity).
    *
    * Exact, ONE gram-keyed exchange over one explode (the gram strings
    * are built and shuffled exactly once): a gram-partitioned window
    * marks multi-doc grams directly on the occurrence rows — "carried
    * by ≥ 2 DISTINCT docs" ⟺ min(doc_id) ≠ max(doc_id) over the gram
    * partition (a gram repeated only WITHIN a doc does not count — tx9
    * owns that signal) — and the qualifying occurrence rows count per
    * doc. The tokenized base persists once (it also feeds the n_spans
    * projection). Grams shuffle raw for oracle-exactness; a production
    * run at corpus scale would key them by a 128-bit hash
    * (collision-negligible, ~10× narrower shuffle rows) — same plan
    * shape. Skew note: a boilerplate gram clusters its OCCURRENCES
    * into one window partition (the sorter spills, it does not OOM);
    * a corpus where the same gram repeats heavily within documents
    * would re-insert the per-(gram, doc) count pre-aggregation ahead
    * of the window — one more exchange, doc-bounded partitions. Docs
    * shorter than k tokens surface with zero spans and a null ratio,
    * not silently dropped. */
  def duplicatedSpans(df: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= lit(""))
    // persisted: the tokenized base feeds the gram explode AND the final
    // n_spans projection — without it the split kernel runs twice
    val base = graft.core.TransientCache.persist(
      df.select(col(idCol), toks.as("toks")))
    val grams = when(size(col("toks")) >= k,
      transform(sequence(lit(0), size(col("toks")) - k),
        i => array_join(slice(col("toks"), i + lit(1), lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
    // ONE gram-keyed shuffle (the dd14 move): "≥ 2 distinct docs carry
    // this gram" ⟺ min(id) ≠ max(id) over the gram window, evaluated
    // directly on the exploded occurrences — the old
    // groupBy(gram, id) + count-over-window shape re-shuffled every
    // gram string a second time to re-cluster by gram alone. The
    // per-doc dup count is then a plain row count (Σ per-(gram,doc)
    // occurrence counts ≡ occurrence rows).
    val w = Window.partitionBy(col("gram"))
    val dupPerDoc = base.select(col(idCol), explode(grams).as("gram"))
      .withColumn("__min_id", min(col(idCol)).over(w))
      .withColumn("__max_id", max(col(idCol)).over(w))
      .filter(col("__min_id") =!= col("__max_id"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("dup_spans"))
    base.select(col(idCol),
        greatest(size(col("toks")) - (k - 1), lit(0))
          .cast("long").as("n_spans"))
      .join(dupPerDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_spans"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        when(col("n_spans") > 0,
          coalesce(col("dup_spans"), lit(0L)).cast("double") /
            col("n_spans")).as("dup_ratio"))
  }

  /** EXACT-SUBSTRING REMOVAL at fixed granularity — the surgery half
    * of [[duplicatedSpans]] (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" recipe, at k-token
    * window granularity): every k-token window whose gram occurs in
    * ≥ 2 distinct documents is CUT from every carrier except the
    * gram's first (min id) document, overlapping cut windows merge by
    * construction (a token is dropped when ANY removed window covers
    * it), and each document's text reassembles from its surviving
    * tokens. Document-level dedup (dd1) can't express this — no two
    * documents are equal; the boilerplate lives INSIDE them.
    *
    * Scale shape: one explode for the grams, ONE gram-keyed exchange
    * whose window aggregates carry both the keeper (min id) and the
    * multi-doc test (min ≠ max), then the removed window STARTS — not
    * k× exploded token indexes — shuffle per doc and fold into merged
    * disjoint cut intervals (O(cuts) rows; Σ interval lengths is the
    * covered-index union by disjointness). The rebuild tests each
    * token against the merged intervals — O(intervals) per token, not
    * O(removed tokens). Grams shuffle raw for oracle-exactness; a
    * corpus-scale run would key them by a 128-bit hash — same plan.
    * Skew note: as in [[duplicatedSpans]], a boilerplate gram clusters
    * its occurrences into one (spilling) window partition; the
    * agg+broadcast-join form is the fallback while per-gram stats fit
    * a broadcast. */
  def removeDuplicatedSpans(df: DataFrame, idCol: String = "doc_id",
                            textCol: String = "text",
                            k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toksExpr = filter(split(col(textCol), "\\s+"), t => t =!= lit(""))
    // persisted: the tokenized base feeds the gram explode AND the
    // final rebuild — without it the split kernel runs twice
    val base = graft.core.TransientCache.persist(
      df.select(col(idCol), toksExpr.as("toks")))
    val gramsP = base.select(col(idCol), posexplode(
      when(size(col("toks")) >= k,
        transform(sequence(lit(0), size(col("toks")) - k),
          i => array_join(slice(col("toks"), i + lit(1), lit(k)), " ")))
        .otherwise(array().cast("array<string>")))
      .as(Seq("pos", "gram")))
    // per gram: the keeper (smallest id — Lee et al.'s "keep one
    // occurrence") and whether ≥ 2 DISTINCT docs carry it, both as
    // window aggregates over ONE gram-keyed shuffle: "carried by ≥ 2
    // docs" ⟺ min(id) ≠ max(id), so the old groupBy(gram) + join-back
    // (a second gram-keyed pass shuffling every gram string again)
    // collapses into min/max over the gram partition (guide §2.4 one
    // exchange where two ran — measured 1.9 s → 0.93 s at sf0.1).
    val wGram = Window.partitionBy(col("gram"))
    val removedWin = gramsP
      .withColumn("keeper", min(col(idCol)).over(wGram))
      .withColumn("__maxid", max(col(idCol)).over(wGram))
      .filter(col("keeper") =!= col("__maxid") &&
        col(idCol) =!= col("keeper"))
      .select(col(idCol), col("pos"))
    // removed token ranges as MERGED CUT INTERVALS, not per-token
    // indices: each removed window covers [pos, pos+k-1]; sorting the
    // per-doc window starts and folding adjacent/overlapping ranges
    // shuffles O(cut windows) rows instead of exploding k× per-token
    // indices through a distinct (§2.3 shuffle fewer bytes). The
    // merged intervals are disjoint, so Σ lengths = |covered-index
    // union| and the rebuild membership test is O(intervals), not
    // O(removed tokens), per token.
    val spans = removedWin.groupBy(col(idCol))
      .agg(sort_array(collect_set(col("pos"))).as("starts"))
      .select(col(idCol), aggregate(col("starts"),
        array().cast("array<struct<a:int,b:int>>"),
        (acc, s) => when(
          size(acc) > 0 && s <= element_at(acc, -1)("b") + 1,
          concat(slice(acc, lit(1), size(acc) - 1), array(struct(
            element_at(acc, -1)("a").as("a"),
            greatest(element_at(acc, -1)("b"), s + lit(k - 1))
              .cast("int").as("b")))))
          .otherwise(concat(acc, array(struct(
            s.cast("int").as("a"),
            (s + lit(k - 1)).cast("int").as("b"))))))
        .as("ivs"))
    base.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        when(col("ivs").isNull, 0L)
          .otherwise(aggregate(col("ivs"), lit(0L),
            (n, iv) => n + iv("b") - iv("a") + 1))
          .as("removed_tokens"),
        array_join(filter(col("toks"), (t, i) =>
          !coalesce(exists(col("ivs"),
            iv => i >= iv("a") && i <= iv("b")), lit(false))), " ")
          .as("new_text"))
  }

  /** Paragraph-level exact dedup across the corpus — the RefinedWeb /
    * Falcon recipe at paragraph granularity: split each document on
    * `sep`, keep only the GLOBALLY FIRST occurrence of every distinct
    * paragraph (first = smallest (id, position)), and reassemble each
    * document from its surviving paragraphs in order. Boilerplate
    * repeated across millions of pages (headers, footers, license
    * blocks, cookie banners) disappears from every carrier but its
    * first, while unique prose survives untouched — removal that
    * document-level dedup (dd1) cannot express because no two
    * DOCUMENTS are equal.
    *
    * Scale shape: a narrow posexplode, ONE groupBy on the sha256
    * paragraph key (min-combining a single arithmetic order key —
    * map-side partial, O(distinct paragraphs) reduce state), one hash
    * join back on that key, and one groupBy(id) reassembly. No global
    * sort, nothing driver-side, and the corpus text crosses shuffles
    * only as the id-keyed reassembly payload — the dedup DECISION
    * travels as (64-hex hash, one long). The order key packs
    * (id, pos) as `id * 2^20 + pos` — ids must be non-negative and
    * documents under 2^20 paragraphs, the documented contract. */
  def paragraphDedup(df: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text",
                     sep: String = "\n\n"): DataFrame = {
    // persisted: the exploded/keyed paragraphs feed three consumers
    // (the first-occurrence aggregate, the keep-join probe, and the
    // per-doc paragraph counts) — without it the split+sha kernel runs
    // per consumer
    val paras = graft.core.TransientCache.persist(df
      .select(col(idCol), posexplode(
        split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "para")))
      .withColumn("h", sha2(col("para"), 256))
      .withColumn("okey", col(idCol) * lit(1048576L) + col("pos")))
    val first = paras.groupBy("h").agg(min("okey").as("first_okey"))
    val kept = paras.join(first, Seq("h"))
      .filter(col("okey") === col("first_okey"))
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(sep, transform(
          sort_array(collect_list(struct(col("pos"), col("para")))),
          p => p.getField("para"))).as("text_dedup"))
    // A document whose every paragraph first appeared elsewhere keeps
    // nothing — it must still come back (empty), not vanish.
    paras.groupBy(col(idCol)).agg(count(lit(1)).as("n_paras"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        col("n_paras"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** PassJoin-style distributed EDIT-DISTANCE similarity join (Li,
    * Deng & Feng, "PASS-JOIN: a partition-based method for similarity
    * joins", VLDB 2011 — public paper): every pair of documents whose
    * normalized key strings (`lower`, first `prefixLen` chars) are
    * within Levenshtein distance `k`, found EXACTLY and WITHOUT the
    * all-pairs product. The pigeonhole blocking: partition each string
    * of length m into k+1 contiguous segments; if ed(a, b) ≤ k with
    * |a| = m ≤ |b|, then b contains SOME segment of a verbatim, its
    * start shifted by at most k (≤ k edits can displace any position
    * by at most k) — so the index side emits its k+1 segments keyed
    * (m, i, seg), the probe side emits the substrings at every
    * in-window position for every candidate shorter length
    * m ∈ [n−k, n], and a hash join on the key finds every candidate
    * pair; native `levenshtein` verifies. Completeness is exact — the
    * oracle brute-forces the cross product and must agree pair for
    * pair.
    *
    * Scale shape: O(k²)-ish keys per row on each side ((k+1) segments;
    * (k+1)·(k+1)·(2k+1) probe substrings — 45 at k=2), ONE key shuffle,
    * verification bounded by true candidates. The position-and-length
    * context (m, i) in the key keeps common substrings from colliding
    * across unrelated alignments — residual hot keys (a boilerplate
    * segment shared by millions) would bound-cap like [[capBuckets]];
    * at gate scale the join stays exact-complete as the oracle
    * demands. Strings shorter than k+1 chars cannot be segmented and
    * are dropped (with `prefixLen` ≥ 16 that is a degenerate-document
    * edge, not a data path). */
  def editDistanceJoin(df: DataFrame, k: Int = 2, prefixLen: Int = 32,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(k >= 1 && prefixLen > k,
      s"editDistanceJoin needs k >= 1 and prefixLen > k (got $k, $prefixLen)")
    val q = k + 1
    def flo(m: Column): Column = (m / lit(q)).cast("int")
    def rem(m: Column): Column = m % lit(q)
    // even partition: the first (m mod q) segments take the extra char
    def segLen(m: Column, i: Column): Column =
      flo(m) + when(i < rem(m), 1).otherwise(0)
    def segStart(m: Column, i: Column): Column =
      i * flo(m) + least(i, rem(m))
    val base = graft.core.TransientCache.persist(
      df.select(col(idCol).as("id"),
          substring(lower(col(textCol)), 1, prefixLen).as("s"))
        .withColumn("len", length(col("s")))
        .filter(col("len") > k))
    val index = base.select(col("id").as("ida"), col("s").as("sa"),
        col("len"))
      .select(col("ida"), col("sa"), col("len").as("m"),
        explode(transform(sequence(lit(0), lit(k)), i =>
          struct(i.as("i"),
            col("sa").substr(segStart(col("len"), i) + 1,
              segLen(col("len"), i)).as("seg")))).as("e"))
      .select(col("ida"), col("sa"), col("m"),
        col("e.i").as("i"), col("e.seg").as("seg"))
    val n = col("len")
    val probeKeys = flatten(transform(
      sequence(greatest(lit(q), n - lit(k)), n), m =>
        flatten(transform(sequence(lit(0), lit(k)), i => {
          val sl = segLen(m, i)
          val lo = greatest(lit(0), segStart(m, i) - lit(k))
          val hi = least(segStart(m, i) + lit(k), n - sl)
          transform(
            when(lo <= hi, sequence(lo, hi))
              .otherwise(array().cast("array<int>")),
            p => struct(m.as("m"), i.as("i"),
              col("sb").substr(p + 1, sl).as("seg")))
        }))))
    val probe = base.select(col("id").as("idb"), col("s").as("sb"),
        col("len"))
      .select(col("idb"), col("sb"), explode(probeKeys).as("e"))
      .select(col("idb"), col("sb"),
        col("e.m").as("m"), col("e.i").as("i"), col("e.seg").as("seg"))
    index.join(probe, Seq("m", "i", "seg"))
      .filter(col("ida") =!= col("idb"))
      .select(when(col("ida") < col("idb"),
          struct(col("ida").as("id_a"), col("sa").as("s_a"),
            col("idb").as("id_b"), col("sb").as("s_b")))
        .otherwise(
          struct(col("idb").as("id_a"), col("sb").as("s_a"),
            col("ida").as("id_b"), col("sa").as("s_b"))).as("p"))
      .select("p.*").distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= k)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }

  /** The declarative reference form of [[blockedNgramJaccard]] (string
    * shingle arrays + array_intersect/array_union) — kept as the
    * independently-derived semantics the native kernel is pinned against. */
  def blockedNgramJaccardShingled(df: DataFrame, idCol: String = "doc_id",
                                  textCol: String = "text",
                                  blockCol: String = "lang",
                                  n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col(blockCol)).orderBy(col(idCol))
    val shingled = withShingles(df, textCol, n)
    shingled
      .withColumn("next_id", lead(col(idCol), 1).over(w))
      .withColumn("next_sh", lead(col("shingles"), 1).over(w))
      .filter(col("next_id").isNotNull)
      .withColumn("jaccard",
        size(array_intersect(col("shingles"), col("next_sh"))).cast("double") /
          size(array_union(col("shingles"), col("next_sh"))))
      .select(col(blockCol), col(idCol).as("id_a"),
        col("next_id").as("id_b"), col("jaccard"))
  }
}
