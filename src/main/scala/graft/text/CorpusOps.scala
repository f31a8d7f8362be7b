package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a training-data pipeline needs between
  * curation and the trainer: deterministic dataset splits and
  * token-budget sequence packing. Both are pure narrow/window plans —
  * no UDFs, no driver loops — and both are exactly re-derivable in SQL,
  * so they sit in the hash-exact oracle gate.
  */
object CorpusOps {

  /** Deterministic content-addressed split assignment: bucket 0–9 from
    * the first 16 bits of sha256(id), then train/valid/test by bucket
    * threshold. The split is a pure function of the id — stable across
    * runs, partitionings, cluster sizes, and engine versions, which is
    * the property that matters: a doc must NEVER migrate between train
    * and test when the corpus is re-processed or grows. (A `rand(seed)`
    * split breaks exactly this: Spark seeds per-partition, so adding one
    * upstream file reshuffles every assignment.) Scale: embarrassingly
    * parallel, zero shuffles. */
  def deterministicSplit(df: DataFrame, idCol: String = "doc_id",
                         trainBuckets: Int = 8,
                         validBuckets: Int = 1): DataFrame = {
    require(trainBuckets + validBuckets < 10,
      "train+valid buckets must leave at least one test bucket of 10")
    val bucket = conv(substring(sha2(col(idCol).cast("string"), 256), 1, 4),
      16, 10).cast("long") % 10
    df.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainBuckets, "train")
          .when(col("bucket") < trainBuckets + validBuckets, "valid")
          .otherwise("test"))
  }

  /** Stratified deterministic split: EXACT per-group train/valid/test
    * quotas by content-addressed rank, where [[deterministicSplit]]
    * only hits the target fractions in expectation. Within each
    * `groupCol` stratum the first `floor(trainFrac·n_g)` docs by
    * sha256 rank are train, the next `floor(validFrac·n_g)` valid, the
    * rest test — so a 40-doc language contributes exactly 32/4/4 and a
    * tiny stratum is never accidentally absent from eval. The rank is
    * the shared [[rebalanceMix]]/[[temperatureMix]] content-addressed
    * key: stable under repartitioning and reprocessing, and docs only
    * ever migrate at a stratum BOUNDARY when the stratum grows (the
    * deterministic-split stability property, traded for exactness).
    *
    * Scale: one count aggregate, the tiny per-group quota frame
    * broadcast back, and the sharded rank — no full-group
    * single-reducer sort ([[rebalanceMix]]'s layout). The quota
    * arithmetic (`floor(frac · n)`) is one IEEE-correctly-rounded
    * multiply + floor, bit-identical across engines. */
  def stratifiedSplit(df: DataFrame, groupCol: String = "lang",
                      idCol: String = "doc_id", trainFrac: Double = 0.8,
                      validFrac: Double = 0.1,
                      shards: Int = 16): DataFrame = {
    require(trainFrac > 0 && validFrac >= 0 && trainFrac + validFrac < 1,
      "train/valid fractions must leave a test remainder")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__gn"))
      .withColumnRenamed(groupCol, "__ss_group")
    contentRank(df, groupCol, idCol, shards)
      .withColumnRenamed("mix_rank", "strat_rank")
      .join(broadcast(counts), col(groupCol) <=> col("__ss_group"))
      .withColumn("n_train", floor(col("__gn") * trainFrac))
      .withColumn("n_valid", floor(col("__gn") * validFrac))
      .withColumn("split",
        when(col("strat_rank") <= col("n_train"), "train")
          .when(col("strat_rank") <= col("n_train") + col("n_valid"),
            "valid")
          .otherwise("test"))
      .drop("__ss_group", "__gn")
  }

  /** Whitespace token count — THE tokenization every corpus operator
    * here shares ([[packTokens]], the qf1 gate): non-empty
    * whitespace-separated runs, as a long. One definition so the
    * operators cannot drift apart. */
  def tokenCount(textCol: Column): Column =
    size(org.apache.spark.sql.functions.filter(
      split(textCol, "\\s+"), t => t =!= "")).cast("long")

  /** Corpus-relative quantile gate: keep rows whose `valueCol` reaches
    * their group's exact q-quantile — "drop the bottom half by length
    * per language" and friends, where the threshold is a property OF THE
    * CORPUS rather than a constant. Exact interpolated percentile (one
    * per group, tiny) computed in a group aggregate and broadcast back;
    * the wide table sees one narrow join, no window sort over data rows.
    * The join is NULL-SAFE on the group key: rows with a NULL group get
    * their own group's cut and flow through flagged like every other
    * row — a flag-style operator must never shrink the row set. Pair
    * with an integral `valueCol` (token counts) when the result must be
    * engine-exact: interpolation between integers is exact in doubles,
    * so the cut cannot drift by an ulp between engines.
    *
    * `exact = true` (default) computes the true interpolated percentile,
    * whose aggregation buffer is O(distinct values) per group — the
    * right trade for integral domains (token counts, byte lengths),
    * where distinct values are bounded. For CONTINUOUS domains (model
    * scores, perplexities) that buffer is O(group), so pass
    * `exact = false`: a GK sketch (`percentile_approx`) bounds the
    * buffer at O(accuracy) regardless of cardinality; the cut is then
    * an actual member value within rank error 1/accuracy rather than
    * an interpolation. */
  def quantileFilter(df: DataFrame, valueCol: String, q: Double,
                     groupCol: String = "lang", exact: Boolean = true,
                     accuracy: Int = 10000): DataFrame = {
    require(q > 0 && q < 1, "quantile must be in (0, 1)")
    val cutAgg =
      if (exact) percentile(col(valueCol), lit(q))
      else percentile_approx(col(valueCol), lit(q), lit(accuracy))
    val cuts = df.groupBy(col(groupCol))
      .agg(cutAgg.cast("double").as("cut"))
      .withColumnRenamed(groupCol, "__qf_group")
    df.join(broadcast(cuts), col(groupCol) <=> col("__qf_group"))
      .drop("__qf_group")
      .withColumn("kept", col(valueCol) >= col("cut"))
  }

  /** Monotone shard id from the leading bits of an already-uniform
    * lowercase-hex ordering key: `floor(first_byte * n / 256)`. Monotone
    * in the string ordering of the key (hex digits 0-9a-f are
    * ASCII-ascending), so ranking hierarchically per shard and adding the
    * count of earlier shards reproduces the GLOBAL rank exactly — while
    * no single task ever sorts more than ~1/n of a group. */
  private[text] def hexPrefixShard(hexCol: Column, n: Int): Column = {
    require(n >= 1 && n <= 256, "hex-prefix sharding supports 1..256 shards")
    floor(conv(substring(hexCol, 1, 2), 16, 10).cast("int") * n / 256)
      .cast("int")
  }

  /** Per-group range-shard assignment for an arbitrary numeric ordering
    * column: boundaries from `percentile_approx` (one tiny aggregate over
    * just (group, order) — column-pruned at the scan), shard = number of
    * boundaries ≤ the value. Monotone in `orderCol` BY CONSTRUCTION, so a
    * hierarchical prefix over shards equals the global prefix for ANY
    * boundary placement — approximation error moves work between shards,
    * never a row's result. Returns the frame with an `__shard` column. */
  private[text] def rangeShard(df: DataFrame, groupCol: String,
                               orderCol: String, n: Int): DataFrame = {
    require(n >= 1, "need at least one shard")
    if (n == 1) return df.withColumn("__shard", lit(0))
    val probs = (1 until n).map(_.toDouble / n)
    val bounds = df.groupBy(col(groupCol))
      .agg(percentile_approx(col(orderCol),
        typedLit(probs), lit(10000)).as("__bounds"))
      .withColumnRenamed(groupCol, "__rs_group")
    df.join(broadcast(bounds), col(groupCol) <=> col("__rs_group"), "left")
      .withColumn("__shard",
        coalesce(size(org.apache.spark.sql.functions.filter(
          col("__bounds"), b => b <= col(orderCol))), lit(0)))
      .drop("__rs_group", "__bounds")
  }

  /** Training-mixture rebalancing: select the LARGEST corpus subset
    * whose group composition matches `targets` exactly (up to integer
    * flooring), without replacement. The limiting group determines the
    * achievable total `M = min_g(n_g / t_g)`; every group then keeps a
    * quota of `floor(t_g * M)` documents, chosen deterministically by
    * content-addressed rank (sha256 of the id), so the selection is
    * stable under repartitioning and reprocessing — the same property
    * [[deterministicSplit]] guarantees, for the same reason. Rows whose
    * group is absent from `targets` (including NULL groups) are dropped
    * — they are not part of the requested mixture. A target group with
    * ZERO corpus rows makes the only composition-true answer the empty
    * selection: it caps `M` at 0, so every quota is 0 and everything is
    * `kept = false` — never a silently skewed mix that pretends the
    * missing group away. Scale: ONE count aggregate (the joined
    * per-group frame is tiny and reused for both the cap and the
    * quotas), one broadcast of the quota table, and a SHARDED rank — the
    * content-addressed ordering key (sha256) is uniform, so its leading
    * byte gives `shards` monotone, balanced blocks per group; each block
    * ranks locally and adds the broadcast count of earlier blocks, which
    * reproduces the global per-group rank exactly while no task ever
    * sorts more than ~1/shards of a group. (A plain
    * `Window.partitionBy(group)` sorts a whole language on one reducer —
    * the 100 TB killer this layout exists to avoid.) */
  def rebalanceMix(df: DataFrame, targets: Seq[(String, Double)],
                   groupCol: String = "lang",
                   idCol: String = "doc_id",
                   shards: Int = 16): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "every target share must be positive")
    require(targets.map(_._1).distinct.size == targets.size,
      "duplicate group in targets — each group gets exactly one share")
    val spark = df.sparkSession
    import spark.implicits._
    val t = targets.toDF(groupCol, "target_share")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_group"))
    // targets LEFT JOIN counts: a target group missing from the corpus
    // must participate with n_group = 0 (capping M at 0), not vanish
    // through an inner join
    val cj = t.join(counts, Seq(groupCol), "left")
      .withColumn("n_group", coalesce(col("n_group"), lit(0L)))
    val quota = cj
      .withColumn("m", min(col("n_group") / col("target_share"))
        .over(Window.partitionBy()))
      .select(col(groupCol),
        floor(col("target_share") * col("m")).cast("long").as("quota"))
    contentRank(df, groupCol, idCol, shards)
      .join(broadcast(quota), groupCol)
      .withColumn("kept", col("mix_rank") <= col("quota"))
  }

  /** The shared content-addressed per-group rank (`mix_rank`, 1-based
    * within `groupCol`, ordered by sha256 of the id): the deterministic
    * selection key of [[rebalanceMix]] and [[temperatureMix]] — stable
    * under repartitioning and reprocessing, uniform by construction.
    * Sharded exactly as documented on [[rebalanceMix]]: the sha's
    * leading byte gives monotone balanced blocks per group, each block
    * ranks locally, and the broadcast count of earlier blocks
    * reproduces the global rank with no task sorting more than
    * ~1/shards of a group. */
  private def contentRank(df: DataFrame, groupCol: String, idCol: String,
                          shards: Int): DataFrame = {
    // persisted: the sharded frame (with its per-row sha256) feeds both
    // the shard-count aggregate and the ranked output — without it the
    // hash runs over the corpus twice
    val sharded = graft.core.TransientCache.persist(df
      .withColumn("__sha", sha2(col(idCol).cast("string"), 256))
      // a NULL id hashes to NULL → shard 0, mirroring the single-window
      // layout where NULL sha ordered first; the row still ranks (nulls
      // first within the shard) instead of vanishing through an
      // unmatched equi-join
      .withColumn("__shard",
        coalesce(hexPrefixShard(col("__sha"), shards), lit(0))))
    val wLocal = Window.partitionBy(col(groupCol), col("__shard"))
      .orderBy(col("__sha"), col(idCol))
    val shardCounts = sharded.groupBy(col(groupCol), col("__shard"))
      .agg(count(lit(1)).as("__n"))
    // per-(group, shard) base = rows in earlier shards of the group; the
    // windowed frame here is ≤ groups × shards rows — trivially small
    val wShard = Window.partitionBy(col(groupCol)).orderBy(col("__shard"))
    val bases = shardCounts
      .withColumn("__base", coalesce(sum(col("__n"))
        .over(wShard.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol).as("__b_group"), col("__shard").as("__b_shard"),
        col("__base"))
    sharded
      .withColumn("__local_rank", row_number().over(wLocal))
      // null-safe on the group so NULL-group rows keep flowing to the
      // caller's documented drop point (its quota join), never an
      // accidental one here
      .join(broadcast(bases), col(groupCol) <=> col("__b_group") &&
        col("__shard") === col("__b_shard"))
      .withColumn("mix_rank",
        (col("__base") + col("__local_rank")).cast("long"))
      .drop("__sha", "__shard", "__local_rank", "__base", "__b_group",
        "__b_shard")
  }

  /** Temperature-based mixture resampling — the multilingual/DoReMi
    * reweighting shape: domain `g` is sampled proportionally to
    * `n_g^alpha` (alpha = 1 keeps the natural distribution, alpha → 0
    * flattens toward uniform), WITH replacement, so under-represented
    * domains repeat (epoch upsampling) while the head is subsampled.
    * Deterministic, no RNG: domain quotas `q_g = floor(budget · p_g)`
    * are dealt to documents by the shared content-addressed rank —
    * every doc gets `q_g div n_g` copies and the first `q_g mod n_g`
    * ranked docs one more, so Σ n_copies = q_g exactly and re-running
    * the job reproduces the same copies at any partitioning.
    * Materialize with the existing replication op
    * (`explode(array_repeat(struct(...), n_copies))` — P6's shape).
    *
    * Numeric contract (hash-exact oracle): `n_g^alpha` is rounded to a
    * 6-decimal grid and totaled as DECIMAL (pow may differ in the last
    * ulp between engines; decimal addition is order-free), and every
    * step after — decimal→double conversion, one division, one
    * multiplication, floor, integer div/mod — is IEEE-correctly-rounded
    * or integral, hence bit-identical across engines.
    *
    * Scale: one count aggregate over the corpus, the tiny per-group
    * share/quota frame broadcast back, and the sharded rank — no
    * full-group single-reducer sort anywhere. */
  def temperatureMix(df: DataFrame, budget: Long, alpha: Double = 0.5,
                     groupCol: String = "lang", idCol: String = "doc_id",
                     shards: Int = 16): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(alpha > 0, "alpha must be positive (alpha = 1 is natural)")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_group"))
    val scored = counts.withColumn("__s",
      round(pow(col("n_group").cast("double"), alpha), 6)
        .cast("decimal(28,6)"))
    val quota = scored
      .withColumn("__t", sum(col("__s")).over(Window.partitionBy()))
      .withColumn("mix_share",
        col("__s").cast("double") / col("__t").cast("double"))
      .withColumn("quota",
        floor(lit(budget.toDouble) * col("mix_share")).cast("long"))
      .select(col(groupCol).as("__q_group"), col("n_group"),
        col("mix_share"), col("quota"))
    contentRank(df, groupCol, idCol, shards)
      // null-safe: a NULL domain is still a domain of the mixture
      .join(broadcast(quota), col(groupCol) <=> col("__q_group"))
      .withColumn("n_copies",
        expr("quota div n_group") + // integral division, never float
          when(col("mix_rank") <= pmod(col("quota"), col("n_group")), 1L)
            .otherwise(0L))
      .drop("__q_group")
  }

  /** Token-budget sequence packing bookkeeping — the "concatenate the
    * corpus and cut every `budget` tokens" layout LLM pretraining uses.
    * Documents are laid out in deterministic order inside each block
    * (block = `blockCol`, the unit a packing worker owns; ordering by
    * id), and each doc gets its token offset plus the first/last sequence
    * index it lands in — a doc whose span crosses a boundary contributes
    * to multiple sequences (`n_chunks`). All-integral, exact at any
    * partitioning. Empty documents are dropped (they occupy no tokens).
    *
    * Scale shape: the prefix sum is HIERARCHICAL, not a single
    * per-block window — a plain `Window.partitionBy(block)` sorts one
    * whole block (at the default `lang` blocking: one entire language)
    * on one reducer. Instead each block is range-sharded on the numeric
    * id (boundaries from one tiny `percentile_approx` aggregate over
    * (block, id) — column-pruned at the scan), local prefix sums run
    * per (block, shard), and the broadcast per-shard token totals,
    * prefix-summed over the tiny (blocks × shards) frame, supply each
    * shard's base offset. Because the shard assignment is monotone in
    * the id, local + base equals the global doc_id-ordered prefix for
    * ANY boundary placement — the sketch's approximation error only
    * moves rows between shards, never changes an offset. A non-numeric
    * id falls back to `shards = 1` (the single-window layout) — range
    * boundaries need an ordered numeric domain. */
  def packTokens(df: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", blockCol: String = "lang",
                 budget: Int = 512, shards: Int = 16): DataFrame = {
    require(budget > 0, "budget must be positive")
    val numericId = df.schema(idCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    // shard BEFORE tokenizing: the boundary aggregate inside rangeShard
    // re-scans its input frame, and over the raw df that branch is a
    // column-pruned (block, id) scan — over a tokenized frame it would
    // re-run the tokenizer on every row. Persisted: the tokenized frame
    // feeds both the shard-total aggregate and the windowed output —
    // without the persist the tokenizer runs over the corpus twice.
    val sharded = graft.core.TransientCache.persist(
      rangeShard(df, blockCol, idCol, if (numericId) shards else 1)
        .withColumn("n_tokens", tokenCount(col(textCol)))
        .filter(col("n_tokens") > 0))
    val wLocal = Window.partitionBy(col(blockCol), col("__shard"))
      .orderBy(col(idCol))
    val shardTotals = sharded.groupBy(col(blockCol), col("__shard"))
      .agg(sum(col("n_tokens")).as("__shard_tokens"))
    val wShard = Window.partitionBy(col(blockCol)).orderBy(col("__shard"))
    val bases = shardTotals
      .withColumn("__base", coalesce(sum(col("__shard_tokens"))
        .over(wShard.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(blockCol).as("__b_block"), col("__shard").as("__b_shard"),
        col("__base"))
    sharded
      .withColumn("__local_off",
        coalesce(sum(col("n_tokens"))
          .over(wLocal.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // null-safe on the block: a NULL-block row is its own block in the
      // window layout and must not vanish through an unmatched equi-join
      .join(broadcast(bases), col(blockCol) <=> col("__b_block") &&
        col("__shard") === col("__b_shard"))
      .withColumn("token_offset", col("__base") + col("__local_off"))
      .withColumn("first_seq", expr(s"token_offset div $budget"))
      .withColumn("last_seq",
        expr(s"(token_offset + n_tokens - 1) div $budget"))
      .withColumn("n_chunks", col("last_seq") - col("first_seq") + 1)
      .select(col(idCol), col(blockCol), col("n_tokens"),
        col("token_offset"), col("first_seq"), col("last_seq"),
        col("n_chunks"))
  }

  /** Context-window chunking — split documents into overlapping
    * token-window chunks (`maxTokens` per chunk, advancing by
    * `maxTokens − overlap`), the layout step that turns variable-length
    * documents into model-sized training sequences while the overlap
    * preserves cross-boundary context. Whitespace tokens here; a real
    * tokenizer changes the split expression, not the operator shape.
    *
    * Purely narrow: tokenize → per-row `sequence` of chunk starts →
    * explode → slice/concat — no shuffle at any scale, and the chunk
    * count per row is ⌈(n−overlap)/stride⌉ so a pathological document
    * cannot fan out unboundedly (documents ≤ maxTokens yield exactly
    * one chunk). Emits the chunk's token count and content hash rather
    * than the text (the gate cannot carry megabyte columns; callers
    * wanting text select `chunk_text` before the drop). */
  def chunkDocs(docs: DataFrame, maxTokens: Int = 64, overlap: Int = 16,
                idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    require(overlap >= 0 && overlap < maxTokens,
      "overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    docs
      .withColumn("__toks", toks)
      .withColumn("__n", size(col("__toks")))
      // chunk starts: 0, stride, 2·stride, … while start < max(n−overlap, 1)
      .withColumn("__starts",
        sequence(lit(0),
          greatest(ceil((col("__n") - lit(overlap)).cast("double") /
            stride).cast("int") - 1, lit(0)) * stride,
          lit(stride)))
      .select(col(idCol), col("__n").as("doc_tokens"),
        posexplode(col("__starts")).as(Seq("chunk_id", "__start")),
        col("__toks"))
      .withColumn("chunk_text",
        concat_ws(" ",
          slice(col("__toks"), col("__start") + 1, lit(maxTokens))))
      .withColumn("chunk_tokens",
        least(col("doc_tokens") - col("__start"), lit(maxTokens)))
      .withColumn("chunk_sha", sha2(col("chunk_text"), 256))
      .select(col(idCol), col("chunk_id"), col("doc_tokens"),
        col("chunk_tokens"), col("chunk_sha"))
  }

  /** Benchmark decontamination — flag every corpus document sharing at
    * least one `n`-gram with an evaluation set (the overlap check a
    * training pipeline runs before any benchmark number is reportable).
    *
    * Scale shape: the EVAL side is a benchmark — thousands of documents,
    * not billions — so its distinct shingle set broadcasts; the corpus
    * side is a narrow explode into a broadcast LEFT SEMI join, so the
    * 100 TB corpus is never shuffled: only the matched doc ids (a tiny
    * set) go through the distinct, and the final flag join is id-to-id.
    * If the eval side ever outgrows broadcast, the same plan degrades
    * gracefully to a shuffled semi-join on the shingle hash — the
    * operator's shape, explode → semi-join → distinct ids, is unchanged.
    * Shingling follows the corpus convention (whole text as one shingle
    * below `n` tokens, so short eval items still match verbatim copies)
    * through the native one-pass [[graft.functions.ShingleHashes]]
    * kernel — the declarative string-shingle form re-tokenizes
    * interpreted per position and measured 10× slower on the corpus
    * sweep; matching on 64-bit shingle hashes is exact up to ~2⁻⁶⁴
    * collisions, the same contract as the LSH verify kernels. */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, n: Int = 8,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val evalSh = evalDocs
      .select(explode(graft.functions.ShingleHashes(col(textCol), n))
        .as("__sh")).distinct()
    val hits = docs
      .select(col(idCol),
        explode(graft.functions.ShingleHashes(col(textCol), n)).as("__sh"))
      .join(broadcast(evalSh), Seq("__sh"), "left_semi")
      .select(col(idCol)).distinct()
    docs.join(hits.withColumn("contaminated", lit(true)),
        Seq(idCol), "left")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
  }
}
