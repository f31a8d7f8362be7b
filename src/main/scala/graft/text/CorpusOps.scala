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
    * so the cut cannot drift by an ulp between engines. */
  def quantileFilter(df: DataFrame, valueCol: String, q: Double,
                     groupCol: String = "lang"): DataFrame = {
    require(q > 0 && q < 1, "quantile must be in (0, 1)")
    val cuts = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(q)).as("cut"))
      .withColumnRenamed(groupCol, "__qf_group")
    df.join(broadcast(cuts), col(groupCol) <=> col("__qf_group"))
      .drop("__qf_group")
      .withColumn("kept", col(valueCol) >= col("cut"))
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
    * quotas), one broadcast of the quota table, one rank window per
    * group — no global sort, no collect of data rows. */
  def rebalanceMix(df: DataFrame, targets: Seq[(String, Double)],
                   groupCol: String = "lang",
                   idCol: String = "doc_id"): DataFrame = {
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
    val w = Window.partitionBy(col(groupCol))
      .orderBy(sha2(col(idCol).cast("string"), 256), col(idCol))
    df.withColumn("mix_rank", row_number().over(w).cast("long"))
      .join(broadcast(quota), groupCol)
      .withColumn("kept", col("mix_rank") <= col("quota"))
  }

  /** Token-budget sequence packing bookkeeping — the "concatenate the
    * corpus and cut every `budget` tokens" layout LLM pretraining uses.
    * Documents are laid out in deterministic order inside each block
    * (block = `blockCol`, the unit a packing worker owns; ordering by
    * id), and each doc gets its token offset plus the first/last sequence
    * index it lands in — a doc whose span crosses a boundary contributes
    * to multiple sequences (`n_chunks`). All-window, all-integral: one
    * shuffle on the block key, exact at any partitioning. Empty documents
    * are dropped (they occupy no tokens). */
  def packTokens(df: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", blockCol: String = "lang",
                 budget: Int = 512): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(blockCol)).orderBy(col(idCol))
    df.withColumn("n_tokens", tokenCount(col(textCol)))
      .filter(col("n_tokens") > 0)
      .withColumn("token_offset",
        coalesce(sum(col("n_tokens"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("first_seq", expr(s"token_offset div $budget"))
      .withColumn("last_seq",
        expr(s"(token_offset + n_tokens - 1) div $budget"))
      .withColumn("n_chunks", col("last_seq") - col("first_seq") + 1)
      .select(col(idCol), col(blockCol), col("n_tokens"),
        col("token_offset"), col("first_seq"), col("last_seq"),
        col("n_chunks"))
  }
}
