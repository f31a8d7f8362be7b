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
    val toks: Column = org.apache.spark.sql.functions.filter(
      split(col(textCol), "\\s+"), t => t =!= "")
    val w = Window.partitionBy(col(blockCol)).orderBy(col(idCol))
    df.withColumn("n_tokens", size(toks).cast("long"))
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
