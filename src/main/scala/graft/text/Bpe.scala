package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BpeEncode, BpeMergePair}

/** Distributed BPE tokenizer training (Sennrich et al. 2016) — learn a
  * subword merge list FROM the corpus, the step a training-data
  * pipeline runs between curation and tokenization when the tokenizer
  * is trained on the data it will encode.
  *
  * Shape is the paper's word-dictionary form, distributed: the corpus
  * collapses ONCE to `(word, freq)` types (the only pass over the
  * documents — everything after is over the dictionary, which is
  * O(vocabulary), not O(corpus)); each word becomes its character
  * sequence; then per merge round (1) adjacent symbol pairs are counted
  * weighted by word frequency — a map-side-combined aggregate over the
  * dictionary, (2) the argmax pair (ties broken lexicographically, so
  * training is deterministic) becomes the next merge, (3) one narrow
  * native projection ([[graft.functions.BpeMergePair]]) rewrites the
  * symbol arrays. No shuffle ever carries the corpus itself.
  *
  * At 100 TB the dictionary is maybe 10⁸ word types — the per-round
  * aggregate is over that, ~10³× smaller than the corpus, and the
  * round count is the vocabulary budget, not a function of data size.
  * Each round's dictionary is `localCheckpoint`ed, not merely
  * persisted: the pair extraction references the symbol array twice,
  * so nested lineage would double the analyzed expression tree per
  * round (measured exponential); the checkpoint keeps every round
  * O(dictionary) flat.
  *
  * [[encode]] applies the learned list as ONE projection
  * ([[graft.functions.BpeEncode]] — merges ride as literals), giving
  * subword sequences/counts without a join. */
object Bpe {

  /** One learned merge: replace adjacent `(left, right)` with
    * `left+right`; `freq` is the weighted pair count that won the
    * round. */
  final case class Merge(rank: Int, left: String, right: String,
                         freq: Long)

  /** The `(word, freq, symbols)` dictionary the trainer iterates on —
    * exposed for [[train]]'s callers that also want to [[encode]]
    * without re-tokenizing. */
  def wordDict(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(filter(split(lower(col(textCol)), "\\s+"),
        t => t =!= "")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("symbols",
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))))

  /** Learn up to `nMerges` merges from the corpus. Stops early when no
    * pair reaches `minPairFreq` (weighted). Deterministic: the corpus
    * determines the dictionary, and every argmax tie breaks on
    * (left, right) lexicographic order. */
  def train(df: DataFrame, textCol: String = "text", nMerges: Int = 40,
            minPairFreq: Long = 2L): Seq[Merge] = {
    require(nMerges >= 1, "need at least one merge round")
    // EVERY round checkpoints (not persists): the pair extraction
    // references `symbols` twice, so a lineage that nests round k's
    // rewrite inside round k+1's would DOUBLE the analyzed expression
    // tree per round — measured exponential (0.5 s/round flat with
    // checkpoints vs 200 s by round 18 without). localCheckpoint cuts
    // the plan at the materialized rows; TransientCache frees the
    // checkpoint RDDs at the caller's drain (the dd7 pattern).
    var words = graft.core.TransientCache.registerCheckpointed(
      wordDict(df, textCol).localCheckpoint(true))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (!done && merges.length < nMerges) {
      val top = words
        .select(col("freq"), explode(zip_with(
          slice(col("symbols"), lit(1), size(col("symbols")) - 1),
          slice(col("symbols"), lit(2), size(col("symbols")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l"), col("p.r"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty || top.head.getLong(2) < minPairFreq) done = true
      else {
        val (l, r, n) =
          (top.head.getString(0), top.head.getString(1),
            top.head.getLong(2))
        merges += Merge(merges.length, l, r, n)
        words = graft.core.TransientCache.registerCheckpointed(
          words.withColumn("symbols", BpeMergePair(col("symbols"), l, r))
            .localCheckpoint(true))
      }
    }
    merges.toSeq
  }

  /** Reference single-threaded trainer over a collected dictionary —
    * the independent semantics [[train]] is graded against (spec + the
    * gate row's self-check). Same tie-break, same stop rule. */
  private[text] def trainReference(dict: Seq[(String, Long)],
                                   nMerges: Int,
                                   minPairFreq: Long = 2L): Seq[Merge] = {
    var words = dict.map { case (w, f) =>
      (w.map(_.toString).toVector, f)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (!done && merges.length < nMerges) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (n < minPairFreq) done = true
        else {
          merges += Merge(merges.length, l, r, n)
          words = words.map { case (syms, f) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                out += (l + r); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), f)
          }
        }
      }
    }
    merges.toSeq
  }

  /** Single-word reference encode: apply the learned merges in rank
    * order over the character sequence and return the subword count —
    * the local ground truth [[graft.functions.BpeEncode]]'s kernel is
    * checked against (bp1's in-row evidence). */
  private[text] def referenceTokens(word: String,
                                    merges: Seq[Merge]): Int = {
    var syms = word.map(_.toString).toVector
    merges.sortBy(_.rank).foreach { m =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == m.left &&
          syms(i + 1) == m.right) { out += (m.left + m.right); i += 2 }
        else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms.length
  }

  /** Encode: per-doc subword token sequence lengths under a learned
    * merge list — character count collapses to `bpe_tokens` as merges
    * apply. One narrow projection; the merges travel as literals. */
  def encode(df: DataFrame, merges: Seq[Merge],
             textCol: String = "text"): DataFrame = {
    val pairs = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val words = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    df.withColumn("bpe_tokens",
      aggregate(
        transform(words, w => size(BpeEncode(
          transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
          pairs))),
        lit(0), (acc, x) => acc + x))
  }
}
