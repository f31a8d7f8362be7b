package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: language ID, quality scoring, token counting,
  * content fingerprinting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs): at 100 TB these are single-pass narrow scans — the only
  * shuffle anywhere here is an optional final aggregate.
  */
object TextStats {

  /** Stopword profiles for the n-gram/stopword language-ID heuristic.
    * Deliberately tiny and frozen: the operator contract is the scoring
    * rule, not the lexicon. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "es" -> Seq("el", "los", "de", "y", "un", "es", "en", "que"))

  private def tokens(c: Column): Column = split(c, "\\s+")

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Language ID: CJK codepoint ratio decides zh; otherwise the profile
    * with the most stopword hits wins, ties broken by the fixed profile
    * order (en > fr > de > es); no hits at all → "und".
    *
    * The token array is materialized ONCE into a column and referenced by
    * every `hits_*` column: each profile rebuilding `split(text)` would
    * re-tokenize the document 5× (and CollapseProject keeps a multiply-
    * referenced alias, so the single split survives optimization) — at a
    * 100 TB corpus scan that is the dominant cost of the operator. */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame =
    langIdTokenized(df.withColumn("__toks", tokens(col(textCol))), textCol)
      .drop("__toks")

  /** [[langId]] over a pre-tokenized `__toks` column — lets a cascade
    * ([[Curation.annotate]]) tokenize once and share the array between
    * langId and quality instead of splitting the text per stage. */
  private[text] def langIdTokenized(df: DataFrame,
                                    textCol: String = "text"): DataFrame = {
    val withHits = langProfiles.foldLeft(df) { case (acc, (lang, words)) =>
      acc.withColumn(s"hits_$lang", hits(col("__toks"), words))
    }.withColumn("cjk_chars",
      length(regexp_replace(col(textCol), "[^\\x{4e00}-\\x{9fff}]", "")))
      .withColumn("n_tokens", size(col("__toks")))
    val best = langProfiles.map(_._1).foldRight(lit("und")) {
      case (lang, elseCol) =>
        val isMax = langProfiles.map(_._1).filter(_ != lang)
          .map(o => col(s"hits_$lang") >= col(s"hits_$o"))
          .reduce(_ && _)
        when(col(s"hits_$lang") > 0 && isMax, lit(lang)).otherwise(elseCol)
    }
    withHits.withColumn("predicted_lang",
      when(col("cjk_chars") * 3 > length(col(textCol)), lit("zh"))
        .otherwise(best))
  }

  /** Quality scoring: the shape/char-class ratios a pretraining filter
    * keys on (C4/Gopher-style length + symbol + stopword heuristics). */
  def quality(df: DataFrame, textCol: String = "text"): DataFrame =
    qualityTokenized(df.withColumn("__toks", tokens(col(textCol))), textCol)
      .drop("__toks")

  /** [[quality]] over a pre-tokenized `__toks` column (see
    * [[langIdTokenized]]). Every `size(tokens(t))` would otherwise be
    * its own split tree. */
  private[text] def qualityTokenized(df: DataFrame,
                                     textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nToks = size(col("__toks"))
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_tokens", nToks)
      .withColumn("avg_token_len",
        (length(t) - nToks + 1).cast("double") / nToks)
      .withColumn("alpha_ratio",
        length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") / length(t))
      .withColumn("digit_ratio",
        length(regexp_replace(t, "[^0-9]", "")).cast("double") / length(t))
      .withColumn("punct_ratio",
        length(regexp_replace(t, "[A-Za-z0-9\\s]", "")).cast("double") /
          length(t))
      .withColumn("stopword_ratio",
        hits(col("__toks"), langProfiles.head._2).cast("double") / nToks)
  }

  /** The shared tokenizer, exposed for cascades that pre-tokenize. */
  private[text] def tokenize(textCol: String): Column =
    tokens(col(textCol))

  /** Token counting, two ways: whitespace tokens and a BPE-ish regex
    * lexer (letter runs / digit runs / single non-space symbols) — the
    * latter approximates subword-tokenizer input counts. */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("ws_tokens", size(tokens(col(textCol))))
      .withColumn("lex_tokens",
        size(regexp_extract_all(col(textCol),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))))

  /** Content fingerprint: 16-hex-char prefix of sha256 over
    * whitespace-normalized lowercase text — the exact-dedup key that
    * survives formatting noise. */
  def fingerprint(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("fingerprint",
      substring(sha2(
        regexp_replace(lower(trim(col(textCol))), "\\s+", " "), 256), 1, 16))

  /** Gopher-style repetition profiling + flag
    * ([[graft.functions.RepetitionProfile]] — one native JVM pass per
    * document, no shuffle): duplicate-line counts, duplicate-line
    * character mass, most-frequent-bigram and duplicated-5-gram counts,
    * and `repetitive` — the filter verdict with the Gopher fraction
    * thresholds (0.30 dup lines, 0.20 dup line chars, 0.20 top bigram,
    * 0.15 dup 5-grams) applied as exact integer cross-products, so the
    * flag never touches float division. */
  def repetition(df: DataFrame, textCol: String = "text"): DataFrame = {
    // NULL text profiles as EMPTY (all-zero counts, repetitive=false),
    // not as NULL counts: a downstream filter(!repetitive) must keep
    // NULL-text docs, and the gate oracle's COALESCE(…, 0) says the same
    val profiled = df.withColumn("__rep",
      graft.functions.RepetitionProfile(coalesce(col(textCol), lit(""))))
    val flat = graft.functions.RepetitionProfile.schema.fieldNames
      .foldLeft(profiled)((acc, f) => acc.withColumn(f, col(s"__rep.$f")))
      .drop("__rep")
    flat.withColumn("repetitive",
      (col("dup_lines") * 10 > col("n_lines") * 3) ||
        (col("dup_line_chars") * 5 > col("line_chars")) ||
        (col("top_bigram") * 5 > col("n_bigrams")) ||
        (col("dup_5grams") * 20 > col("n_5grams") * 3))
  }

  /** PII patterns shared by the scrub and its oracle. Deliberately
    * RE2-compatible (character classes + bounded quantifiers, no
    * lookaround/backreference) so the SAME pattern strings run under
    * Java's engine here and RE2 in DuckDB with identical matches —
    * both engines are leftmost-first with greedy quantifiers on this
    * subset. Each pattern pairs with its replacement placeholder. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("id", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<ID>"))

  /** PII scrubbing — the redaction stage every published training
    * corpus runs before release: counts each PII class, then replaces
    * matches with typed placeholders. ONE narrow projection per
    * document (counts via `regexp_extract_all` size, rewrite via a
    * `regexp_replace` chain) — no shuffle, no UDF, everything inside
    * whole-stage codegen; at 100 TB this is a map-only pass whose cost
    * is the regex scans themselves. Order matters and is fixed: emails
    * scrub before IPv4 so a numeric mail host can't double-count; the
    * counts are taken against the SAME intermediate text the rewrite
    * sees, so `n_<class>` always equals the placeholders inserted. */
  def piiScrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val scrubbed = piiPatterns.foldLeft(df) {
      case (acc, (name, pattern, repl)) =>
        val src =
          if (acc.columns.contains("__pii_text")) col("__pii_text")
          else col(textCol)
        acc.withColumn(s"n_$name",
            size(regexp_extract_all(src, lit(pattern), lit(0))))
          .withColumn("__pii_text", regexp_replace(src, pattern, repl))
    }
    scrubbed.withColumn("text_scrubbed", col("__pii_text"))
      .drop("__pii_text")
  }

  /** Corpus-trained unigram language-model scoring — the CCNet
    * perplexity-filter SHAPE (train an LM on a reference corpus, score
    * each document by its average negative log-likelihood, filter the
    * tail) with a unigram model standing in for KenLM's 5-gram: the
    * pipeline topology, cost model and join/aggregate structure are
    * identical, only the conditioning context is shorter. High
    * `avg_nll` = improbable tokens = gibberish/rare-vocabulary
    * documents; the canonical use is `filter(avg_nll < cutoff)` or
    * quantile bucketing ([[CorpusOps]]).
    *
    * Scale shape — two shuffles, each over SHRINKING data:
    *  1. `(doc, token)` occurrence counts — map-side combine collapses
    *     repeated tokens before the exchange;
    *  2. the corpus frequency as `sum over (PARTITION BY token)` — a
    *     value every row of a token partition shares, so ONE
    *     token-keyed exchange replaces the classic
    *     vocabulary-aggregate + join-back (which shuffled (1)'s
    *     output by token twice) — then the per-doc re-aggregation.
    * The corpus total N is one 1-row aggregate. Nothing ever re-reads
    * the documents table after pass (1). Window partitions are
    * bounded by a token's distinct DOCS (pass (1) already combined
    * within-doc repeats); a stopword-class token spills, not OOMs.
    *
    * Numeric contract (what makes the row HASH-exact against a DuckDB
    * oracle): each distinct corpus count's token NLL `-ln(c/N)` is
    * rounded to a fixed 6-decimal grid and summed as DECIMAL — decimal
    * addition is exact and associative, so the per-document sum is
    * independent of Spark's (and DuckDB's) aggregation order; the two
    * engines' `ln` may differ in the last ulp, which the grid absorbs.
    * The emitted `sum_nll` is the decimal cast to DOUBLE (exact), and
    * `avg_nll` one correctly-rounded division — no decimal column
    * reaches the output surface (the mv1 lesson). */
  def unigramNll(df: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val toks = df.select(col(idCol),
      explode(filter(split(lower(col(textCol)), "\\s+"), t => t =!= ""))
        .as("__token"))
    val perDoc = graft.core.TransientCache.persist(
      toks.groupBy(col(idCol), col("__token"))
        .agg(count(lit(1)).as("__m")))
    // corpus size: one 1-row aggregate (a scalar the per-token NLL
    // expression folds as a literal)
    val n = perDoc.agg(sum("__m")).collect().head.getLong(0)
    val nll = round(-log(col("__c").cast("double") / n.toDouble), 6)
      .cast("decimal(28,6)")
    // corpus frequency as a window sum over ONE token-keyed exchange:
    // the groupBy(token) + join-back shape shuffled perDoc by token
    // twice (once to build the vocab, once to probe it) for a value
    // every row of the token partition shares (the dd13/dd14 move).
    perDoc
      .withColumn("__c",
        sum(col("__m")).over(Window.partitionBy(col("__token"))))
      .groupBy(col(idCol))
      .agg(sum(col("__m")).as("n_tokens"),
        sum(col("__m") * nll).cast("double").as("sum_nll"))
      .withColumn("avg_nll", col("sum_nll") / col("n_tokens"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling") — score every document
    * by how much more likely its tokens are under a TARGET distribution
    * (a curated subset: Wikipedia-like, a chosen language, a trusted
    * source) than under the raw-corpus SOURCE distribution:
    * `log w(x) = Σ_tokens [log p_target(tok) − log p_source(tok)]`,
    * with hashed-bucket bag-of-words models standing in for the paper's
    * hashed n-grams. Positive `logw_sum` = target-like; the canonical
    * use is "keep the top fraction by weight" (compose with
    * [[CorpusOps.quantileFilter]]) or the paper's resampling.
    *
    * Both models use add-one smoothing over `buckets` hash buckets, so
    * a token never seen in the target contributes a finite penalty
    * instead of −∞. The bucket is the first 16 bits of sha256(token)
    * mod `buckets` — the engine-portable hash this repo already uses
    * for content-addressed assignment ([[CorpusOps.deterministicSplit]]).
    *
    * Scale shape — the [[unigramNll]] template, with the vocabulary
    * compressed to ≤ `buckets` rows: (1) one `(doc, token)` count
    * shuffle with map-side combine, AFTER which the sha256 bucket is
    * computed once per distinct (doc, token) row — the hash depends
    * only on the token, so hashing post-aggregate does the expensive
    * work per distinct row instead of per occurrence (Zipf widens
    * that gap with corpus size); (2) the `(doc, bucket)` re-count —
    * tiny, map-side combined; (3) bucket statistics — an O(B)
    * aggregate with the target side counted by a conditional sum, so
    * ONE pass serves both models; (4) the per-doc score — (2) joined
    * to the broadcast-sized bucket table and re-aggregated by doc.
    * Token totals are two scalar aggregates. Nothing re-reads the
    * corpus after pass (1).
    *
    * Numeric contract (hash-exact oracle, the [[unigramNll]] trick):
    * each bucket's two log-probs are rounded to a 6-decimal grid and
    * their DIFFERENCE taken as DECIMAL (exact), the per-doc sum is
    * decimal (order-free), and the emitted doubles are one exact cast
    * plus one correctly-rounded division. */
  def dsirWeights(df: DataFrame, targetPred: Column,
                  textCol: String = "text", idCol: String = "doc_id",
                  buckets: Int = 1024): DataFrame = {
    require(buckets >= 2 && buckets <= 65536,
      "bucket count must fit the 16-bit hash prefix")
    val toks = df.select(col(idCol), targetPred.as("__in_target"),
      explode(filter(split(lower(col(textCol)), "\\s+"), t => t =!= ""))
        .as("__token"))
    // count per (doc, token) FIRST, hash after: the sha256+hex-conv
    // bucket function is the expensive per-row work, and it only
    // depends on the token — aggregating to per-doc distinct tokens
    // before computing it evaluates the hash once per distinct
    // (doc, token) instead of once per occurrence (guide §2.3 /
    // aggregate-before-expensive-expression; Zipf makes the gap grow
    // with corpus size). The extra exchange carries per-doc distinct
    // rows, map-side combined — far fewer bytes than the hashes saved.
    val perTok = toks
      .groupBy(col(idCol), col("__in_target"), col("__token"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__bucket",
        conv(substring(sha2(col("__token"), 256), 1, 4), 16, 10)
          .cast("long") % buckets)
    val perDoc = graft.core.TransientCache.persist(
      perTok.groupBy(col(idCol), col("__in_target"), col("__bucket"))
        .agg(sum(col("__c")).as("__m")))
    val stats = perDoc.groupBy("__bucket")
      .agg(sum(col("__m")).as("__cs"),
        sum(when(col("__in_target"), col("__m")).otherwise(0L)).as("__ct"))
    val totals = perDoc.agg(
      sum(col("__m")).as("__ns"),
      sum(when(col("__in_target"), col("__m")).otherwise(0L)).as("__nt"))
      .collect().head
    val ns = totals.getLong(0).toDouble + buckets
    val nt = totals.getLong(1).toDouble + buckets
    val logT = round(log((col("__ct") + 1).cast("double") / nt), 6)
      .cast("decimal(28,6)")
    val logS = round(log((col("__cs") + 1).cast("double") / ns), 6)
      .cast("decimal(28,6)")
    perDoc.join(stats, Seq("__bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("__m")).as("n_tokens"),
        sum(col("__m") * (logT - logS)).cast("double").as("logw_sum"),
        first(col("__in_target")).as("in_target"))
      .withColumn("logw_avg", col("logw_sum") / col("n_tokens"))
      .withColumn("target_like", col("logw_sum") > 0)
  }

  /** PMI collocation mining — the classic corpus-statistics operator
    * (Church & Hanks 1990): score adjacent token pairs by pointwise
    * mutual information `ln(P(ab) / (P(a)·P(b)))`, surfacing
    * multi-word expressions ("san francisco") a tokenizer or phrase
    * normalizer should treat as units. `minCount` keeps the classic
    * low-frequency PMI explosion out of the result.
    *
    * Scale shape: one `(bigram)` count shuffle with map-side combine
    * (the corpus collapses to O(distinct bigrams) immediately), one
    * unigram aggregate derived from the SAME pass's data, two
    * vocabulary joins (AQE broadcasts them at gate scale; shuffle-hash
    * on token at 100 TB), and two scalar totals. Nothing re-reads the
    * corpus after the first pass.
    *
    * Numeric contract: counts and totals are exact longs; the ratio is
    * a fixed sequence of correctly-rounded double ops, and the `ln` is
    * grid-rounded to 6 decimals (the [[unigramNll]] trick) so an
    * engine's last-ulp `ln` difference cannot move the surface. */
  def pmiBigrams(df: DataFrame, textCol: String = "text",
                 minCount: Long = 5L): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    val pairs = graft.core.TransientCache.persist(
      df.select(explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("n_pair")))
    // unigram counts from the same bigram table: every token position
    // except each document's last contributes one w1; the last
    // contributes a w2 — counting BOTH sides and halving would
    // miscount boundaries, so unigrams come from their own pass over
    // the token stream (still one aggregate over O(corpus tokens),
    // map-side combined to O(vocabulary))
    val uni = graft.core.TransientCache.persist(
      df.select(explode(toks).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n_w")))
    val nTok = uni.agg(sum(col("n_w"))).collect().head.getLong(0).toDouble
    val nPairs = pairs.agg(sum(col("n_pair"))).collect().head
      .getLong(0).toDouble
    pairs.filter(col("n_pair") >= minCount)
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_w1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_w2")), Seq("w2"))
      .withColumn("pmi",
        round(log((col("n_pair").cast("double") * nTok * nTok) /
          (lit(nPairs) * col("n_w1") * col("n_w2"))), 6))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"),
        col("n_w2"), col("pmi"))
  }

  /** BM25 relevance ranking (Robertson & Walker 1994, the Lucene
    * `+1`-idf form so every term contributes positively) for a FIXED
    * query term set — the retrieval primitive curation and
    * decontamination pipelines run against their corpus ("find the
    * documents most like this benchmark prompt").
    *
    * Scale shape: per-document term frequencies come from ONE narrow
    * map-only projection (array-filter counts inside the row — no
    * explode, no corpus-wide inverted index, no shuffle of the
    * corpus); the corpus statistics (N, Σdl, per-term document
    * frequencies) are ONE single-row aggregate broadcast back; top-k
    * is TakeOrderedAndProject. At 100 TB an ad-hoc query costs one
    * map pass and a k-row result. A SERVING workload (many queries
    * per second) wants lake-resident postings instead
    * ([[graft.text.DedupIndex]]'s shape) — this is the scan-side
    * primitive, not the index.
    *
    * Numeric contract: tf/dl/df/N are exact longs; avgdl is one IEEE
    * division of exact values; each idf is a grid-rounded ln (the
    * [[pmiBigrams]] trick); the per-term contributions sum in FIXED
    * query order inside one projection and the final score
    * grid-rounds — so an oracle re-deriving the identical operation
    * sequence is hash-exact despite the transcendental. */
  def bm25Rank(df: DataFrame, queryTerms: Seq[String], k: Int = 15,
               k1: Double = 1.2, b: Double = 0.75,
               idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Rank needs at least one query term")
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    // persisted: the tokenize-and-count projection feeds BOTH the
    // single-row stats aggregate and the scored projection — without
    // the persist the corpus tokenizes twice per query
    val base = graft.core.TransientCache.persist(
      df.select(col(idCol), toks.as("__t"))
        .select(
          col(idCol) +: size(col("__t")).cast("long").as("dl") +:
            queryTerms.zipWithIndex.map { case (t, i) =>
              size(filter(col("__t"), x => x === t)).cast("long")
                .as(s"__tf$i")
            }: _*))
    val stats = base.agg(
      count(lit(1)).as("__n"),
      sum(col("dl")).as("__sumdl") +:
        queryTerms.indices.map(i =>
          count(when(col(s"__tf$i") > 0, 1)).as(s"__df$i")): _*)
    val joined = base.crossJoin(broadcast(stats))
    val avgdl = col("__sumdl").cast("double") / col("__n")
    val contribs = queryTerms.indices.map { i =>
      val tf = col(s"__tf$i").cast("double")
      val idf = round(log(
        ((col("__n") - col(s"__df$i")).cast("double") + 0.5) /
          (col(s"__df$i").cast("double") + 0.5) + 1.0), 6)
      idf * ((tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("dl").cast("double") / avgdl))))
    }
    joined.select(col(idCol), col("dl"),
        round(contribs.reduceLeft(_ + _), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** The INDEX-SIDE build for [[bm25IndexRank]]: one pass over the
    * corpus to `postings (term, doc_id, tf)` + `docs (doc_id, dl)` —
    * the inverted index as plain DataFrames, ready to land as lake
    * tables (cluster postings by `term` and record string stats; a
    * term lookup then prunes at the manifest). ONE explode + ONE
    * map-side-combined aggregate; the corpus is never re-read. */
  def bm25IndexBuild(df: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): (DataFrame, DataFrame) = {
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    val docs = df.select(col(idCol).as("doc_id"),
      size(toks).cast("long").as("dl"))
    val postings = df.select(col(idCol).as("doc_id"),
        explode(toks).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    (postings, docs)
  }

  /** BM25 served FROM THE INDEX ([[bm25IndexBuild]]'s shape) instead
    * of scanning the corpus — the many-queries-per-second path
    * [[bm25Rank]]'s scaladoc names. `postingsFor(term)` supplies one
    * term's postings (doc_id, tf); handing the lookup to the caller
    * keeps the ranking math independent of WHERE the index lives (a
    * lake table pruning on recorded string stats, an in-memory frame
    * in a spec). The numeric sequence is IDENTICAL to [[bm25Rank]] —
    * exact longs, one avgdl division, grid-rounded idf, fixed-order
    * contribution sum — so index-served and scan-served results agree
    * hash-exactly, zero-score documents included (every doc in `docs`
    * is ranked; missing postings coalesce to tf = 0).
    *
    * Scale shape: per query, k term lookups (manifest-pruned on a
    * clustered postings table) + one O(docs) stats aggregate + small
    * broadcast joins + TakeOrdered — no corpus scan. The docs table
    * is O(corpus cardinality), not O(corpus bytes). */
  def bm25IndexRank(docs: DataFrame, postingsFor: String => DataFrame,
                    queryTerms: Seq[String], k: Int = 15,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25IndexRank needs a query term")
    val stats = docs.agg(count(lit(1)).as("__n"),
      sum(col("dl")).as("__sumdl"))
    val joined = queryTerms.zipWithIndex.foldLeft(
      docs.crossJoin(broadcast(stats))) { case (acc, (t, i)) =>
      val p = postingsFor(t)
        .select(col("doc_id"), col("tf").as(s"__tf$i"))
      acc.join(broadcast(p), Seq("doc_id"), "left")
        .crossJoin(broadcast(
          p.agg(count(lit(1)).as(s"__df$i"))))
    }
    val avgdl = col("__sumdl").cast("double") / col("__n")
    val contribs = queryTerms.indices.map { i =>
      val tf = coalesce(col(s"__tf$i"), lit(0L)).cast("double")
      val idf = round(log(
        ((col("__n") - col(s"__df$i")).cast("double") + 0.5) /
          (col(s"__df$i").cast("double") + 0.5) + 1.0), 6)
      idf * ((tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("dl").cast("double") / avgdl))))
    }
    joined.select(col("doc_id"), col("dl"),
        round(contribs.reduceLeft(_ + _), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** C4-style line-quality filtering — the web-corpus cleaning rule
    * set: keep only lines with ≥ `minWords` words ending in terminal
    * punctuation, rebuild the document from survivors, and flag docs
    * that keep ≥ `minKeptLines` lines (C4 drops the rest). ONE narrow
    * projection per document — the split/filter/rejoin runs as
    * higher-order array functions inside the row, no explode, no
    * shuffle; at 100 TB this is a map-only pass like [[piiScrub]].
    * (The HOF lambda is interpreted, not codegen'd — acceptable here
    * because the regex kernels dominate; the native-Expression route
    * remains if this ever tops a profile.) */
  def lineQualityFilter(df: DataFrame, textCol: String = "text",
                        minWords: Int = 3,
                        minKeptLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val keep = filter(lines, l =>
      (size(split(trim(l), "\\s+")) >= minWords) &&
        regexp_like(trim(l), lit("[.!?]$")))
    df.withColumn("__kept", keep)
      .withColumn("text_clean", concat_ws("\n", col("__kept")))
      .withColumn("n_lines", size(lines))
      .withColumn("n_kept", size(col("__kept")))
      .withColumn("kept_doc", col("n_kept") >= minKeptLines)
      .drop("__kept")
  }

  /** The Gopher stop-word set — the "contains ≥ 2 of these" document
    * rule. Frozen like [[langProfiles]]: the contract is the rule, not
    * the lexicon. */
  val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-level quality rules (Rae et al. 2021, the
    * MassiveText filter set) — the third member of the quality-filter
    * family alongside the C4 line filter ([[lineQualityFilter]]) and
    * the repetition profile ([[repetition]]): word-count bounds, mean
    * word length bounds, symbol-to-word ratio, bullet-/ellipsis-line
    * fractions, alphabetic-word fraction, and the stop-word presence
    * rule, folded into one `kept` verdict.
    *
    * ONE narrow codegen'd projection per document — token and line
    * arrays each materialize once and every rule reads them; no
    * shuffle, no UDF, map-only at 100 TB like [[piiScrub]]. Every
    * flag is an exact integer cross-product (the [[repetition]]
    * pattern): `bullet_lines·10 ≤ n_lines·9` instead of a float
    * ratio, so the verdict is bit-stable across engines and never
    * touches float rounding. The only float on the surface,
    * `mean_word_len`, is one correctly-rounded int/int division.
    *
    * Word-count bounds default to Gopher's 50..100k; pass others for
    * short-document corpora. */
  def gopherRules(df: DataFrame, textCol: String = "text",
                  minWords: Long = 50, maxWords: Long = 100000): DataFrame = {
    val t = col(textCol)
    val toksCol = filter(split(t, "\\s+"), x => x =!= "")
    val linesCol = split(t, "\n")
    val withArrays = df.withColumn("__toks", toksCol)
      .withColumn("__lines", linesCol)
    val nWords = size(col("__toks")).cast("long")
    // Σ word lengths without a per-word loop: every non-whitespace char
    // is part of exactly one token
    val wordChars = length(regexp_replace(t, "\\s+", "")).cast("long")
    val nHash = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    // '...' occurrences: non-overlapping greedy left-to-right in both
    // engines' replace; the removed length is divisible by 3 by
    // construction
    val nEllipsis =
      ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3)
        .cast("long")
    val bulletLines = size(filter(col("__lines"),
      l => substring(ltrim(l), 1, 1).isInCollection(Seq("-", "*", "•"))))
      .cast("long")
    val ellipsisLines = size(filter(col("__lines"),
      l => rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
      .cast("long")
    val alphaWords = size(filter(col("__toks"),
      x => x.rlike("[A-Za-z]"))).cast("long")
    val stopHits = gopherStops.map(w =>
      when(exists(col("__toks"), x => lower(x) === w), 1L).otherwise(0L))
      .reduce(_ + _)
    withArrays
      .withColumn("n_words", nWords)
      .withColumn("word_chars", wordChars)
      .withColumn("n_hash", nHash)
      .withColumn("n_ellipsis", nEllipsis)
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("bullet_lines", bulletLines)
      .withColumn("ellipsis_lines", ellipsisLines)
      .withColumn("alpha_words", alphaWords)
      .withColumn("stopword_hits", stopHits)
      .withColumn("mean_word_len",
        when(col("n_words") > 0,
          col("word_chars").cast("double") / col("n_words"))
          .otherwise(lit(0.0)))
      .withColumn("kept",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("word_chars") >= col("n_words") * 3 &&
          col("word_chars") <= col("n_words") * 10 &&
          (col("n_hash") + col("n_ellipsis")) * 10 <= col("n_words") &&
          col("bullet_lines") * 10 <= col("n_lines") * 9 &&
          col("ellipsis_lines") * 10 <= col("n_lines") * 3 &&
          col("alpha_words") * 10 >= col("n_words") * 8 &&
          col("stopword_hits") >= 2)
      .drop("__toks", "__lines")
  }
}

object TextQueries {

  def tx1LangId(s: SparkSession, d: String): DataFrame =
    TextStats.langId(Tables.documents(s, d))
      .select(col("doc_id"), col("hits_en"), col("hits_fr"), col("hits_de"),
        col("hits_es"), col("cjk_chars"), col("predicted_lang"))

  /** The same scoring rule in DuckDB: list hits via list_filter, the same
    * fixed-priority argmax CASE chain. */
  val tx1Oracle: String = {
    val hitExprs = TextStats.langProfiles.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(string_split_regex(text, '\\s+'), t -> list_contains($lst, t))) AS hits_$lang"
    }.mkString(",\n  ")
    val langs = TextStats.langProfiles.map(_._1)
    val caseChain = langs.zipWithIndex.map { case (lang, i) =>
      val others = langs.filter(_ != lang)
      val cond = others.map(o => s"hits_$lang >= hits_$o").mkString(" AND ")
      s"WHEN hits_$lang > 0 AND $cond THEN '$lang'"
    }.mkString("\n    ")
    s"""SELECT doc_id, hits_en, hits_fr, hits_de, hits_es, cjk_chars,
       |  CASE WHEN cjk_chars * 3 > length(text) THEN 'zh'
       |    $caseChain
       |    ELSE 'und' END AS predicted_lang
       |FROM (
       |  SELECT doc_id, text,
       |  $hitExprs,
       |  length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk_chars
       |  FROM documents)""".stripMargin
  }

  def tx2Quality(s: SparkSession, d: String): DataFrame =
    TextStats.quality(Tables.documents(s, d))
      .select(col("doc_id"), col("n_tokens"), col("avg_token_len"),
        col("alpha_ratio"), col("digit_ratio"), col("punct_ratio"),
        col("stopword_ratio"))

  val tx2Oracle: String = {
    val stops = TextStats.langProfiles.head._2
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
       |  len(string_split_regex(text, '\\s+')) AS n_tokens,
       |  CAST(length(text) - len(string_split_regex(text, '\\s+')) + 1 AS DOUBLE)
       |    / len(string_split_regex(text, '\\s+')) AS avg_token_len,
       |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
       |    / length(text) AS alpha_ratio,
       |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
       |    / length(text) AS digit_ratio,
       |  CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
       |    / length(text) AS punct_ratio,
       |  CAST(len(list_filter(string_split_regex(text, '\\s+'),
       |    t -> list_contains($stops, t))) AS DOUBLE)
       |    / len(string_split_regex(text, '\\s+')) AS stopword_ratio
       |FROM documents""".stripMargin
  }

  def tx3Tokens(s: SparkSession, d: String): DataFrame =
    TextStats.tokenCounts(Tables.documents(s, d))
      .select(col("doc_id"), col("ws_tokens"), col("lex_tokens"))

  val tx3Oracle: String =
    """SELECT doc_id,
      |  len(string_split_regex(text, '\s+')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
      |    AS lex_tokens
      |FROM documents""".stripMargin

  def tx4Fingerprint(s: SparkSession, d: String): DataFrame =
    TextStats.fingerprint(Tables.documents(s, d))
      .select(col("doc_id"), col("fingerprint"))

  val tx4Oracle: String =
    """SELECT doc_id,
      |  substring(sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
      |    1, 16) AS fingerprint
      |FROM documents""".stripMargin

  /** tx5_repetition — the Gopher repetition profile through the gate:
    * every count plus the integer-arithmetic filter flag, re-derived by
    * DuckDB from scratch (line counts via an unnest + group-by, n-gram
    * counts via LATERAL generate_series over the word list — the
    * shuffled relational plan the native kernel exists to avoid; at
    * oracle scale it is affordable and independent). */
  def tx5Repetition(s: SparkSession, d: String): DataFrame =
    TextStats.repetition(Tables.documents(s, d))
      .select(col("doc_id"), col("n_lines"), col("dup_lines"),
        col("line_chars"), col("dup_line_chars"), col("n_bigrams"),
        col("top_bigram"), col("n_5grams"), col("dup_5grams"),
        col("repetitive"))

  val tx5Oracle: String =
    """WITH lines AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, chr(10)),
      |    x -> x <> '')) AS l
      |  FROM documents),
      |line_groups AS (
      |  SELECT doc_id, l, count(*) AS cnt, length(l) AS len
      |  FROM lines GROUP BY doc_id, l),
      |line_stats AS (
      |  SELECT doc_id,
      |    CAST(sum(cnt) AS BIGINT) AS n_lines,
      |    CAST(sum(cnt - 1) AS BIGINT) AS dup_lines,
      |    CAST(sum(len * cnt) AS BIGINT) AS line_chars,
      |    CAST(sum(CASE WHEN cnt > 1 THEN len * cnt ELSE 0 END) AS BIGINT)
      |      AS dup_line_chars
      |  FROM line_groups GROUP BY doc_id),
      |w AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
      |    x -> x <> '') AS ws
      |  FROM documents),
      |bigram_groups AS (
      |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g, count(*) AS cnt
      |  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) t
      |  GROUP BY doc_id, g),
      |bigram_stats AS (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
      |    CAST(max(cnt) AS BIGINT) AS top_bigram
      |  FROM bigram_groups GROUP BY doc_id),
      |five_groups AS (
      |  SELECT doc_id,
      |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
      |      || ' ' || ws[i+4] AS g,
      |    count(*) AS cnt
      |  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 4)) AS i) t
      |  GROUP BY doc_id, g),
      |five_stats AS (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_5grams,
      |    CAST(sum(cnt - 1) AS BIGINT) AS dup_5grams
      |  FROM five_groups GROUP BY doc_id)
      |SELECT d.doc_id,
      |  COALESCE(ls.n_lines, 0) AS n_lines,
      |  COALESCE(ls.dup_lines, 0) AS dup_lines,
      |  COALESCE(ls.line_chars, 0) AS line_chars,
      |  COALESCE(ls.dup_line_chars, 0) AS dup_line_chars,
      |  COALESCE(bs.n_bigrams, 0) AS n_bigrams,
      |  COALESCE(bs.top_bigram, 0) AS top_bigram,
      |  COALESCE(fs.n_5grams, 0) AS n_5grams,
      |  COALESCE(fs.dup_5grams, 0) AS dup_5grams,
      |  (COALESCE(ls.dup_lines, 0) * 10 > COALESCE(ls.n_lines, 0) * 3
      |   OR COALESCE(ls.dup_line_chars, 0) * 5 > COALESCE(ls.line_chars, 0)
      |   OR COALESCE(bs.top_bigram, 0) * 5 > COALESCE(bs.n_bigrams, 0)
      |   OR COALESCE(fs.dup_5grams, 0) * 20 > COALESCE(fs.n_5grams, 0) * 3)
      |    AS repetitive
      |FROM documents d
      |LEFT JOIN line_stats ls ON d.doc_id = ls.doc_id
      |LEFT JOIN bigram_stats bs ON d.doc_id = bs.doc_id
      |LEFT JOIN five_stats fs ON d.doc_id = fs.doc_id""".stripMargin

  /** tx6_pii_scrub — the redaction stage through the gate. The test
    * corpus carries no PII, so the row PLANTS deterministic addresses /
    * IPs / id numbers derived from `doc_id` (the identical expression
    * in both engines — docs off each modulus keep zero counts and
    * untouched text, exercising the no-op path too), then scrubs with
    * [[TextStats.piiScrub]]. The oracle re-runs the same construction
    * and the same RE2-safe patterns with DuckDB's regex engine: counts
    * AND the rewritten text must agree byte-for-byte. */
  def tx6PiiScrub(s: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail"), (col("doc_id") % 7).cast("string"),
            lit(".example.com"))).otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit(" from 10."), (col("doc_id") % 200).cast("string"),
            lit(".0.42"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" ssn 123-45-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))))
    TextStats.piiScrub(planted)
      .select(col("doc_id"), col("n_email"), col("n_ipv4"), col("n_id"),
        col("text_scrubbed"))
  }

  val tx6Oracle: String = {
    val Seq((_, pEmail, rEmail), (_, pIp, rIp), (_, pId, rId)) =
      TextStats.piiPatterns
    s"""WITH planted AS (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' ||
       |      CAST(doc_id AS VARCHAR) || '@mail' ||
       |      CAST(doc_id % 7 AS VARCHAR) || '.example.com'
       |      ELSE '' END ||
       |    CASE WHEN doc_id % 4 = 0 THEN ' from 10.' ||
       |      CAST(doc_id % 200 AS VARCHAR) || '.0.42' ELSE '' END ||
       |    CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-' ||
       |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |      ELSE '' END AS text
       |  FROM documents),
       |s1 AS (
       |  SELECT doc_id,
       |    len(regexp_extract_all(text, '$pEmail')) AS n_email,
       |    regexp_replace(text, '$pEmail', '$rEmail', 'g') AS t
       |  FROM planted),
       |s2 AS (
       |  SELECT doc_id, n_email,
       |    len(regexp_extract_all(t, '$pIp')) AS n_ipv4,
       |    regexp_replace(t, '$pIp', '$rIp', 'g') AS t
       |  FROM s1),
       |s3 AS (
       |  SELECT doc_id, n_email, n_ipv4,
       |    len(regexp_extract_all(t, '$pId')) AS n_id,
       |    regexp_replace(t, '$pId', '$rId', 'g') AS t
       |  FROM s2)
       |SELECT doc_id, n_email, n_ipv4, n_id, t AS text_scrubbed
       |FROM s3""".stripMargin
  }

  /** tx7_line_filter — C4 line cleaning through the gate. The
    * single-line test docs gain a deterministic 4-line structure (the
    * identical expression in both engines): a punctuated prose line
    * (kept), an unpunctuated one (dropped — no terminal punctuation),
    * a 2-word line (dropped — under the word floor), and a
    * '?'-terminated line (kept). The oracle re-runs the same
    * split → list_filter → rejoin in DuckDB: cleaned text, counts, and
    * the keep-doc verdict must agree byte-for-byte. */
  def tx7LineFilter(s: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .withColumn("text", concat(
        substring(col("text"), 1, 60), lit(".\n"),
        substring(col("text"), 61, 60), lit("\n"),
        lit("short one\n"),
        substring(col("text"), 121, 60), lit("?")))
    TextStats.lineQualityFilter(planted, minKeptLines = 2)
      .select(col("doc_id"), col("text_clean"), col("n_lines"),
        col("n_kept"), col("kept_doc"))
  }

  val tx7Oracle: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    substr(text, 1, 60) || '.' || chr(10) ||
      |    substr(text, 61, 60) || chr(10) ||
      |    'short one' || chr(10) ||
      |    substr(text, 121, 60) || '?' AS text
      |  FROM documents),
      |split AS (
      |  SELECT doc_id, string_split(text, chr(10)) AS lines FROM planted),
      |filtered AS (
      |  SELECT doc_id, lines,
      |    list_filter(lines, l ->
      |      len(string_split_regex(trim(l), '\s+')) >= 3 AND
      |      regexp_matches(trim(l), '[.!?]$')) AS kept
      |  FROM split)
      |SELECT doc_id, array_to_string(kept, chr(10)) AS text_clean,
      |  len(lines) AS n_lines, len(kept) AS n_kept,
      |  len(kept) >= 2 AS kept_doc
      |FROM filtered""".stripMargin

  /** tx8_unigram_ppl — the CCNet-shaped perplexity filter through the
    * gate: a unigram LM trained ON the documents corpus scores every
    * document's total and average token NLL, re-derived from scratch by
    * DuckDB (its own unnest/group/join plan). The 6-decimal NLL grid +
    * decimal summation is what makes a float-valued, order-free
    * aggregate hash-stable across engines — see
    * [[TextStats.unigramNll]]'s numeric contract. */
  def tx8UnigramPpl(s: SparkSession, d: String): DataFrame =
    TextStats.unigramNll(Tables.documents(s, d))
      .select(col("doc_id"), col("n_tokens"), col("sum_nll"), col("avg_nll"))

  val tx8Oracle: String =
    """WITH tok AS (
      |  SELECT doc_id, t.t AS token
      |  FROM documents,
      |    UNNEST(list_filter(string_split_regex(lower(text), '\s+'),
      |      x -> x <> '')) AS t(t)),
      |dt AS (
      |  SELECT doc_id, token, count(*) AS m FROM tok GROUP BY doc_id, token),
      |vocab AS (SELECT token, sum(m) AS c FROM dt GROUP BY token),
      |tot AS (SELECT CAST(sum(m) AS DOUBLE) AS n FROM dt)
      |SELECT doc_id,
      |  CAST(sum(m) AS BIGINT) AS n_tokens,
      |  CAST(sum(m * CAST(round(-ln(CAST(c AS DOUBLE) / n), 6)
      |    AS DECIMAL(28,6))) AS DOUBLE) AS sum_nll,
      |  CAST(sum(m * CAST(round(-ln(CAST(c AS DOUBLE) / n), 6)
      |    AS DECIMAL(28,6))) AS DOUBLE) / CAST(sum(m) AS BIGINT) AS avg_nll
      |FROM dt JOIN vocab USING (token), tot
      |GROUP BY doc_id""".stripMargin

  /** tx9_gopher_rules — the Gopher document-level filter set through
    * the gate: every metric and the folded `kept` verdict re-derived
    * from scratch by DuckDB. The verdict is hash-exact because every
    * rule compares integers ([[TextStats.gopherRules]]); the only
    * float column is one int/int division. */
  def tx9GopherRules(s: SparkSession, d: String): DataFrame =
    TextStats.gopherRules(Tables.documents(s, d))
      .select(col("doc_id"), col("n_words"), col("word_chars"),
        col("n_hash"), col("n_ellipsis"), col("n_lines"),
        col("bullet_lines"), col("ellipsis_lines"), col("alpha_words"),
        col("stopword_hits"), col("mean_word_len"), col("kept"))

  val tx9Oracle: String = {
    val stopSum = TextStats.gopherStops.map(w =>
      s"CASE WHEN len(list_filter(toks, x -> lower(x) = '$w')) > 0 " +
        "THEN 1 ELSE 0 END").mkString("(", "\n    + ", ")")
    s"""WITH base AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '')
       |      AS toks,
       |    string_split(text, chr(10)) AS lines,
       |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT)
       |      AS word_chars,
       |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
       |      AS n_hash,
       |    CAST((length(text) - length(replace(text, '...', ''))) // 3
       |      AS BIGINT) AS n_ellipsis
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, word_chars, n_hash, n_ellipsis,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(lines, l ->
       |      substring(ltrim(l), 1, 1) IN ('-', '*', '•'))) AS BIGINT)
       |      AS bullet_lines,
       |    CAST(len(list_filter(lines, l ->
       |      ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))
       |      AS BIGINT) AS ellipsis_lines,
       |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
       |      AS BIGINT) AS alpha_words,
       |    CAST($stopSum AS BIGINT) AS stopword_hits
       |  FROM base)
       |SELECT doc_id, n_words, word_chars, n_hash, n_ellipsis, n_lines,
       |  bullet_lines, ellipsis_lines, alpha_words, stopword_hits,
       |  CASE WHEN n_words > 0
       |    THEN CAST(word_chars AS DOUBLE) / n_words ELSE 0.0 END
       |    AS mean_word_len,
       |  (n_words >= 50 AND n_words <= 100000
       |    AND word_chars >= n_words * 3 AND word_chars <= n_words * 10
       |    AND (n_hash + n_ellipsis) * 10 <= n_words
       |    AND bullet_lines * 10 <= n_lines * 9
       |    AND ellipsis_lines * 10 <= n_lines * 3
       |    AND alpha_words * 10 >= n_words * 8
       |    AND stopword_hits >= 2) AS kept
       |FROM m""".stripMargin
  }

  /** ds1_dsir_weights — DSIR importance weights with the English
    * subset as the target distribution: bucketed unigram models for
    * target and source, per-doc log-ratio scores, re-derived from
    * scratch by DuckDB (its own unnest/hash/group/join plan). Same
    * 6-decimal-grid + decimal-sum contract as tx8. */
  def ds1DsirWeights(s: SparkSession, d: String): DataFrame =
    TextStats.dsirWeights(Tables.documents(s, d), col("lang") === "en")
      .select(col("doc_id"), col("n_tokens"), col("logw_sum"),
        col("logw_avg"), col("in_target"), col("target_like"))

  val ds1Oracle: String =
    """WITH tok AS (
      |  SELECT doc_id, lang = 'en' AS in_target,
      |    CAST(concat('0x', substring(sha256(t.t), 1, 4)) AS BIGINT)
      |      % 1024 AS bucket
      |  FROM documents,
      |    UNNEST(list_filter(string_split_regex(lower(text), '\s+'),
      |      x -> x <> '')) AS t(t)),
      |dt AS (
      |  SELECT doc_id, in_target, bucket, count(*) AS m
      |  FROM tok GROUP BY doc_id, in_target, bucket),
      |stats AS (
      |  SELECT bucket, sum(m) AS cs,
      |    sum(CASE WHEN in_target THEN m ELSE 0 END) AS ct
      |  FROM dt GROUP BY bucket),
      |tot AS (
      |  SELECT CAST(sum(m) AS DOUBLE) + 1024 AS ns,
      |    CAST(sum(CASE WHEN in_target THEN m ELSE 0 END) AS DOUBLE)
      |      + 1024 AS nt
      |  FROM dt),
      |scored AS (
      |  SELECT doc_id, in_target,
      |    CAST(sum(m) AS BIGINT) AS n_tokens,
      |    CAST(sum(m * (CAST(round(ln((ct + 1) / nt), 6)
      |        AS DECIMAL(28,6))
      |      - CAST(round(ln((cs + 1) / ns), 6) AS DECIMAL(28,6))))
      |      AS DOUBLE) AS logw_sum
      |  FROM dt JOIN stats USING (bucket), tot
      |  GROUP BY doc_id, in_target)
      |SELECT doc_id, n_tokens, logw_sum,
      |  logw_sum / n_tokens AS logw_avg, in_target,
      |  logw_sum > 0 AS target_like
      |FROM scored""".stripMargin

  /** Memoized corpus-trained merge list + reference-equality verdict —
    * tokenizer training is an offline batch job (the ivfIndexFor
    * argument): the bench pre-warms it so bp1 times the SERVING of a
    * trained tokenizer, not a retrain per query. Keyed by application
    * id so a restarted session can never serve results from a stopped
    * context's run. */
  private val bpeCache =
    scala.collection.mutable.Map.empty[String, (Seq[Bpe.Merge], Boolean)]

  def bpeMergesFor(s: SparkSession, d: String): (Seq[Bpe.Merge], Boolean) =
    bpeCache.synchronized {
      import s.implicits._
      val appPrefix = s"${s.sparkContext.applicationId}:"
      bpeCache.keys.filterNot(_.startsWith(appPrefix)).toList
        .foreach(bpeCache.remove)
      bpeCache.getOrElseUpdate(appPrefix + d, {
        val docs = Tables.documents(s, d)
        val merges = Bpe.train(docs, nMerges = 24)
        val dict = Bpe.wordDict(docs).select(col("word"), col("freq"))
          .as[(String, Long)].collect().toSeq
        val refEq = Bpe.trainReference(dict, nMerges = 24) == merges
        // encode-kernel evidence: the distributed BpeEncode projection
        // totals over the dictionary must equal a local reference
        // application of the same list (one O(vocabulary) pass)
        val encTotal = Bpe.encode(Bpe.wordDict(docs), merges, "word")
          .select(coalesce(sum(col("freq") * col("bpe_tokens")), lit(0L))
            .cast("long"))
          .as[Long].head()
        val refTotal = dict.map { case (w, f) =>
          f * Bpe.referenceTokens(w, merges) }.sum
        (merges, refEq && encTotal == refTotal)
      })
    }

  /** bp1_bpe_merges — distributed BPE tokenizer training through the
    * gate, HASH-EXACT via the dd11 pattern: the emitted rows are the
    * corpus's top-24 word types by (freq DESC, word) — exactly
    * re-derivable by DuckDB under the identical tokenization — and
    * they SURVIVE only when (a) the distributed trainer's merge list
    * equals an independent single-threaded reference trainer's (same
    * tie-break, same stop rule) and (b) the native BpeEncode kernel's
    * subword totals over the dictionary equal a local reference
    * application of the learned list. A trainer or kernel regression
    * empties the result into a loud cardinality failure. */
  def bp1BpeMerges(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (_, ok) = bpeMergesFor(s, d)
    Bpe.wordDict(Tables.documents(s, d))
      .select(col("word"), col("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(24)
      .withColumn("rank", org.apache.spark.sql.functions.row_number()
        .over(Window.orderBy(col("freq").desc, col("word"))))
      .withColumn("bpe_ok", lit(ok))
      .filter(col("bpe_ok"))
  }

  val bp1Oracle: String =
    """WITH toks AS (
      |  SELECT list_filter(string_split_regex(lower(text), '\s+'),
      |    x -> x <> '') AS t
      |  FROM documents),
      |dict AS (
      |  SELECT u.w AS word, count(*) AS freq
      |  FROM toks, UNNEST(t) AS u(w) GROUP BY 1)
      |SELECT word, freq,
      |  CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS INT)
      |    AS rank,
      |  TRUE AS bpe_ok
      |FROM dict ORDER BY freq DESC, word LIMIT 24""".stripMargin

  /** co1_pmi_collocations — PMI bigram mining through the gate: counts,
    * unigram frequencies and the grid-rounded PMI score re-derived from
    * scratch by DuckDB with the same operand order, so the row is
    * hash-exact despite the ln ([[TextStats.pmiBigrams]]'s contract). */
  def co1PmiCollocations(s: SparkSession, d: String): DataFrame =
    TextStats.pmiBigrams(Tables.documents(s, d))

  val co1Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')
      |      AS t
      |  FROM documents),
      |pairs AS (
      |  SELECT t[i] AS w1, t[i + 1] AS w2, count(*) AS n_pair
      |  FROM toks, UNNEST(range(1, len(t))) AS r(i)
      |  GROUP BY 1, 2),
      |uni AS (
      |  SELECT u.w AS w, count(*) AS n_w
      |  FROM toks, UNNEST(t) AS u(w) GROUP BY 1),
      |tot AS (
      |  SELECT (SELECT CAST(sum(n_w) AS DOUBLE) FROM uni) AS nt,
      |    (SELECT CAST(sum(n_pair) AS DOUBLE) FROM pairs) AS np)
      |SELECT w1, w2, n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2,
      |  round(ln((CAST(n_pair AS DOUBLE) * nt * nt)
      |    / (np * u1.n_w * u2.n_w)), 6) AS pmi
      |FROM pairs
      |JOIN uni u1 ON u1.w = w1
      |JOIN uni u2 ON u2.w = w2, tot
      |WHERE n_pair >= 5""".stripMargin

  /** bm1_bm25_topk — BM25 retrieval through the gate: the top-15
    * documents for a fixed three-term query, DuckDB re-deriving the
    * identical tf/df/idf/score sequence ([[TextStats.bm25Rank]]'s
    * numeric contract) so the row is hash-exact despite the ln. */
  def bm1Bm25TopK(s: SparkSession, d: String): DataFrame =
    TextStats.bm25Rank(Tables.documents(s, d),
      Seq("spark", "data", "query"))

  val bm1Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')
      |      AS t
      |  FROM documents),
      |base AS (
      |  SELECT doc_id, len(t) AS dl,
      |    len(list_filter(t, x -> x = 'spark')) AS tf0,
      |    len(list_filter(t, x -> x = 'data')) AS tf1,
      |    len(list_filter(t, x -> x = 'query')) AS tf2
      |  FROM toks),
      |stats AS (
      |  SELECT count(*) AS n, sum(dl) AS sumdl,
      |    count(CASE WHEN tf0 > 0 THEN 1 END) AS df0,
      |    count(CASE WHEN tf1 > 0 THEN 1 END) AS df1,
      |    count(CASE WHEN tf2 > 0 THEN 1 END) AS df2
      |  FROM base)
      |SELECT doc_id, dl,
      |  round(
      |    round(ln((CAST(n - df0 AS DOUBLE) + 0.5)
      |        / (CAST(df0 AS DOUBLE) + 0.5) + 1.0), 6)
      |      * ((CAST(tf0 AS DOUBLE) * 2.2) / (CAST(tf0 AS DOUBLE)
      |        + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
      |          / (CAST(sumdl AS DOUBLE) / n)))))
      |    + round(ln((CAST(n - df1 AS DOUBLE) + 0.5)
      |        / (CAST(df1 AS DOUBLE) + 0.5) + 1.0), 6)
      |      * ((CAST(tf1 AS DOUBLE) * 2.2) / (CAST(tf1 AS DOUBLE)
      |        + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
      |          / (CAST(sumdl AS DOUBLE) / n)))))
      |    + round(ln((CAST(n - df2 AS DOUBLE) + 0.5)
      |        / (CAST(df2 AS DOUBLE) + 0.5) + 1.0), 6)
      |      * ((CAST(tf2 AS DOUBLE) * 2.2) / (CAST(tf2 AS DOUBLE)
      |        + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
      |          / (CAST(sumdl AS DOUBLE) / n))))), 6) AS score
      |FROM base, stats
      |ORDER BY score DESC, doc_id
      |LIMIT 15""".stripMargin

  /** Memoized lake-resident BM25 index (postings clustered by term
    * with recorded string stats, + the docs table) — an index build is
    * an offline batch job, like the IVF/BPE builds. */
  private val bm2Cache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** bm2_bm25_index — BM25 served from the LAKE-RESIDENT inverted
    * index: postings land as a term-clustered manifest table (string
    * stats recorded, so each term lookup prunes at the manifest via
    * readRangeStr), the docs table beside it, and the SAME three-term
    * query as bm1 is answered from index lookups — no corpus scan.
    * The oracle is bm1's VERBATIM: index-served and scan-served BM25
    * must agree hash-exactly, zero-score documents included — the
    * index-equals-scan invariant that makes an index trustworthy. */
  def bm2Bm25Index(s: SparkSession, d: String): DataFrame = {
    import graft.sources.ManifestLake
    val dirs = bm2Cache.computeIfAbsent(s"${s.sparkContext.applicationId}:$d",
      _ => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-bm25-index").toString
        val (postings, docs) = TextStats.bm25IndexBuild(Tables.documents(s, d))
        ManifestLake.write(
          postings.repartitionByRange(8, col("term")),
          s"$root/postings", statsCols = Seq("term"))
        ManifestLake.write(docs, s"$root/docs")
        root
      })
    TextStats.bm25IndexRank(
      ManifestLake.read(s, s"$dirs/docs"),
      t => ManifestLake.readRangeStr(s, s"$dirs/postings", "term", t, t)
        .filter(col("term") === t),
      Seq("spark", "data", "query"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bm1_bm25_topk" -> (bm1Bm25TopK _),
    "bm2_bm25_index" -> (bm2Bm25Index _),
    "co1_pmi_collocations" -> (co1PmiCollocations _),
    "bp1_bpe_merges" -> (bp1BpeMerges _),
    "ds1_dsir_weights" -> (ds1DsirWeights _),
    "tx9_gopher_rules" -> (tx9GopherRules _),
    "tx8_unigram_ppl" -> (tx8UnigramPpl _),
    "tx1_lang_id" -> (tx1LangId _),
    "tx2_quality" -> (tx2Quality _),
    "tx3_token_counts" -> (tx3Tokens _),
    "tx4_fingerprint" -> (tx4Fingerprint _),
    "tx5_repetition" -> (tx5Repetition _),
    "tx6_pii_scrub" -> (tx6PiiScrub _),
    "tx7_line_filter" -> (tx7LineFilter _))

  val oracles: Map[String, String] = Map(
    "bp1_bpe_merges" -> bp1Oracle,
    "bm1_bm25_topk" -> bm1Oracle,
    "bm2_bm25_index" -> bm1Oracle,
    "co1_pmi_collocations" -> co1Oracle,
    "ds1_dsir_weights" -> ds1Oracle,
    "tx9_gopher_rules" -> tx9Oracle,
    "tx8_unigram_ppl" -> tx8Oracle,
    "tx1_lang_id" -> tx1Oracle,
    "tx2_quality" -> tx2Oracle,
    "tx3_token_counts" -> tx3Oracle,
    "tx4_fingerprint" -> tx4Oracle,
    "tx5_repetition" -> tx5Oracle,
    "tx6_pii_scrub" -> tx6Oracle,
    "tx7_line_filter" -> tx7Oracle)
}
