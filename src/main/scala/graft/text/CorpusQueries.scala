package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Correctness-gate entries for the corpus-preparation operators. Both
  * are exactly SQL-expressible, so both are hash-exact oracle rows. */
object CorpusQueries {

  /** sp1 — deterministic content-addressed train/valid/test split. */
  def sp1HashSplit(s: SparkSession, d: String): DataFrame =
    CorpusOps.deterministicSplit(Tables.documents(s, d))
      .select(col("doc_id"), col("bucket"), col("split"))

  val sp1Oracle: String =
    """SELECT doc_id,
      |  CAST(concat('0x', substring(sha256(CAST(doc_id AS VARCHAR)), 1, 4))
      |    AS BIGINT) % 10 AS bucket,
      |  CASE WHEN CAST(concat('0x',
      |      substring(sha256(CAST(doc_id AS VARCHAR)), 1, 4))
      |      AS BIGINT) % 10 < 8 THEN 'train'
      |    WHEN CAST(concat('0x',
      |      substring(sha256(CAST(doc_id AS VARCHAR)), 1, 4))
      |      AS BIGINT) % 10 < 9 THEN 'valid'
      |    ELSE 'test' END AS split
      |FROM documents""".stripMargin

  /** sp2 — stratified split: exact floor(frac·n) train/valid quotas per
    * lang by content-addressed rank, re-derived by DuckDB with a plain
    * window (the engine's sharded rank must agree with the single-sort
    * definition — that equivalence IS what the row verifies). */
  def sp2StratifiedSplit(s: SparkSession, d: String): DataFrame =
    CorpusOps.stratifiedSplit(Tables.documents(s, d))
      .select(col("doc_id"), col("lang"), col("strat_rank"), col("split"))

  val sp2Oracle: String =
    """WITH r AS (
      |  SELECT doc_id, lang,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
      |      AS strat_rank,
      |    count(*) OVER (PARTITION BY lang) AS gn
      |  FROM documents)
      |SELECT doc_id, lang, strat_rank,
      |  CASE WHEN strat_rank <= CAST(floor(gn * 0.8) AS BIGINT)
      |      THEN 'train'
      |    WHEN strat_rank <= CAST(floor(gn * 0.8) AS BIGINT)
      |      + CAST(floor(gn * 0.1) AS BIGINT) THEN 'valid'
      |    ELSE 'test' END AS split
      |FROM r""".stripMargin

  /** pk1 — token-budget sequence packing bookkeeping per lang block. */
  def pk1TokenPack(s: SparkSession, d: String): DataFrame =
    CorpusOps.packTokens(Tables.documents(s, d), budget = 512)

  val pk1Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split_regex(text, '\s+'),
      |      t -> t <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, lang, n_tokens,
      |    COALESCE(CAST(sum(n_tokens) OVER (PARTITION BY lang
      |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND 1 PRECEDING) AS BIGINT), 0) AS token_offset
      |  FROM toks WHERE n_tokens > 0)
      |SELECT doc_id, lang, n_tokens, token_offset,
      |  token_offset // 512 AS first_seq,
      |  (token_offset + n_tokens - 1) // 512 AS last_seq,
      |  (token_offset + n_tokens - 1) // 512 - token_offset // 512 + 1
      |    AS n_chunks
      |FROM packed""".stripMargin

  /** mx1 — training-mixture rebalancing to an en-0.4 / others-0.15 mix;
    * the limiting group caps the achievable total and every group keeps
    * its floored quota by content-addressed rank. */
  def mx1MixRebalance(s: SparkSession, d: String): DataFrame =
    CorpusOps.rebalanceMix(Tables.documents(s, d),
      Seq("en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15,
        "zh" -> 0.15))
      .select(col("doc_id"), col("lang"), col("mix_rank"), col("quota"),
        col("kept"))

  /** mx2 — temperature-based mixture resampling (α = 0.5, with
    * replacement) through the gate: per-domain sampling shares
    * ∝ n_g^0.5, a 10 000-doc budget dealt as exact integer copy counts
    * by content-addressed rank. DuckDB re-derives shares, quotas, ranks
    * and copy counts from scratch; the row is hash-exact because every
    * float step is either grid-rounded-then-decimal or a single
    * IEEE-correctly-rounded op ([[CorpusOps.temperatureMix]]). */
  def mx2TemperatureMix(s: SparkSession, d: String): DataFrame =
    CorpusOps.temperatureMix(Tables.documents(s, d), budget = 10000L,
      alpha = 0.5)
      .select(col("doc_id"), col("lang"), col("mix_rank"),
        col("mix_share"), col("quota"), col("n_copies"))

  val mx2Oracle: String =
    """WITH counts AS (
      |  SELECT lang, count(*) AS n_group FROM documents GROUP BY lang),
      |s AS (
      |  SELECT lang, n_group,
      |    CAST(round(pow(CAST(n_group AS DOUBLE), 0.5), 6)
      |      AS DECIMAL(28,6)) AS sg
      |  FROM counts),
      |tot AS (SELECT CAST(sum(sg) AS DECIMAL(28,6)) AS t FROM s),
      |quota AS (
      |  SELECT lang, n_group,
      |    CAST(sg AS DOUBLE) / CAST(t AS DOUBLE) AS mix_share,
      |    CAST(floor(10000.0 * (CAST(sg AS DOUBLE) / CAST(t AS DOUBLE)))
      |      AS BIGINT) AS quota
      |  FROM s, tot),
      |ranked AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS mix_rank
      |  FROM documents)
      |SELECT r.doc_id, r.lang, r.mix_rank, q.mix_share, q.quota,
      |  q.quota // q.n_group +
      |    CASE WHEN r.mix_rank <= q.quota % q.n_group THEN 1 ELSE 0 END
      |    AS n_copies
      |FROM ranked r JOIN quota q ON r.lang IS NOT DISTINCT FROM q.lang""".stripMargin

  val mx1Oracle: String =
    """WITH counts AS (
      |  SELECT lang, count(*) AS n_group FROM documents GROUP BY lang),
      |t(lang, target_share) AS (
      |  VALUES ('en', 0.4), ('de', 0.15), ('es', 0.15), ('fr', 0.15),
      |    ('zh', 0.15)),
      |m AS (
      |  -- LEFT join + COALESCE 0 mirrors the operator: a target lang
      |  -- absent from the corpus caps M at 0 (everything kept=false),
      |  -- instead of silently dropping the constraint via an inner join
      |  SELECT min(COALESCE(n_group, 0) / target_share) AS m
      |  FROM t LEFT JOIN counts USING (lang)),
      |quota AS (
      |  SELECT lang,
      |    CAST(floor(target_share * (SELECT m FROM m)) AS BIGINT) AS quota
      |  FROM t LEFT JOIN counts USING (lang)),
      |ranked AS (
      |  SELECT doc_id, lang,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
      |      AS mix_rank
      |  FROM documents)
      |SELECT r.doc_id, r.lang, r.mix_rank, q.quota,
      |  r.mix_rank <= q.quota AS kept
      |FROM ranked r JOIN quota q USING (lang)""".stripMargin

  /** qf1 — per-lang median token-count gate (integral values, so the
    * interpolated median is engine-exact). */
  def qf1QuantileFilter(s: SparkSession, d: String): DataFrame = {
    CorpusOps.quantileFilter(
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          CorpusOps.tokenCount(col("text")).as("n_tokens")),
      "n_tokens", 0.5)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cut"),
        col("kept"))
  }

  val qf1Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split_regex(text, '\s+'),
      |      t -> t <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |cuts AS (
      |  SELECT lang, quantile_cont(n_tokens, 0.5) AS cut
      |  FROM toks GROUP BY lang)
      |SELECT t.doc_id, t.lang, t.n_tokens, c.cut,
      |  t.n_tokens >= c.cut AS kept
      |FROM toks t JOIN cuts c USING (lang)""".stripMargin

  /** dc1 — benchmark decontamination: the "eval set" is the documents
    * with `doc_id ≡ 7 (mod 50)` (deterministic, non-empty at every SF),
    * and every corpus doc sharing an 8-gram with any of them is flagged.
    * Eval members flag themselves by construction, so the row is
    * guaranteed non-trivial; DuckDB re-derives the shingle sets and the
    * overlap EXISTS from raw text. */
  def dc1Decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    CorpusOps.decontaminate(docs,
        docs.filter(col("doc_id") % 50 === 7), n = 8)
      .select(col("doc_id"), col("lang"), col("contaminated"))
  }

  val dc1Oracle: String =
    """WITH sh AS (
      |  SELECT doc_id, lang,
      |    list_distinct(CASE WHEN len(toks) >= 8
      |      THEN list_transform(range(1, len(toks) - 6),
      |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
      |          toks[i+3], toks[i+4], toks[i+5], toks[i+6], toks[i+7]))
      |      ELSE [array_to_string(toks, ' ')] END) AS g
      |  FROM (SELECT doc_id, lang,
      |          list_filter(string_split_regex(text, '\s+'),
      |            t -> t <> '') AS toks
      |        FROM documents)),
      |ev AS (SELECT g FROM sh WHERE doc_id % 50 = 7)
      |SELECT s.doc_id, s.lang,
      |  EXISTS (SELECT 1 FROM ev e
      |          WHERE len(list_intersect(s.g, e.g)) > 0) AS contaminated
      |FROM sh s""".stripMargin

  /** ch1 — context-window chunking at 64 tokens with 16-token overlap:
    * every document becomes ⌈(n−16)/48⌉ chunks whose token counts and
    * content hashes the DuckDB oracle re-derives from raw text (same
    * tokenization, same slice arithmetic, same sha256). */
  def ch1ChunkDocs(s: SparkSession, d: String): DataFrame =
    CorpusOps.chunkDocs(Tables.documents(s, d), maxTokens = 64,
      overlap = 16)

  val ch1Oracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '\s+'), x -> x <> '')
      |      AS toks
      |  FROM documents),
      |n AS (
      |  SELECT doc_id, toks, len(toks) AS doc_tokens,
      |    greatest(CAST(ceil((len(toks) - 16) / 48.0) AS INTEGER) - 1, 0)
      |      AS last_i
      |  FROM t)
      |SELECT doc_id,
      |  CAST(i AS INTEGER) AS chunk_id,
      |  CAST(doc_tokens AS INTEGER) AS doc_tokens,
      |  CAST(least(doc_tokens - i * 48, 64) AS INTEGER) AS chunk_tokens,
      |  sha256(coalesce(
      |    array_to_string(list_slice(toks, i * 48 + 1, i * 48 + 64), ' '),
      |    '')) AS chunk_sha
      |FROM (SELECT doc_id, toks, doc_tokens,
      |        unnest(range(0, last_i + 1)) AS i
      |      FROM n)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ch1_chunk_docs" -> (ch1ChunkDocs _),
    "dc1_decontaminate" -> (dc1Decontaminate _),
    "sp1_hash_split" -> (sp1HashSplit _),
    "sp2_stratified_split" -> (sp2StratifiedSplit _),
    "pk1_token_pack" -> (pk1TokenPack _),
    "mx1_mix_rebalance" -> (mx1MixRebalance _),
    "mx2_temperature_mix" -> (mx2TemperatureMix _),
    "qf1_quantile_filter" -> (qf1QuantileFilter _))

  val oracles: Map[String, String] = Map(
    "ch1_chunk_docs" -> ch1Oracle,
    "dc1_decontaminate" -> dc1Oracle,
    "sp1_hash_split" -> sp1Oracle,
    "sp2_stratified_split" -> sp2Oracle,
    "pk1_token_pack" -> pk1Oracle,
    "mx1_mix_rebalance" -> mx1Oracle,
    "mx2_temperature_mix" -> mx2Oracle,
    "qf1_quantile_filter" -> qf1Oracle)
}
