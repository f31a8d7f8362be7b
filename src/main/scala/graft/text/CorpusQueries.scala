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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sp1_hash_split" -> (sp1HashSplit _),
    "pk1_token_pack" -> (pk1TokenPack _))

  val oracles: Map[String, String] = Map(
    "sp1_hash_split" -> sp1Oracle,
    "pk1_token_pack" -> pk1Oracle)
}
