package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The curation stage a pretraining-data pipeline runs over a raw corpus:
  * annotate every document with language, shape stats and a dedup key,
  * then apply ordered keep/drop rules. The whole stage is one narrow pass
  * plus a single fingerprint-partitioned window — at 100 TB the only
  * shuffle is the dedup key exchange.
  *
  * Rule order is part of the contract (first violated rule names the drop
  * reason): too_short → too_long → low_alpha → [repetitive] →
  * lang_filtered → exact_dup.
  */
object Curation {

  /** `dropRepetitive = true` adds the Gopher repetition verdict
    * ([[TextStats.repetition]]) to the cascade, between the shape rules
    * and the language filter — another narrow per-row computation, no
    * extra shuffle. Off by default: the thresholds are corpus-tuned in
    * practice. */
  final case class Config(minTokens: Int = 30, maxTokens: Int = 120,
                          minAlphaRatio: Double = 0.5,
                          langs: Set[String] = Set("en"),
                          dropRepetitive: Boolean = false)

  /** Every input row with its audit columns and nullable `drop_reason`
    * (null = kept). */
  def annotate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    // Tokenize ONCE for the whole cascade: langId and quality share the
    // same token array instead of each splitting the text again.
    val withStats0 = TextStats.qualityTokenized(
      TextStats.fingerprint(TextStats.langIdTokenized(
        docs.withColumn("__toks", TextStats.tokenize("text")))))
      .drop("__toks")
    // only the verdict joins the cascade: the profile counts are dropped
    // so annotate's output schema does not depend on the config
    val withStats =
      if (cfg.dropRepetitive) TextStats.repetition(withStats0)
        .drop(graft.functions.RepetitionProfile.schema.fieldNames.toSeq: _*)
      else withStats0.withColumn("repetitive", lit(false))
    val keeperWindow = Window.partitionBy(col("fingerprint"))
    withStats
      .withColumn("is_keeper",
        col("doc_id") === min(col("doc_id")).over(keeperWindow))
      .withColumn("drop_reason",
        when(col("n_tokens") < cfg.minTokens, "too_short")
          .when(col("n_tokens") > cfg.maxTokens, "too_long")
          .when(col("alpha_ratio") < cfg.minAlphaRatio, "low_alpha")
          .when(col("repetitive"), "repetitive")
          .when(!col("predicted_lang").isInCollection(cfg.langs),
            "lang_filtered")
          .when(!col("is_keeper"), "exact_dup")
          .otherwise(lit(null).cast("string")))
  }

  /** The kept corpus. */
  def curate(docs: DataFrame, cfg: Config = Config()): DataFrame =
    annotate(docs, cfg).filter(col("drop_reason").isNull)
      .select(docs.columns.map(col).toIndexedSeq: _*)
}

object CurationQueries {

  /** cu1 — the full annotate pass over documents ∪ planted exact dups,
    * fully oracle-checked: DuckDB re-derives stats, language, dedup
    * keepers and the rule cascade independently. */
  def cu1Curation(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val planted = docs.filter(col("doc_id") < 5)
      .withColumn("doc_id", col("doc_id") + 100000)
    Curation.annotate(docs.unionByName(planted))
      .select(col("doc_id"), col("predicted_lang"), col("n_tokens"),
        col("drop_reason"))
  }

  val cu1Oracle: String = {
    val hitExprs = TextStats.langProfiles.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(string_split_regex(text, '\\s+'), t -> list_contains($lst, t))) AS hits_$lang"
    }.mkString(",\n  ")
    val langs = TextStats.langProfiles.map(_._1)
    val caseChain = langs.map { lang =>
      val others = langs.filter(_ != lang)
      val cond = others.map(o => s"hits_$lang >= hits_$o").mkString(" AND ")
      s"WHEN hits_$lang > 0 AND $cond THEN '$lang'"
    }.mkString("\n      ")
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 5),
       |annotated AS (
       |  SELECT doc_id,
       |    len(string_split_regex(text, '\\s+')) AS n_tokens,
       |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
       |      / length(text) AS alpha_ratio,
       |    CASE WHEN length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) * 3
       |           > length(text) THEN 'zh'
       |      $caseChain
       |      ELSE 'und' END AS predicted_lang,
       |    doc_id = min(doc_id) OVER (PARTITION BY
       |      sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
       |      AS is_keeper
       |  FROM (SELECT doc_id, text, $hitExprs FROM corpus))
       |SELECT doc_id, predicted_lang, n_tokens,
       |  CASE WHEN n_tokens < 30 THEN 'too_short'
       |       WHEN n_tokens > 120 THEN 'too_long'
       |       WHEN alpha_ratio < 0.5 THEN 'low_alpha'
       |       WHEN predicted_lang <> 'en' THEN 'lang_filtered'
       |       WHEN NOT is_keeper THEN 'exact_dup'
       |       ELSE NULL END AS drop_reason
       |FROM annotated""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cu1_curation" -> (cu1Curation _))

  val oracles: Map[String, String] = Map(
    "cu1_curation" -> cu1Oracle)
}
