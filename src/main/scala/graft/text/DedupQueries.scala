package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Correctness-gate entries for the dedup family. The driver test corpus
  * has no duplicates by construction, so each query PLANTS a deterministic
  * set of duplicates/near-duplicates (exact copies, first-token edits) as
  * part of the query — the oracle (or the spec) then checks that exactly
  * the planted structure is recovered.
  */
object DedupQueries {

  /** documents ∪ exact copies of doc_id < 5 (shifted ids). */
  private def withExactCopies(docs: DataFrame): DataFrame =
    docs.unionByName(docs.filter(col("doc_id") < 5)
      .withColumn("doc_id", col("doc_id") + 100000))

  /** documents ∪ near-copies of doc_id < 5: first token replaced, so the
    * 3-gram Jaccard to the original stays high but below 1. */
  private def withNearCopies(docs: DataFrame): DataFrame =
    docs.unionByName(docs.filter(col("doc_id") < 5)
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", regexp_replace(col("text"), "^\\S+", "qqq")))


  def dd1ExactDedup(s: SparkSession, d: String): DataFrame =
    Dedup.exactDedup(withExactCopies(Tables.documents(s, d)))
      .select(col("doc_id"), col("content_hash"), col("is_keeper"))

  val dd1Oracle: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 5)
      |SELECT doc_id, sha256(text) AS content_hash,
      |  doc_id = min(doc_id) OVER (PARTITION BY sha256(text)) AS is_keeper
      |FROM corpus""".stripMargin

  /** Hash-exact conversion of the hash-seeded pair queries (the
    * a4/mv1 pattern): the gate row emits only the DETERMINISTIC
    * portion — the planted pairs the algorithm recovered, with their
    * exact (oracle-re-derivable) verification values — plus the
    * recovered count; the row set survives only at FULL planted
    * recall, so DuckDB hash-compares recall AND the exact values
    * instead of recording a weaker rows-only cardinality. The
    * hash-seeded non-planted discoveries stay pinned by DedupSpec's
    * recall/precision contracts. */
  private def plantedHashExact(pairs: DataFrame, expected: Int)
      (out: DataFrame => DataFrame): DataFrame = {
    val p = graft.core.TransientCache.persist(pairs)
    val planted = p.filter(col("id_b") === col("id_a") + 100000)
    val n = planted.agg(count(lit(1)).as("n_planted_recovered"))
    out(planted).crossJoin(broadcast(n))
      .filter(col("n_planted_recovered") >= expected)
  }

  /** MinHash-LSH near-dup pairs (threshold 0.5): the planted pairs'
    * exact 3-gram Jaccard values gate hash-exact (candidate
    * generation stays hash-seeded; its wider recall/precision is
    * DedupSpec's). */
  def dd2MinhashLsh(s: SparkSession, d: String): DataFrame =
    plantedHashExact(
      Dedup.nearDupPairs(withNearCopies(Tables.documents(s, d)),
        threshold = 0.5), expected = 5)(
      _.select(col("id_a"), col("id_b"), col("jaccard")))

  val dd2Oracle: String =
    """WITH pl AS (
      |  SELECT doc_id AS id_a, doc_id + 100000 AS id_b, text AS ta,
      |    regexp_replace(text, '^\S+', 'qqq') AS tb
      |  FROM documents WHERE doc_id < 5),
      |sh AS (
      |  SELECT id_a, id_b,
      |    list_distinct(CASE WHEN len(ta_t) >= 3
      |      THEN list_transform(range(1, len(ta_t) - 1),
      |        i -> ta_t[i] || ' ' || ta_t[i+1] || ' ' || ta_t[i+2])
      |      ELSE [array_to_string(ta_t, ' ')] END) AS sh_a,
      |    list_distinct(CASE WHEN len(tb_t) >= 3
      |      THEN list_transform(range(1, len(tb_t) - 1),
      |        i -> tb_t[i] || ' ' || tb_t[i+1] || ' ' || tb_t[i+2])
      |      ELSE [array_to_string(tb_t, ' ')] END) AS sh_b
      |  FROM (SELECT id_a, id_b,
      |          list_filter(string_split_regex(ta, '\s+'),
      |            t -> t <> '') AS ta_t,
      |          list_filter(string_split_regex(tb, '\s+'),
      |            t -> t <> '') AS tb_t
      |        FROM pl))
      |SELECT id_a, id_b,
      |  CAST(len(list_distinct(list_intersect(sh_a, sh_b))) AS DOUBLE) /
      |    len(list_distinct(list_concat(sh_a, sh_b))) AS jaccard,
      |  CAST(5 AS BIGINT) AS n_planted_recovered
      |FROM sh""".stripMargin

  /** SimHash near-dup pairs at Hamming ≤ 3: the planted EXACT copies
    * gate hash-exact at Hamming 0 (fingerprint values themselves are
    * xxhash-derived and stay spec-pinned). */
  def dd3Simhash(s: SparkSession, d: String): DataFrame =
    plantedHashExact(
      Dedup.simhashPairs(withExactCopies(Tables.documents(s, d))),
      expected = 5)(
      _.select(col("id_a"), col("id_b"), col("hamming")))

  val dd3Oracle: String =
    """SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
      |  CAST(0 AS INTEGER) AS hamming,
      |  CAST(5 AS BIGINT) AS n_planted_recovered
      |FROM documents WHERE doc_id < 5""".stripMargin

  /** Winnowing fingerprint-overlap near-dup pairs (the MOSS scheme)
    * over the planted corpus: the planted pair ids gate hash-exact;
    * the rolling-hash fingerprint values and the winnowing-guarantee
    * contract stay pinned in DedupSpec / NativeTextExprSpec. */
  def dd6Winnow(s: SparkSession, d: String): DataFrame =
    // maxDocFreq raised from the production default: the synthetic corpus
    // draws from a tiny vocabulary, so cross-document k-gram collisions
    // are far denser than in real text. Planted pairs gate hash-exact
    // (the shared-fingerprint count is rolling-hash-derived and stays
    // spec-pinned).
    plantedHashExact(
      Dedup.winnowPairs(withNearCopies(Tables.documents(s, d)),
        maxDocFreq = 30), expected = 5)(
      _.select(col("id_a"), col("id_b")))

  val dd6Oracle: String =
    """SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
      |  CAST(5 AS BIGINT) AS n_planted_recovered
      |FROM documents WHERE doc_id < 5""".stripMargin

  /** Blocked n-gram Jaccard — deterministic successor pairing inside each
    * lang block; the Jaccard kernel is exact → full oracle. */
  def dd4NgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.blockedNgramJaccard(Tables.documents(s, d))

  val dd4Oracle: String =
    """WITH shingled AS (
      |  SELECT lang, doc_id,
      |    list_distinct(CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(1, len(toks) - 1),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [array_to_string(toks, ' ')] END) AS sh
      |  FROM (SELECT lang, doc_id,
      |          list_filter(string_split_regex(text, '\s+'),
      |            t -> t <> '') AS toks
      |        FROM documents)),
      |paired AS (
      |  SELECT lang, doc_id AS id_a,
      |    lead(doc_id) OVER w AS id_b,
      |    sh AS sh_a, lead(sh) OVER w AS sh_b
      |  FROM shingled
      |  WINDOW w AS (PARTITION BY lang ORDER BY doc_id))
      |SELECT lang, id_a, id_b,
      |  CAST(len(list_distinct(list_intersect(sh_a, sh_b))) AS DOUBLE) /
      |    len(list_distinct(list_concat(sh_a, sh_b))) AS jaccard
      |FROM paired WHERE id_b IS NOT NULL""".stripMargin

  /** dd13 — cross-document duplicated k-gram spans: per document, how
    * many of its 5-token windows occur in ≥ 2 DISTINCT documents — the
    * corpus-level "duplicated n-gram fraction" quality signal (tx9
    * owns the within-doc variant). Exact → full oracle: DuckDB
    * re-derives the same windows from raw text and the same ≥2-doc
    * gram set; zero-span shorties surface with a null ratio. */
  def dd13DuplicatedSpans(s: SparkSession, d: String): DataFrame =
    Dedup.duplicatedSpans(Tables.documents(s, d))

  val dd13Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '\s+'),
      |      t -> t <> '') AS toks
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 5
      |    THEN list_transform(range(1, len(toks) - 3),
      |      i -> array_to_string(toks[i:i+4], ' '))
      |    ELSE [] END) AS gram
      |  FROM toks),
      |multi AS (
      |  SELECT gram FROM grams
      |  GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
      |dup AS (
      |  SELECT g.doc_id, count(*) AS dup_spans
      |  FROM grams g JOIN multi m USING (gram)
      |  GROUP BY g.doc_id)
      |SELECT t.doc_id,
      |  CAST(greatest(len(t.toks) - 4, 0) AS BIGINT) AS n_spans,
      |  CAST(coalesce(d.dup_spans, 0) AS BIGINT) AS dup_spans,
      |  CASE WHEN len(t.toks) >= 5
      |    THEN CAST(coalesce(d.dup_spans, 0) AS DOUBLE) /
      |      (len(t.toks) - 4) END AS dup_ratio
      |FROM toks t LEFT JOIN dup d USING (doc_id)""".stripMargin

  /** dd14 — EXACT-SUBSTRING REMOVAL (the Lee et al. 2022 surgery, at
    * 5-token window granularity): every window whose gram occurs in
    * ≥ 2 distinct documents is CUT from every carrier but the gram's
    * first (min doc_id) document, overlaps merge, and the text
    * reassembles from the surviving tokens. Exact → full oracle:
    * DuckDB re-derives the windows, the keeper rule, the covered
    * index union AND the reassembled text — a wrong cut boundary or
    * a lost token fails the hash on the reconstructed string
    * itself. */
  def dd14SpanRemoval(s: SparkSession, d: String): DataFrame =
    Dedup.removeDuplicatedSpans(Tables.documents(s, d))

  val dd14Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '\s+'),
      |      t -> t <> '') AS toks
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, unnest(range(1, len(toks) - 3)) AS i
      |  FROM toks WHERE len(toks) >= 5),
      |grams AS (
      |  SELECT p.doc_id, p.i,
      |    array_to_string(t.toks[p.i:p.i+4], ' ') AS gram
      |  FROM pos p JOIN toks t USING (doc_id)),
      |stats AS (
      |  SELECT gram, min(doc_id) AS keeper FROM grams
      |  GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
      |ridx AS (
      |  SELECT DISTINCT doc_id, idx FROM (
      |    SELECT g.doc_id, unnest(range(g.i, g.i + 5)) AS idx
      |    FROM grams g JOIN stats s USING (gram)
      |    WHERE g.doc_id <> s.keeper)),
      |tokpos AS (
      |  SELECT doc_id, unnest(range(1, len(toks) + 1)) AS i
      |  FROM toks),
      |kept AS (
      |  SELECT tp.doc_id, tp.i, t.toks[tp.i] AS tok
      |  FROM tokpos tp
      |  JOIN toks t USING (doc_id)
      |  LEFT JOIN ridx r ON r.doc_id = tp.doc_id AND r.idx = tp.i
      |  WHERE r.idx IS NULL)
      |SELECT t.doc_id,
      |  CAST(len(t.toks) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(rc.c, 0) AS BIGINT) AS removed_tokens,
      |  coalesce(k.txt, '') AS new_text
      |FROM toks t
      |LEFT JOIN (SELECT doc_id, count(*) AS c FROM ridx
      |           GROUP BY doc_id) rc USING (doc_id)
      |LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS txt
      |           FROM kept GROUP BY doc_id) k USING (doc_id)""".stripMargin

  /** dd8 — blocked n-gram CONTAINMENT (|A∩B|/|A|): the asymmetric dup
    * score that catches subset duplication Jaccard dilutes (a doc quoted
    * inside a larger one). Exact kernel → full oracle, with DuckDB
    * re-deriving the shingle sets from raw text like dd4. */
  def dd8NgramContainment(s: SparkSession, d: String): DataFrame =
    Dedup.blockedNgramContainment(Tables.documents(s, d))

  val dd8Oracle: String =
    """WITH shingled AS (
      |  SELECT lang, doc_id,
      |    list_distinct(CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(1, len(toks) - 1),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [array_to_string(toks, ' ')] END) AS sh
      |  FROM (SELECT lang, doc_id,
      |          list_filter(string_split_regex(text, '\s+'),
      |            t -> t <> '') AS toks
      |        FROM documents)),
      |paired AS (
      |  SELECT lang, doc_id AS id_a,
      |    lead(doc_id) OVER w AS id_b,
      |    sh AS sh_a, lead(sh) OVER w AS sh_b
      |  FROM shingled
      |  WINDOW w AS (PARTITION BY lang ORDER BY doc_id))
      |SELECT lang, id_a, id_b,
      |  CAST(len(list_distinct(list_intersect(sh_a, sh_b))) AS DOUBLE) /
      |    len(sh_a) AS containment
      |FROM paired WHERE id_b IS NOT NULL""".stripMargin

  /** Embedding-cosine near-dup via hyperplane LSH over embeddings ∪
    * perturbed copies (deterministic hash-derived noise). */
  def dd5EmbedNearDup(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val planted = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding",
        zip_with(col("embedding").cast("array<double>"),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => x + (pmod(xxhash64(col("vec_id"), i), lit(1001))
            .cast("double") / 1000.0 - 0.5) * 0.002))
    // planted ids gate hash-exact (the cosine rides the xxhash
    // perturbation, so its value stays spec-pinned rather than
    // oracle-compared)
    plantedHashExact(
      graft.ann.Similarity.hyperplanePairs(
        emb.withColumn("embedding", col("embedding").cast("array<double>"))
          .unionByName(planted),
        threshold = 0.95),
      expected = 5)(
      _.select(col("id_a"), col("id_b")))
  }

  val dd5Oracle: String =
    """SELECT vec_id AS id_a, vec_id + 100000 AS id_b,
      |  CAST(5 AS BIGINT) AS n_planted_recovered
      |FROM embeddings WHERE vec_id < 5""".stripMargin

  /** dd11 — SemDeDup: clustered semantic deduplication over embeddings
    * ∪ the dd5 perturbed copies. Each planted copy sits at cosine
    * ≈ 0.9998 to its original, so within each resolved pair EXACTLY one
    * member survives the keep rule — the in-row gate: `n_resolved`
    * counts originals whose kept flag DIFFERS from their copy's, and
    * the row set empties if fewer than 5 resolve (cluster-split or
    * keep-rule regressions empty the result rather than shipping
    * quietly). K-Means-seeded cells make the surface rows-only, like
    * the other hash-seeded dedup rows. */
  def dd11SemanticDedup(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val planted = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding",
        zip_with(col("embedding").cast("array<double>"),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => x + (pmod(xxhash64(col("vec_id"), i), lit(1001))
            .cast("double") / 1000.0 - 0.5) * 0.002))
    // the quantizer is the SHARED memoized 16-cell index (nn2's) —
    // the production case semanticDedup's `centroids` hook exists for:
    // an indexed corpus dedups with assignment + the cell join only,
    // no per-query refit (and the bench's offline pre-warm covers it)
    val (_, cents) = graft.ann.AnnQueries.ivfIndexFor(s, d)
    val out = graft.core.TransientCache.persist(
      graft.ann.Similarity.semanticDedup(
        emb.withColumn("embedding", col("embedding").cast("array<double>"))
          .unionByName(planted),
        nCells = 16, centroids = Some(cents))
        .select(col("vec_id"), col("cell"), col("kept")))
    // HASH-EXACT since r14 (the dd2 pattern): the emitted rows are
    // the DETERMINISTIC planted pairs, surviving only when EVERY pair
    // resolved (exactly one member kept) — K-Means cells and kept
    // flags gate rather than land, so DuckDB re-derives the full
    // output while a cluster-split or keep-rule regression empties it
    val pairs = out.filter(col("vec_id") >= 100000)
      .select((col("vec_id") - 100000).as("id_a"),
        col("kept").as("k_copy"))
      .join(out.select(col("vec_id").as("id_a"),
        col("kept").as("k_orig")), Seq("id_a"))
      .withColumn("id_b", col("id_a") + 100000)
      .withColumn("resolved", col("k_copy") =!= col("k_orig"))
    val resolved = pairs.agg(
      sum(when(col("resolved"), 1L).otherwise(0L)).as("n_resolved"))
    pairs.crossJoin(broadcast(resolved))
      .filter(col("n_resolved") >= 5)
      .select(col("id_a"), col("id_b"), col("resolved"),
        col("n_resolved"))
  }

  val dd11Oracle: String =
    """SELECT vec_id AS id_a, vec_id + 100000 AS id_b,
      |  TRUE AS resolved, CAST(5 AS BIGINT) AS n_resolved
      |FROM embeddings WHERE vec_id < 5""".stripMargin

  /** dd7 — pairs → CLUSTERS via connected components (transitive
    * closure of the near-dup relation): plants two chained first-token
    * edits per seed doc (ids spaced ×10 so the chain is successor-
    * adjacent), takes the exact blocked-Jaccard successor pairs ≥ 0.4 as
    * edges, and resolves components. The planted chains force real
    * transitivity — orig–edit1 and edit1–edit2 are edges but orig–edit2
    * never is, yet all three must land in one cluster. Both the edge
    * derivation and the component closure are re-derived independently
    * by DuckDB (recursive CTE), so the whole operator is hash-exact. */
  def dd7DedupClusters(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val base = docs.select((col("doc_id") * 10).as("doc_id"), col("lang"),
      col("text"))
    def edit(repl: String, off: Int): DataFrame =
      docs.filter(col("doc_id") < 5)
        .select((col("doc_id") * 10 + off).as("doc_id"), col("lang"),
          regexp_replace(col("text"), "^\\S+", repl).as("text"))
    val corpus = base.unionByName(edit("qqq", 1)).unionByName(edit("zzz", 2))
    val edges = Dedup.blockedNgramJaccard(corpus)
      .filter(col("jaccard") >= 0.4)
      .select(col("id_a"), col("id_b"))
    Dedup.dedupClusters(corpus.select(col("doc_id")), "doc_id", edges)
  }

  val dd7Oracle: String =
    """WITH RECURSIVE corpus AS (
      |  SELECT doc_id * 10 AS doc_id, lang, text FROM documents
      |  UNION ALL
      |  SELECT doc_id * 10 + 1, lang, regexp_replace(text, '^\S+', 'qqq')
      |  FROM documents WHERE doc_id < 5
      |  UNION ALL
      |  SELECT doc_id * 10 + 2, lang, regexp_replace(text, '^\S+', 'zzz')
      |  FROM documents WHERE doc_id < 5),
      |shingled AS (
      |  SELECT lang, doc_id,
      |    list_distinct(CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(1, len(toks) - 1),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [array_to_string(toks, ' ')] END) AS sh
      |  FROM (SELECT lang, doc_id,
      |          list_filter(string_split_regex(text, '\s+'),
      |            t -> t <> '') AS toks
      |        FROM corpus)),
      |paired AS (
      |  SELECT lang, doc_id AS id_a,
      |    lead(doc_id) OVER w AS id_b,
      |    sh AS sh_a, lead(sh) OVER w AS sh_b
      |  FROM shingled
      |  WINDOW w AS (PARTITION BY lang ORDER BY doc_id)),
      |edges0 AS (
      |  SELECT id_a, id_b FROM paired
      |  WHERE id_b IS NOT NULL
      |    AND CAST(len(list_distinct(list_intersect(sh_a, sh_b))) AS DOUBLE)
      |      / len(list_distinct(list_concat(sh_a, sh_b))) >= 0.4),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM edges0
      |  UNION ALL
      |  SELECT id_b, id_a FROM edges0),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM corpus
      |  UNION
      |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
      |labels AS (
      |  SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
      |SELECT doc_id, cluster_id,
      |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
      |  doc_id = cluster_id AS is_keeper
      |FROM labels""".stripMargin

  /** sq1 — the dd4 dedup chain driven ENTIRELY through the SQL surface:
    * plain `spark.sql` over a temp view, with the native kernels
    * ([[graft.functions.NgramJaccard]], [[graft.functions.MinHashSignature]])
    * reached through their [[graft.plans.GraftExtensions]] SQL
    * registrations rather than the Column API — the reference's query
    * layer is SQL (dbt models), so the extension operators must be
    * first-class there too. The Jaccard values are exact and DuckDB
    * re-derives them, so the row is hash-exact; `minhash_dim` drives the
    * MinHash kernel per-row (a registration or eval failure kills the
    * whole row). Same deliberately-degenerate lang blocking as dd4 (a
    * demo pairing, not the scale path — the LSH chains are that). */
  def sq1SqlDedupChain(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("sq1_documents")
    s.sql(
      """WITH paired AS (
        |  SELECT lang, doc_id AS id_a,
        |    lead(doc_id) OVER w AS id_b,
        |    text AS text_a, lead(text) OVER w AS text_b
        |  FROM sq1_documents
        |  WINDOW w AS (PARTITION BY lang ORDER BY doc_id))
        |SELECT lang, id_a, id_b,
        |  ngram_jaccard(text_a, text_b, 3) AS jaccard,
        |  size(minhash_signature(text_a, 3, 64)) AS minhash_dim
        |FROM paired WHERE id_b IS NOT NULL""".stripMargin)
  }

  val sq1Oracle: String =
    """WITH shingled AS (
      |  SELECT lang, doc_id,
      |    list_distinct(CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(1, len(toks) - 1),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [array_to_string(toks, ' ')] END) AS sh
      |  FROM (SELECT lang, doc_id,
      |          list_filter(string_split_regex(text, '\s+'),
      |            t -> t <> '') AS toks
      |        FROM documents)),
      |paired AS (
      |  SELECT lang, doc_id AS id_a,
      |    lead(doc_id) OVER w AS id_b,
      |    sh AS sh_a, lead(sh) OVER w AS sh_b
      |  FROM shingled
      |  WINDOW w AS (PARTITION BY lang ORDER BY doc_id))
      |SELECT lang, id_a, id_b,
      |  CAST(len(list_distinct(list_intersect(sh_a, sh_b))) AS DOUBLE) /
      |    len(list_distinct(list_concat(sh_a, sh_b))) AS jaccard,
      |  64 AS minhash_dim
      |FROM paired WHERE id_b IS NOT NULL""".stripMargin

  /** Memoized [[DedupIndex]] built from the documents corpus, one per
    * (JVM, dataset dir). */
  private val builtIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** dd9_incremental_dedup — INCREMENTAL cross-corpus dedup against the
    * lake-resident signature index: the corpus is indexed ONCE
    * (memoized; signatures + LSH postings as lake tables with bloom
    * sidecars on the probe keys), then a batch of planted derivatives
    * is classified WITHOUT re-reading corpus text — exact copies of
    * docs 0-4, first-token near-copies of docs 5-9, reversed (novel)
    * texts of docs 10-19, and a repeated reversed doc 10 (a
    * within-batch exact dup). The verdict's exact flags and keeper ids
    * are re-derived by the DuckDB oracle from content hashes; the near
    * flags land exactly on the planted near range (reversal shares no
    * shingles with the forward corpus, verified no natural pair in the
    * unique range). Unique docs are ADMITTED (replay-guarded by
    * batchId), and the classification is bit-stable across repeat
    * passes — after admission a doc's self-match is excluded by id and
    * within-batch keepers become corpus partners with the same minimum
    * id. */
  def dd9IncrementalDedup(s: SparkSession, d: String): DataFrame = {
    val dir = builtIndexes.computeIfAbsent(s"dd9:$d", _ => {
      val ix = java.nio.file.Files
        .createTempDirectory("graft-dedup-index-dd9").toString
      DedupIndex.buildIndex(Tables.documents(s, d), ix)
      ix
    })
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val batch =
      docs.filter(col("doc_id") < 5)
        .withColumn("doc_id", col("doc_id") + 100000)
      .unionByName(docs.filter(col("doc_id") >= 5 && col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 100000)
        .withColumn("text", regexp_replace(col("text"), "^\\S+", "qqq")))
      .unionByName(docs.filter(col("doc_id") >= 10 && col("doc_id") < 20)
        .withColumn("doc_id", col("doc_id") + 200000)
        .withColumn("text", reverse(col("text"))))
      .unionByName(docs.filter(col("doc_id") === 10)
        .withColumn("doc_id", col("doc_id") + 300000)
        .withColumn("text", reverse(col("text"))))
    // ONE classify per invocation: its verdict drives the admission and
    // is the output. The pre/post-admission verdicts are bit-identical
    // by the stability contract (spec-pinned), and the bench's repeat
    // pass re-classifies against the ADMITTED index anyway — so both
    // sides of the contract still run under the gate across passes.
    val verdict = graft.core.TransientCache.persist(
      DedupIndex.classifyBatch(s, batch, dir))
    DedupIndex.admit(s, batch, verdict, dir, batchId = 1L,
      appId = s"dd9:$d"): Unit
    verdict
  }

  /** Exact flags re-derived from content hashes over corpus ∪ batch
    * (corpus ids are always the smaller, so "min id sharing the hash"
    * is exactly the engine's corpus-first-then-earlier-batch rule);
    * near flags are the planted near range. */
  val dd9Oracle: String =
    """WITH batch AS (
      |  SELECT doc_id + 100000 AS doc_id, text
      |  FROM documents WHERE doc_id < 5
      |  UNION ALL
      |  SELECT doc_id + 100000, regexp_replace(text, '^\S+', 'qqq')
      |  FROM documents WHERE doc_id >= 5 AND doc_id < 10
      |  UNION ALL
      |  SELECT doc_id + 200000, reverse(text)
      |  FROM documents WHERE doc_id >= 10 AND doc_id < 20
      |  UNION ALL
      |  SELECT doc_id + 300000, reverse(text)
      |  FROM documents WHERE doc_id = 10),
      |allhash AS (
      |  SELECT doc_id, sha256(text) AS h FROM documents
      |  UNION ALL
      |  SELECT doc_id, sha256(text) AS h FROM batch),
      |grouped AS (
      |  SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS min_id
      |  FROM allhash)
      |SELECT g.doc_id,
      |  g.min_id < g.doc_id AS is_exact_dup,
      |  CASE WHEN g.min_id < g.doc_id THEN g.min_id END AS dup_of,
      |  g.min_id >= g.doc_id AND g.doc_id BETWEEN 100005 AND 100009
      |    AS is_near_dup
      |FROM grouped g
      |WHERE g.doc_id >= 100000""".stripMargin

  /** dd10_paragraph_dedup — cross-corpus paragraph-level exact dedup
    * through the gate. The test docs are single-line, so the row
    * constructs a paragraph corpus with REAL cross-document repetition
    * (the identical expression in both engines): each doc becomes its
    * own 120-char prefix plus the PREVIOUS doc's prefix as a second
    * paragraph — every prefix therefore appears twice (as doc i's
    * first paragraph and doc i+1's second), and the dedup must keep
    * exactly the first carrier and strip the repeat, doc 0's seed
    * paragraph surviving as a singleton. The lag() fixture runs over
    * one unpartitioned window — gate construction, not the operator
    * (which is keyed shuffles only; see [[Dedup.paragraphDedup]]).
    * The oracle re-derives split → first-occurrence → reassembly
    * relationally in DuckDB, text byte-for-byte. */
  def dd10ParagraphDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("doc_id"))
    val corpus = Tables.documents(s, d)
      .select(col("doc_id"), substring(col("text"), 1, 120).as("a"))
      .withColumn("text", concat(col("a"), lit("\n\n"),
        coalesce(lag(col("a"), 1).over(w), lit("seed paragraph"))))
      .select(col("doc_id"), col("text"))
    Dedup.paragraphDedup(corpus)
  }

  val dd10Oracle: String =
    """WITH base AS (
      |  SELECT doc_id, substr(text, 1, 120) AS a FROM documents),
      |corpus AS (
      |  SELECT doc_id, a || chr(10) || chr(10) ||
      |    COALESCE(lag(a) OVER (ORDER BY doc_id), 'seed paragraph')
      |    AS text
      |  FROM base),
      |paras AS (
      |  SELECT doc_id, g.i - 1 AS pos,
      |    string_split(text, chr(10) || chr(10))[g.i] AS para
      |  FROM corpus, LATERAL (
      |    SELECT unnest(range(1,
      |      len(string_split(text, chr(10) || chr(10))) + 1)) AS i) g),
      |keyed AS (
      |  SELECT doc_id, pos, para, sha256(para) AS h,
      |    CAST(doc_id AS BIGINT) * 1048576 + pos AS okey
      |  FROM paras),
      |first AS (SELECT h, min(okey) AS first_okey FROM keyed GROUP BY h),
      |kept AS (
      |  SELECT k.doc_id, k.pos, k.para FROM keyed k
      |  JOIN first f ON k.h = f.h AND k.okey = f.first_okey),
      |rebuilt AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |    string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text_dedup
      |  FROM kept GROUP BY doc_id),
      |counts AS (SELECT doc_id, count(*) AS n_paras FROM keyed GROUP BY doc_id)
      |SELECT c.doc_id, COALESCE(r.text_dedup, '') AS text_dedup,
      |  c.n_paras, COALESCE(r.n_kept, 0) AS n_kept
      |FROM counts c LEFT JOIN rebuilt r ON c.doc_id = r.doc_id""".stripMargin

  /** dd12 — the PassJoin edit-distance similarity join through the
    * gate: every document pair whose 32-char normalized prefix is
    * within Levenshtein distance 2, found by exact-complete segment
    * blocking ([[Dedup.editDistanceJoin]]) — and the oracle BRUTE
    * FORCES the full cross product in DuckDB, so any pair the
    * blocking misses (or invents) is a hash mismatch. The strongest
    * possible check of a blocking scheme: the gate compares a
    * never-all-pairs plan against the all-pairs ground truth. */
  def dd12EditDistanceJoin(s: SparkSession, d: String): DataFrame =
    Dedup.editDistanceJoin(Tables.documents(s, d))

  val dd12Oracle: String =
    """WITH s AS (
      |  SELECT doc_id, substr(lower(text), 1, 32) AS s
      |  FROM documents
      |  WHERE length(substr(lower(text), 1, 32)) > 2)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  levenshtein(a.s, b.s) AS dist
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE levenshtein(a.s, b.s) <= 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd12_edit_distance_join" -> (dd12EditDistanceJoin _),
    "dd10_paragraph_dedup" -> (dd10ParagraphDedup _),
    "dd9_incremental_dedup" -> (dd9IncrementalDedup _),
    "sq1_sql_dedup_chain" -> (sq1SqlDedupChain _),
    "dd1_exact_dedup" -> (dd1ExactDedup _),
    "dd2_minhash_lsh" -> (dd2MinhashLsh _),
    "dd3_simhash" -> (dd3Simhash _),
    "dd4_ngram_jaccard" -> (dd4NgramJaccard _),
    "dd8_ngram_containment" -> (dd8NgramContainment _),
    "dd13_duplicated_spans" -> (dd13DuplicatedSpans _),
    "dd14_span_removal" -> (dd14SpanRemoval _),
    "dd5_embed_neardup" -> (dd5EmbedNearDup _),
    "dd11_semantic_dedup" -> (dd11SemanticDedup _),
    "dd6_winnow" -> (dd6Winnow _),
    "dd7_dedup_clusters" -> (dd7DedupClusters _))

  val oracles: Map[String, String] = Map(
    "dd2_minhash_lsh" -> dd2Oracle,
    "dd3_simhash" -> dd3Oracle,
    "dd5_embed_neardup" -> dd5Oracle,
    "dd6_winnow" -> dd6Oracle,
    "dd12_edit_distance_join" -> dd12Oracle,
    "dd10_paragraph_dedup" -> dd10Oracle,
    "dd9_incremental_dedup" -> dd9Oracle,
    "sq1_sql_dedup_chain" -> sq1Oracle,
    "dd1_exact_dedup" -> dd1Oracle,
    "dd4_ngram_jaccard" -> dd4Oracle,
    "dd8_ngram_containment" -> dd8Oracle,
    "dd13_duplicated_spans" -> dd13Oracle,
    "dd14_span_removal" -> dd14Oracle,
    "dd7_dedup_clusters" -> dd7Oracle,
    "dd11_semantic_dedup" -> dd11Oracle)
}
