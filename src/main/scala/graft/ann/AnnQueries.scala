package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Correctness-gate entries for similarity search over `embeddings`. */
object AnnQueries {

  val QueryId = 0L
  val K = 10
  private val Dim = 64 // embeddings table dimension (TESTDATA.md)

  /** nn1 — exact brute-force cosine top-k. The fold order in
    * [[Similarity.dotFold]] is strict left-to-right, so the doubles are
    * bit-reproducible and the DuckDB oracle (an explicit left-associated
    * 64-term chain) hash-matches exactly. */
  def nn1BruteTopK(s: SparkSession, d: String): DataFrame =
    Similarity.bruteForceTopK(Tables.embeddings(s, d), QueryId, K)

  val nn1Oracle: String = {
    def chain(f: Int => String): String = (1 to Dim).map(f).mkString(" + ")
    val dot = chain(i => s"e.emb[$i] * q.emb[$i]")
    val nE = chain(i => s"e.emb[$i] * e.emb[$i]")
    val nQ = chain(i => s"q.emb[$i] * q.emb[$i]")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |           FROM embeddings),
       |q AS (SELECT emb FROM v WHERE vec_id = $QueryId),
       |e AS (SELECT * FROM v WHERE vec_id <> $QueryId)
       |SELECT e.vec_id,
       |  ($dot) / (sqrt($nQ) * sqrt($nE)) AS cosine
       |FROM e, q
       |ORDER BY cosine DESC, e.vec_id ASC
       |LIMIT $K""".stripMargin
  }

  /** nn2 — IVF-probed top-k (16 cells, probe 4): the scale path. Cell
    * assignment comes from K-Means (engine-internal init → rows-only
    * driver check); recall vs. the exact baseline is pinned in AnnSpec. */
  def nn2IvfTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val (assigned, centroids) = Similarity.ivfIndex(emb, nCells = 16)
    val queryVec = emb.filter(col("vec_id") === QueryId)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    Similarity.ivfTopK(assigned.filter(col("vec_id") =!= QueryId),
      centroids, queryVec, K, nProbe = 4)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nn1_brute_topk" -> (nn1BruteTopK _),
    "nn2_ivf_topk" -> (nn2IvfTopK _))

  val oracles: Map[String, String] = Map(
    "nn1_brute_topk" -> nn1Oracle)
}
