package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HYBRID retrieval — fuse lexical (BM25) and vector (cosine) rankings
  * into one list, the standard RAG retrieval shape: each ranker sees
  * what the other is blind to (exact terms vs. paraphrase), and the
  * fusion needs no score calibration because it consumes RANKS only.
  *
  * Reciprocal Rank Fusion (Cormack et al., SIGIR'09 — public method):
  * `rrf(d) = Σ_lists 1 / (k0 + rank_list(d))`, documents absent from a
  * list contributing nothing. k0 = 60 is the paper's constant;
  * it damps the head so one ranker's #1 cannot dominate consensus.
  *
  * Scale shape: the inputs are BOUNDED CANDIDATE LISTS (each ranker's
  * top-N — at 100 TB the rankers themselves prune: BM25 from the
  * term-clustered postings index, cosine from the IVF cells), so the
  * unpartitioned rank window here orders N ≪ corpus rows per list,
  * and the fusion is one union + one tiny groupBy. Fusing unbounded
  * corpora is meaningless (every rank past the candidate pool is
  * noise) and refused by contract, not by code.
  *
  * Determinism: ranks are integers, contributions are exact IEEE
  * divisions, and a document appears in ≤ `lists.size` lists — for
  * the two-list hybrid the sum is a single commutative addition, so
  * the fused score is bit-reproducible against the SQL oracle. */
object HybridRetrieval {

  /** Fuse ranked lists by RRF. Each entry is `(list, scoreCol)`; the
    * list's rank is its `scoreCol` descending, ties broken by `idCol`
    * ascending (every ranker in this module emits that contract).
    * Returns the top `topK` of `(idCol, rrf, lists_hit)` — `rrf`
    * rounded to 6 places AFTER the cut (the cut orders on the exact
    * value), `lists_hit` the consensus width. */
  def rrfFuse(lists: Seq[(DataFrame, String)], idCol: String,
              k0: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "RRF needs at least one ranked list")
    require(k0 > 0, "the RRF damping constant must be positive")
    val contributions = lists.map { case (df, scoreCol) =>
      df.select(col(idCol),
          row_number().over(
            Window.orderBy(col(scoreCol).desc, col(idCol).asc)).as("__r"))
        .select(col(idCol),
          (lit(1.0) / (lit(k0) + col("__r"))).as("__c"))
    }
    contributions.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("__rrf"),
        count(lit(1)).as("lists_hit"))
      .orderBy(col("__rrf").desc, col(idCol).asc)
      .limit(topK)
      .select(col(idCol), round(col("__rrf"), 6).as("rrf"),
        col("lists_hit"))
  }
}
