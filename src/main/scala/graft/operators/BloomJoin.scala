package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-pre-filtered left-anti join — the 100 TB referential-integrity
  * shape (VERDICT r1 nominated it for the r4 check).
  *
  * A plain shuffled anti-join moves EVERY left row to its key reducer.
  * Here the right side first collapses into one compact bloom filter
  * (a single small aggregate, broadcast as a 1-row frame); left rows the
  * bloom definitely excludes are anti-join results by construction and
  * skip the shuffle entirely — only the `might_contain` survivors (true
  * matches + the bloom's false-positive fraction) pay for the exact
  * anti-join. Result is IDENTICAL to the plain anti-join: the bloom only
  * prunes, false positives are re-checked exactly.
  */
object BloomJoin {

  def preFilteredLeftAnti(left: DataFrame, right: DataFrame,
                          leftKey: String, rightKey: String,
                          estimatedRightRows: Long = 1000000L): DataFrame = {
    // The bloom aggregate's size is bounded by numBits (not by the data),
    // so collecting the single sketch row to the driver and inlining it
    // as a literal is safe at any scale — `might_contain` requires a
    // constant (or scalar subquery) filter anyway; this mirrors how
    // Spark's own InjectRuntimeFilter ships blooms.
    val bfBytes = right.agg(
        expr(s"bloom_filter_agg(xxhash64($rightKey), ${estimatedRightRows}L)")
          .as("__bf"))
      .collect().head.getAs[Array[Byte]]("__bf")
    // bloom_filter_agg over ZERO rows yields NULL, and might_contain(NULL)
    // is NULL — which both filter branches would drop, turning "anti-join
    // against an empty right" (= every left row) into an empty result.
    // An empty right side excludes nothing: return the left as-is.
    if (bfBytes == null) return left
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val mightContain = ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnBridge.expression(lit(bfBytes)),
        ColumnBridge.expression(xxhash64(col(leftKey)))))
    // persist: the two filter branches below would otherwise each rescan
    // (and re-bloom) the full left side — scoped via TransientCache so a
    // long-lived session frees it after the consuming action
    val tagged = graft.core.TransientCache.persist(
      left.withColumn("__maybe", mightContain))
    val definiteMisses = tagged.filter(!col("__maybe")).drop("__maybe")
    val needExactCheck = tagged.filter(col("__maybe")).drop("__maybe")
    // alias the right key so same-named left/right keys (the common
    // referential-integrity shape) don't make the join condition an
    // ambiguous self-comparison
    definiteMisses.unionByName(
      needExactCheck.join(right.select(col(rightKey).as("__bj_rkey")),
        col(leftKey) === col("__bj_rkey"), "left_anti"))
  }
}
