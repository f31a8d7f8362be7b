package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering for the manifest lake — the
  * `OPTIMIZE ZORDER BY` analog. A 1-D clustered write
  * ([[ManifestLake.writeClustered]]) makes range queries on ONE column
  * skip files; queries on any other column scan the table. Z-ordering
  * interleaves the bits of several columns' rank-bucket indices into
  * one sort key, so every output file covers a small hyper-rectangle of
  * the combined space — and with per-file stats recorded for EVERY
  * z-column ([[ManifestLake.FileEntry]] is multi-column since r7), a
  * narrow range on ANY of them prunes at the manifest level. The cost
  * model is the clustered write's: one range shuffle at write time,
  * amortized over every future read on any clustered dimension.
  *
  * Bucketing is EQUI-DEPTH (approxQuantile boundaries, one combined
  * pass for all columns), not equi-width: a skewed column's hot range
  * still spreads across buckets, which is what keeps file ranges tight
  * under real distributions. Boundaries are a driver-side array of ≤
  * `bits²` doubles per column — broadcast-scale metadata, never a
  * shuffle. NULL z-column values sort to bucket 0 (lowest), mirroring
  * NULLS FIRST.
  */
object ZOrder {

  /** Bits per dimension: 8 ⇒ 256 rank buckets each, 2 dims ⇒ 16-bit
    * z-values — granular enough to order thousands of files. */
  val BitsPerDim = 8

  /** The interleaved-bit z-value of the given bucket-index columns
    * (each in `[0, 2^bits)`): column i contributes its bit b to output
    * position `b * n + (n − 1 − i)`. Pure `shift`/`and`/`or` column
    * arithmetic — codegen-friendly, no UDF. LONG arithmetic throughout
    * ([[bucketOf]] emits long buckets): in 32-bit ints, 4 dims × 8 bits
    * put the top bucket's bit on bit 31 (the sign bit, inverting range
    * order) and ≥ 5 dims wrap shift amounts mod 32 into colliding
    * positions — a silently corrupted key that degrades clustering while
    * results stay correct. A long holds 64 interleaved bits, and the
    * require rejects anything wider by name instead of wrapping. */
  private[sources] def interleave(buckets: Seq[Column],
                                  bits: Int = BitsPerDim): Column = {
    val n = buckets.size
    require(n * bits <= 63,
      s"z-order interleaving $n columns × $bits bits needs ${n * bits} " +
        "bits — a signed long key holds at most 63. Use fewer z-columns " +
        "or fewer bits per dimension.")
    val terms = for {
      (b, i) <- buckets.zipWithIndex
      bit <- 0 until bits
    } yield shiftleft(
      shiftrightunsigned(b, bit).bitwiseAND(lit(1L)),
      bit * n + (n - 1 - i))
    terms.reduce(_.bitwiseOR(_))
  }

  /** The rank-bucket index (0-based) of `c` against sorted equi-depth
    * `bounds`: the count of boundaries ≤ value, capped into
    * `[0, 2^bits)`. Unrolled comparisons over ≤ 255 literal boundaries
    * — a balanced conditional tree after codegen, no interpreted HOF,
    * no per-row allocation. Long-typed so [[interleave]]'s shifts never
    * touch 32-bit sign/wrap territory. */
  private[sources] def bucketOf(c: Column, bounds: Array[Double]): Column =
    bounds.foldLeft(lit(0L))((acc, b) =>
      acc + when(c.isNotNull && c >= b, 1L).otherwise(0L))

  /** Z-ordered lake write: bucket each `zCols` by its own equi-depth
    * boundaries, interleave into a z-value, range-cluster the data on
    * it, and commit through the manifest with per-file min/max recorded
    * for EVERY z-column — after which [[ManifestLake.readRange]] (and
    * merge/delete candidate pruning) skips files on any of the
    * dimensions. Returns the committed version. */
  def writeZOrdered(df: DataFrame, table: String, zCols: Seq[String],
                    nFiles: Int, append: Boolean = false,
                    maintenance: Boolean = false): Long = {
    require(zCols.size >= 2,
      "z-ordering needs ≥ 2 columns; use writeClustered for one")
    val nBuckets = 1 << BitsPerDim
    // one combined pass computes every column's quantile sketch
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val quantiles = df.stat.approxQuantile(
      zCols.map(c => c).toArray, probs, 0.001)
    val buckets = zCols.zip(quantiles).map { case (c, qs) =>
      bucketOf(col(c).cast("double"), qs.distinct.sorted)
    }
    val z = interleave(buckets)
    val clustered = df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    ManifestLake.write(clustered, table, append = append,
      statsCols = zCols,
      // a maintenance rewrite re-lands rows that already passed CHECK
      // enforcement; re-validating would re-read the table for nothing
      validateChecks = !maintenance,
      maintenance = maintenance)
  }

  /** OPTIMIZE-shaped z-order maintenance: rewrite the CURRENT snapshot
    * z-ordered on `zCols` as a net-zero maintenance commit (streams and
    * incremental consumers skip it), sized from the manifest's recorded
    * bytes like [[ManifestLake.compact]]. */
  def optimize(spark: org.apache.spark.sql.SparkSession, table: String,
               zCols: Seq[String],
               targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val snap = ManifestLake.snapshot(spark, table)
    val (fs, p) = {
      val path = new org.apache.hadoop.fs.Path(table)
      (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
    }
    val bytes = snap.entries.map(e => e.bytes.getOrElse(
      fs.getFileStatus(new org.apache.hadoop.fs.Path(p, e.path)).getLen)).sum
    val nFiles = math.max(1,
      math.ceil(bytes.toDouble / targetFileBytes).toInt)
    writeZOrdered(ManifestLake.read(spark, table, Some(snap.version)),
      table, zCols, nFiles, append = false, maintenance = true)
  }
}
