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

  /** An order-preserving NUMERIC code for a STRING column — what lets a
    * string dimension ride the same equi-depth quantile bucketing as a
    * numeric one: the first SEVEN UTF-8 bytes, right-padded with zeros
    * and read big-endian as a long. Unsigned byte order over UTF-8 IS
    * code-point order, so `code(a) < code(b)` implies `a < b` on the
    * 7-byte truncation — the same truncated-key contract the recorded
    * [[ManifestLake.StrRange]] stats use, so boundaries derived from
    * the code cluster consistently with how reads prune. Seven bytes,
    * not eight, keeps the code in 56 bits: always positive in a signed
    * long AND exactly representable, where an 8-byte code pushed to
    * ~2^63 exceeds double precision (ULP ≈ 1024) and quantile
    * boundaries would collapse adjacent keys differing only in their
    * low bytes — measured as 11/16 candidate files instead of ≤ 8 on a
    * shared-prefix id column. Pure built-in column ops
    * (encode/hex/rpad/conv), fully codegen'd. */
  private[sources] def strPrefixCode(c: Column): Column =
    conv(rpad(hex(substring(encode(c, "UTF-8"), 1, 7)), 14, "0"),
      16, 10).cast("bigint")

  /** The clustering WITHOUT the lake commit — the shared kernel
    * [[writeZOrdered]] and the open-format interop OPTIMIZE paths
    * rewrite through: bucket each `zCols` by its own equi-depth
    * boundaries, interleave into a z-value, range-cluster into
    * `nFiles` output partitions sorted within. One approxQuantile
    * pass sketches every dimension. */
  private[sources] def clusterByZ(df: DataFrame, zCols: Seq[String],
                                  nFiles: Int): DataFrame = {
    require(zCols.nonEmpty, "z-ordering needs at least one column")
    val nBuckets = 1 << BitsPerDim
    def isStr(c: String) = df.schema.fields
      .find(_.name.equalsIgnoreCase(c))
      .exists(_.dataType == org.apache.spark.sql.types.StringType)
    // ONE dimension needs no interleave: a plain range cluster on the
    // column's numeric view is the exact (not bit-approximate)
    // ordering — what liquid-clustered tables with a single recorded
    // clustering column get from OPTIMIZE
    if (zCols.size == 1) {
      val c = zCols.head
      val view = if (isStr(c)) strPrefixCode(col(c))
                 else col(c).cast("double")
      return df.withColumn("__z", view)
        .repartitionByRange(nFiles, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    }
    // each dimension ranks through a numeric view: strings by their
    // order-preserving prefix code, everything else by a double cast;
    // the views are temporary columns so ONE approxQuantile pass (it
    // takes column NAMES) covers every dimension's sketch
    val rankCols = zCols.indices.map(i => s"__zrank_$i")
    val ranked = zCols.zip(rankCols).foldLeft(df) { case (d, (c, rc)) =>
      d.withColumn(rc,
        if (isStr(c)) strPrefixCode(col(c)) else col(c).cast("double"))
    }
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val quantiles = ranked.stat.approxQuantile(
      rankCols.toArray, probs, 0.001)
    val buckets = rankCols.zip(quantiles).map { case (rc, qs) =>
      val bs = qs.distinct.sorted
      // STRETCH the rank to fill [0, 2^bits): a low-cardinality
      // dimension (fewer distinct quantile boundaries than buckets —
      // e.g. a truncated string key with 100 distinct prefixes) would
      // otherwise never set its high bucket bits, and since high bits
      // dominate the z-value, range partitioning would split almost
      // entirely on the other dimensions, silently killing this one's
      // pruning (measured: 11/16 candidates instead of ≤ 8/16).
      // Multiply-then-divide: products stay ≤ 255², exact in the
      // double division `/` lowers to; floor brings the scaled rank
      // back to the long bucket index interleave expects.
      floor(bucketOf(col(rc), bs) * lit((nBuckets - 1).toLong) /
        lit(math.max(bs.length, 1).toLong)).cast("long")
    }
    val z = interleave(buckets)
    ranked.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z").drop(rankCols: _*)
  }

  /** Z-ordered lake write: bucket each `zCols` by its own equi-depth
    * boundaries, interleave into a z-value, range-cluster the data on
    * it, and commit through the manifest with per-file min/max recorded
    * for EVERY z-column — after which [[ManifestLake.readRange]] /
    * [[ManifestLake.readRangeStr]] (and merge/delete candidate pruning)
    * skip files on any of the dimensions. STRING columns z-order
    * through their truncated-key code ([[strPrefixCode]]) and record
    * truncated [[ManifestLake.StrRange]] stats, so a (doc_id, score)
    * pair clusters and prunes on both. Returns the committed version. */
  def writeZOrdered(df: DataFrame, table: String, zCols: Seq[String],
                    nFiles: Int, append: Boolean = false,
                    maintenance: Boolean = false): Long = {
    val clustered = clusterByZ(df, zCols, nFiles)
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
