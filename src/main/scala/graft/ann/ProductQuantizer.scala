package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PqCodec

/** Product quantization (Jégou et al., TPAMI 2011) — the vector
  * COMPRESSION tier of similarity search, composing with the IVF tier
  * ([[Similarity.ivfIndex]]) exactly as in the canonical IVF-PQ design.
  *
  * Why this is the 100 TB path: a 64-dim float embedding is 256 bytes;
  * its PQ code under the demo shape (m=16 subspaces, ksub=16 codewords)
  * is 16 small ints — and the candidate-generation scan reads ONLY
  * `(id, code)`, never the embedding column. Parquet column pruning
  * makes the ADC pass IO ~16× narrower than any scan that touches the
  * vectors; the exact reranker then reads embeddings for just the
  * `rerank` surviving candidates via a broadcast semi-join. At a
  * billion vectors the ADC pass is the only full scan, and it is the
  * narrow one.
  *
  * Division of labor:
  *   - [[train]] fits the codebooks on a bounded seeded sample,
  *     driver-side (same philosophy as the IVF coarse quantizer fit —
  *     centroid placement needs a representative sample, never the full
  *     table; the sample is ≤ `fitSampleRows` rows of `m·dsub` doubles).
  *   - [[encode]] is one codegen'd projection over the full table
  *     ([[graft.functions.PqEncode]]) — the single full-data pass.
  *   - [[adcTopK]] is the query path: per-query LUT (m·ksub doubles,
  *     driver-side), narrow ADC scan + TakeOrdered candidate heap,
  *     exact-cosine rerank of the candidates only.
  *
  * Training and encoding NORMALIZE vectors (spherical, like the IVF
  * tier): the index serves cosine queries, and on unit vectors the
  * inner-product ADC score approximates cosine directly.
  */
object ProductQuantizer {

  /** A trained codebook: `codewords(sub)(j)` is the dsub-dim codeword
    * `j` of subspace `sub` (fit on normalized subvectors). */
  final case class PqModel(m: Int, ksub: Int, dsub: Int,
                           codewords: Array[Array[Array[Double]]]) {
    require(codewords.length == m && codewords.forall(_.length == ksub) &&
      codewords.forall(_.forall(_.length == dsub)),
      s"codebook shape != $m x $ksub x $dsub")

    /** The flat layout both native expressions consume:
      * `(sub*ksub + j)*dsub + t`. */
    lazy val flat: Array[Double] = {
      val out = new Array[Double](m * ksub * dsub)
      var sub = 0
      while (sub < m) {
        var j = 0
        while (j < ksub) {
          System.arraycopy(codewords(sub)(j), 0, out,
            (sub * ksub + j) * dsub, dsub)
          j += 1
        }
        sub += 1
      }
      out
    }
  }

  /** Fit `m` per-subspace codebooks of `ksub` codewords each on a
    * bounded seeded sample of NORMALIZED vectors. Deterministic: seeded
    * sample, seeded k-means++ init, fixed iteration budget — two trains
    * over the same data produce the same model (the gate row and the
    * spec depend on that). Lloyd's runs driver-side over the collected
    * sample: the sample is bounded (≤ fitSampleRows·1.2 expected rows),
    * so a distributed fit would spend more on scheduling than the math;
    * the full table is never read by training at all. */
  def train(embeddings: DataFrame, m: Int = 16, ksub: Int = 16,
            seed: Long = 13L, embCol: String = "embedding",
            fitSampleRows: Int = 4096): PqModel = {
    val n = math.max(embeddings.count(), 1L)
    val fraction = math.min(1.0, fitSampleRows.toDouble * 1.2 / n)
    // content-addressed sample + canonical sort, like the IVF coarse
    // fit: the codebooks become a pure function of sample CONTENT —
    // invariant under partitioning and reprocessing (rdd.sample and
    // collect order are not)
    val cut = (fraction * (1L << 40).toDouble).toLong
    val rows = embeddings
      .filter(pmod(xxhash64(lit(seed), col(embCol)), lit(1L << 40)) < cut)
      .select(col(embCol).cast("array<double>").as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "pq train: empty sample")
    val dim = rows.head.length
    require(dim % m == 0, s"pq train: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val normalized = rows.map { v =>
      val n2 = v.map(x => x * x).sum
      if (n2 == 0.0) v else v.map(_ / math.sqrt(n2))
    }
    java.util.Arrays.sort(normalized,
      (a: Array[Double], b: Array[Double]) => java.util.Arrays.compare(a, b))
    val books = Array.tabulate(m) { sub =>
      val subVecs = normalized.map(v =>
        java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub))
      lloyd(subVecs, ksub, new scala.util.Random(seed * 1000003L + sub))
    }
    PqModel(m, ksub, dsub, books)
  }

  /** Seeded k-means++ init + bounded Lloyd iterations over a driver-side
    * sample. An emptied cluster re-seeds from the point farthest from
    * its assigned center (the standard repair, keeps ksub codewords
    * meaningful when ksub approaches the sample's diversity). */
  private[ann] def lloyd(points: Array[Array[Double]], k: Int,
                         rnd: scala.util.Random, iters: Int = 25)
      : Array[Array[Double]] = {
    val d = points.head.length
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val x = a(i) - b(i); s += x * x; i += 1 }
      s
    }
    // k-means++ seeding
    val centers = new Array[Array[Double]](k)
    centers(0) = points(rnd.nextInt(points.length)).clone()
    val minD = points.map(p => dist2(p, centers(0)))
    var c = 1
    while (c < k) {
      val total = minD.sum
      centers(c) =
        if (total <= 0.0) points(rnd.nextInt(points.length)).clone()
        else {
          var r = rnd.nextDouble() * total
          var i = 0
          while (i < points.length - 1 && r > minD(i)) { r -= minD(i); i += 1 }
          points(i).clone()
        }
      var i = 0
      while (i < points.length) {
        val dd = dist2(points(i), centers(c))
        if (dd < minD(i)) minD(i) = dd
        i += 1
      }
      c += 1
    }
    val assign = new Array[Int](points.length)
    var it = 0
    while (it < iters) {
      var moved = false
      var i = 0
      while (i < points.length) {
        var best = 0; var bd = dist2(points(i), centers(0))
        var j = 1
        while (j < k) {
          val dd = dist2(points(i), centers(j))
          if (dd < bd) { bd = dd; best = j }
          j += 1
        }
        if (assign(i) != best || it == 0) { assign(i) = best; moved = true }
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      i = 0
      while (i < points.length) {
        val a = assign(i); counts(a) += 1
        var t = 0
        while (t < d) { sums(a)(t) += points(i)(t); t += 1 }
        i += 1
      }
      var j = 0
      while (j < k) {
        if (counts(j) > 0) {
          var t = 0
          while (t < d) { centers(j)(t) = sums(j)(t) / counts(j); t += 1 }
        } else {
          // re-seed an empty cluster from the globally farthest point
          var far = 0; var fd = -1.0
          var p = 0
          while (p < points.length) {
            val dd = dist2(points(p), centers(assign(p)))
            if (dd > fd) { fd = dd; far = p }
            p += 1
          }
          centers(j) = points(far).clone()
        }
        j += 1
      }
      if (!moved) it = iters
      it += 1
    }
    centers
  }

  /** ONE codegen'd projection adding the `array<int>` code column —
    * the single full-table pass PQ ever makes. */
  def encode(df: DataFrame, model: PqModel, embCol: String = "embedding",
             out: String = "pq_code"): DataFrame =
    df.withColumn(out,
      PqCodec.encode(col(embCol), model.flat, model.m, model.ksub, model.dsub))

  /** The per-query ADC lookup table: `lut(sub*ksub + j)` =
    * q̂_sub · codeword(sub)(j). Σ over subspaces of the entry each code
    * picks ≈ q̂ · v̂ = cosine(q, v). Driver-side, m·ksub doubles. */
  def lut(model: PqModel, queryVec: Array[Double]): Array[Double] = {
    require(queryVec.length == model.m * model.dsub,
      s"query dim ${queryVec.length} != ${model.m * model.dsub}")
    val n2 = queryVec.map(x => x * x).sum
    val q = if (n2 == 0.0) queryVec else queryVec.map(_ / math.sqrt(n2))
    Array.tabulate(model.m * model.ksub) { sj =>
      val sub = sj / model.ksub
      val j = sj % model.ksub
      var s = 0.0; var t = 0
      while (t < model.dsub) {
        s += q(sub * model.dsub + t) * model.codewords(sub)(j)(t)
        t += 1
      }
      s
    }
  }

  /** ADC score column for one query over an encoded frame. */
  def adcScore(model: PqModel, queryVec: Array[Double],
               codeCol: String = "pq_code"): Column =
    PqCodec.adcScore(col(codeCol), lut(model, queryVec), model.m, model.ksub)

  /** The two-stage PQ query: NARROW candidate generation + targeted
    * exact rerank.
    *
    * Stage 1 selects ONLY `(idCol, codeCol)` before scoring, so when
    * `encoded` is a parquet-backed (or cached) table the scan is
    * column-pruned to the id and the m-int code — the embedding column
    * is never read here. `orderBy.limit` plans TakeOrdered (per-partition
    * candidate heap + driver merge, no global sort). Stage 2 broadcasts
    * the ≤`rerank` candidate ids back onto `exact` (which carries the
    * embeddings) and ranks true cosine — identical tie-break contract to
    * [[Similarity.bruteForceTopK]] (cosine desc, id asc; NaN excluded).
    *
    * An optional `candidateFilter` (e.g. an IVF cell-membership
    * predicate) composes at stage 1, where it prunes the narrow scan —
    * the IVF-PQ composition. */
  def adcTopK(encoded: DataFrame, exact: DataFrame, model: PqModel,
              queryVec: Array[Double], k: Int, rerank: Int,
              idCol: String = "vec_id", embCol: String = "embedding",
              codeCol: String = "pq_code",
              candidateFilter: Option[Column] = None): DataFrame = {
    require(rerank >= k, s"rerank pool $rerank must cover k=$k")
    val narrow = candidateFilter.fold(encoded)(encoded.filter)
      .select(col(idCol), col(codeCol))
      .withColumn("adc_score", adcScore(model, queryVec, codeCol))
    val candidates = narrow
      .orderBy(col("adc_score").desc, col(idCol).asc)
      .limit(rerank)
      .select(col(idCol))
    exact.join(broadcast(candidates), Seq(idCol))
      .withColumn("cosine",
        Similarity.cosine(col(embCol).cast("array<double>"),
          array(queryVec.map(lit).toIndexedSeq: _*)))
      .filter(!isnan(col("cosine"))) // zero-norm vectors never rank
      .orderBy(col("cosine").desc, col(idCol).asc)
      .select(col(idCol), col("cosine"))
      .limit(k)
  }
}
