package graft.ann

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Three tiers, by scale:
  *   - [[bruteForceTopK]] — exact cosine top-k via a single scan +
  *     TakeOrdered. The correctness baseline; O(N·d) per query. The
  *     arithmetic is a strict left-to-right fold in element order, so the
  *     result is bit-reproducible (and DuckDB-oracle-checkable).
  *   - [[ivfTopK]] — inverted-file search: K-Means coarse quantizer
  *     assigns each vector to a cell; queries probe only the `nProbe`
  *     nearest cells. Cuts the scan by ~nCells/nProbe at the cost of
  *     recall; the cell assignment is a one-off batch job and the probe
  *     filter pushes down to the cell column.
  *   - [[hyperplanePairs]] — sign-sketch LSH for all-pairs near-dup
  *     mining: deterministic pseudo-random hyperplanes → bit sketch →
  *     banded bucket join → exact cosine verify. Bucketed, never N².
  */
object Similarity {

  /** Strict sequential-fold dot product over double arrays — the
    * evaluation order is part of the contract (bit-reproducibility). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0),
      (acc: Column, x: Column) => acc + x)

  def norm2Fold(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0.0),
      (acc: Column, x: Column) => acc + x)

  /** Cosine similarity between two double-array columns. */
  def cosine(a: Column, b: Column): Column =
    dotFold(a, b) / (sqrt(norm2Fold(a)) * sqrt(norm2Fold(b)))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k nearest by cosine to the vector of `queryId`, excluding
    * the query row. Single scan; `orderBy.limit` plans TakeOrdered (a
    * per-partition k-heap + driver merge, never a global sort). */
  def bruteForceTopK(embeddings: DataFrame, queryId: Long, k: Int,
                     idCol: String = "vec_id",
                     embCol: String = "embedding"): DataFrame = {
    val query = embeddings.filter(col(idCol) === queryId)
      .select(asDouble(col(embCol)).as("q"))
    embeddings.crossJoin(broadcast(query))
      .filter(col(idCol) =!= queryId)
      .withColumn("cosine", cosine(asDouble(col(embCol)), col("q")))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .select(col(idCol), col("cosine"))
      .limit(k)
  }

  /** IVF index: assign every vector to its nearest of `nCells` K-Means
    * centroids. Returns (assignments with a `cell` column, fitted model).
    * At scale the assignment job is one pass and the index is just an
    * extra int column — re-clusterable offline, partitionable by cell. */
  def ivfIndex(embeddings: DataFrame, nCells: Int, seed: Long = 7L,
               embCol: String = "embedding"): (DataFrame, Array[Array[Double]]) = {
    val featured = embeddings.withColumn("features",
      array_to_vector(asDouble(col(embCol))))
    val model = new KMeans().setK(nCells).setSeed(seed).fit(featured)
    val assigned = model.transform(featured)
      .withColumnRenamed("prediction", "cell").drop("features")
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** IVF probe: compute the query's `nProbe` nearest cells driver-side
    * (centroid table is tiny), then brute-force ONLY those cells. The
    * cell filter prunes ~ (1 - nProbe/nCells) of the scan. */
  def ivfTopK(assigned: DataFrame, centroids: Array[Array[Double]],
              queryVec: Array[Double], k: Int, nProbe: Int,
              idCol: String = "vec_id",
              embCol: String = "embedding"): DataFrame = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val probeCells = centroids.zipWithIndex
      .sortBy { case (c, _) => -cos(c, queryVec) }
      .take(nProbe).map(_._2)
    val q = array(queryVec.map(lit).toIndexedSeq: _*)
    assigned
      .filter(col("cell").isInCollection(probeCells))
      .withColumn("cosine", cosine(asDouble(col(embCol)), q))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .select(col(idCol), col("cell"), col("cosine"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 folded into [-1, 1]. No RNG state — reproducible across
    * executors and runs by construction. */
  private def planeComponent(p: Column, i: Column): Column =
    (pmod(xxhash64(p, i), lit(2000001)).cast("double") / 1000000.0) - 1.0

  /** Sign-sketch: bit p = (v · plane_p) > 0, packed into a long. */
  def withSketch(embeddings: DataFrame, nPlanes: Int = 16,
                 embCol: String = "embedding",
                 out: String = "sketch"): DataFrame = {
    require(nPlanes <= 63, "sketch packs into a single long")
    val v = asDouble(col(embCol))
    val packed = (0 until nPlanes).map { p =>
      val dot = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * planeComponent(lit(p), i)),
        lit(0.0), (acc: Column, x: Column) => acc + x)
      when(dot > 0, lit(1L << p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    embeddings.withColumn(out, packed)
  }

  /** Embedding near-dup pairs: sketch → banded chunks → bucket join →
    * exact cosine ≥ threshold. */
  def hyperplanePairs(embeddings: DataFrame, threshold: Double = 0.9,
                      nPlanes: Int = 16, bands: Int = 4,
                      idCol: String = "vec_id",
                      embCol: String = "embedding"): DataFrame = {
    val bitsPerBand = nPlanes / bands
    val mask = (1L << bitsPerBand) - 1
    val sketched = withSketch(embeddings, nPlanes)
    val banded = sketched.select(col(idCol), col(embCol), col("sketch"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("sketch"), b * bitsPerBand).bitwiseAND(mask)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "chunk")
    val x = banded.select(col("band"), col("chunk"), col(idCol).as("id_a"),
      col(embCol).as("emb_a"))
    val y = banded.select(col("band"), col("chunk"), col(idCol).as("id_b"),
      col(embCol).as("emb_b"))
    x.join(y, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("emb_a"), col("emb_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", cosine(asDouble(col("emb_a")),
        asDouble(col("emb_b"))))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
