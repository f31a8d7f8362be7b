package graft.ann

import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA dimensionality reduction for embedding columns — the
  * lossy-compression tier that trades dimensions (not codewords, like
  * [[ProductQuantizer]]) for scan width: a 64-dim embedding projected
  * to 16 components is a 4× narrower vector whose dot products
  * approximate the centered originals', so brute-force or IVF search
  * in the reduced space is ~4× cheaper per candidate with recall
  * governed by the retained variance.
  *
  * Division of labor (the quantizer-fit philosophy throughout this
  * package): [[fit]] runs Spark ML's distributed covariance +
  * driver-side eigendecomposition ONCE — one pass over the data for
  * the Gramian, O(d²) driver math; [[project]] is one narrow
  * projection where the mean and components ride as LITERALS (no
  * model object, no UDF, no join — the [[Similarity]] plane-literal
  * style), so encoding a 100 TB corpus is a map-only pass.
  * Spark ML's `PCAModel.transform` deliberately does NOT center its
  * input (a documented quirk); [[project]] centers, so projections of
  * mean-shifted copies of the same data agree and the reconstruction
  * identity `total variance = retained + residual` actually holds. */
object Pca {

  /** A fitted model: `mean(d)`, row-major `components(k)(d)` (unit,
    * mutually orthogonal), and each component's explained-variance
    * PROPORTION (Spark ML's convention: fractions of total variance,
    * summing to ≤ 1). */
  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]],
                            explainedVariance: Array[Double]) {
    def k: Int = components.length
    def d: Int = mean.length
    /** Fraction of total variance the k components retain. */
    def retainedFraction: Double = explainedVariance.sum
  }

  /** Fit `k` principal components. One distributed pass (covariance
    * Gramian) + a driver-side eigendecomposition; deterministic up to
    * float summation order and the eigenvector sign convention. */
  def fit(df: DataFrame, k: Int,
          embCol: String = "embedding"): PcaModel = {
    val withVec = df.select(
      array_to_vector(col(embCol).cast("array<double>")).as("features"))
    require(k >= 1, "need at least one component")
    val model = new org.apache.spark.ml.feature.PCA()
      .setK(k).setInputCol("features").setOutputCol("pca")
      .fit(withVec)
    // column means — ml.PCA centers internally for the covariance but
    // exposes no mean; one tiny aggregate recovers it
    val d = model.pc.numRows
    val mean = withVec
      .select(vector_to_array(col("features")).as("v"))
      .groupBy()
      .agg(avg(col("v")(0)).as("m0"),
        (1 until d).map(i => avg(col("v")(i)).as(s"m$i")): _*)
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    // pc is d x k column-major; transpose into k row vectors
    val comps = Array.tabulate(k)(j =>
      Array.tabulate(d)(i => model.pc(i, j)))
    PcaModel(mean, comps, model.explainedVariance.toArray)
  }

  /** Project `embCol` onto the model's components: centered dot
    * products, everything literal, one narrow projection. */
  def project(df: DataFrame, model: PcaModel,
              embCol: String = "embedding",
              out: String = "pca"): DataFrame = {
    val centered = zip_with(col(embCol).cast("array<double>"),
      array(model.mean.map(lit).toIndexedSeq: _*), (a, b) => a - b)
    val comps = model.components.map(c =>
      array(c.map(lit).toIndexedSeq: _*))
    df.withColumn(out,
      array(comps.map(c => Similarity.dotFold(centered, c))
        .toIndexedSeq: _*))
  }

  /** Per-row squared reconstruction error `‖(x−μ) − Wᵀ W(x−μ)‖²` —
    * the residual the retained-variance fraction predicts in
    * aggregate. Computed as `‖x−μ‖² − ‖W(x−μ)‖²` (W orthonormal), so
    * it needs only the projection, not a d-dim reconstruction. */
  def reconstructionError2(df: DataFrame, model: PcaModel,
                           embCol: String = "embedding",
                           projCol: String = "pca",
                           out: String = "recon_err2"): DataFrame = {
    val centered = zip_with(col(embCol).cast("array<double>"),
      array(model.mean.map(lit).toIndexedSeq: _*), (a, b) => a - b)
    df.withColumn(out,
      greatest(lit(0.0),
        Similarity.norm2Fold(centered) -
          Similarity.norm2Fold(col(projCol))))
  }

  /** Scalar total variance of the corpus (Σ per-dimension variance) —
    * the denominator of [[PcaModel.retainedFraction]]. */
  def totalVariance(df: DataFrame, embCol: String = "embedding"): Double = {
    val v = col(embCol).cast("array<double>")
    val d = df.select(size(v)).first().getInt(0)
    df.select(vector_to_array(array_to_vector(v)).as("v"))
      .groupBy()
      .agg(var_pop(col("v")(0)).as("v0"),
        (1 until d).map(i => var_pop(col("v")(i)).as(s"v$i")): _*)
      .collect().head.toSeq.map(_.asInstanceOf[Double]).sum
  }
}
