package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.Tables

class PcaSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("fitted components are orthonormal with non-increasing " +
    "explained-variance proportions, and the variance identity holds: " +
    "avg residual ≈ (1 − retained) · total variance") {
    val emb = Tables.embeddings(spark, sf)
    val model = Pca.fit(emb, k = 16)
    model.k shouldBe 16
    model.d shouldBe 64
    // orthonormal rows
    for (i <- 0 until model.k; j <- i until model.k) {
      val dot = model.components(i).zip(model.components(j))
        .map { case (a, b) => a * b }.sum
      if (i == j) dot shouldBe 1.0 +- 1e-9
      else dot shouldBe 0.0 +- 1e-9
    }
    // top components explain the most variance, in order
    model.explainedVariance.sliding(2).foreach {
      case Array(a, b) => a should be >= b - 1e-12
      case _ =>
    }
    model.retainedFraction should be > 0.0
    model.retainedFraction should be <= 1.0 + 1e-9
    // ‖x−μ‖² = ‖proj‖² + residual, and in aggregate the residual is
    // the unexplained variance share
    val projected = Pca.project(emb, model)
    val withErr = Pca.reconstructionError2(projected, model)
    val avgErr = withErr.agg(avg(col("recon_err2"))).first().getDouble(0)
    val total = Pca.totalVariance(emb)
    avgErr shouldBe (1.0 - model.retainedFraction) * total +- total * 0.02
  }

  test("the literal-dot projection equals a driver-side matrix multiply " +
    "on sampled rows, and centering makes mean-shifted copies agree") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val model = Pca.fit(emb, k = 8)
    val rows = Pca.project(emb, model)
      .select($"vec_id", $"embedding".cast("array<double>"), $"pca")
      .as[(Long, Seq[Double], Seq[Double])].collect().take(10)
    rows.foreach { case (_, x, p) =>
      val centered = x.toArray.zip(model.mean).map { case (a, m) => a - m }
      val expect = model.components.map(c =>
        c.zip(centered).map { case (a, b) => a * b }.sum)
      p.toArray.zip(expect).foreach { case (a, b) =>
        a shouldBe b +- 1e-9
      }
    }
    // shift every vector by a constant: centered projections unchanged
    val shifted = emb.withColumn("embedding",
      transform($"embedding".cast("array<double>"), x => x + 5.0))
    val model2 = Pca.fit(shifted, k = 8)
    // same covariance → same explained proportions (signs may flip)
    model2.explainedVariance.zip(model.explainedVariance).foreach {
      case (a, b) => a shouldBe b +- 1e-9
    }
  }
}
