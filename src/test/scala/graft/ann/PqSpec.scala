package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.Tables

class PqSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def model = ProductQuantizer.train(Tables.embeddings(spark, sf))

  test("training is deterministic: two fits produce identical codebooks") {
    val a = ProductQuantizer.train(Tables.embeddings(spark, sf))
    val b = ProductQuantizer.train(Tables.embeddings(spark, sf))
    a.flat should equal(b.flat)
  }

  test("native pq_encode matches an independent Scala reference loop " +
    "and codes stay in [0, ksub)") {
    val m = model
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .limit(50).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val encoded = ProductQuantizer
      .encode(Tables.embeddings(spark, sf).limit(50), m)
      .select(col("vec_id"), col("pq_code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    // reference: normalize, per subspace argmin Euclidean (ties lowest j)
    def reference(v: Array[Double]): Array[Int] = {
      val n2 = v.map(x => x * x).sum
      val nv = if (n2 == 0.0) v else v.map(_ / math.sqrt(n2))
      Array.tabulate(m.m) { sub =>
        val d2 = Array.tabulate(m.ksub) { j =>
          (0 until m.dsub).map { t =>
            val x = nv(sub * m.dsub + t) - m.codewords(sub)(j)(t)
            x * x
          }.sum
        }
        d2.indexOf(d2.min)
      }
    }
    encoded.foreach { case (id, codes) =>
      codes should have length m.m
      all(codes.toSeq) should (be >= 0 and be < m.ksub)
      codes should equal(reference(rows(id)))
    }
  }

  test("ADC + exact rerank recalls most of the exact top-10") {
    val emb = Tables.embeddings(spark, sf)
    val m = model
    val exact = Similarity.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val queryVec = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    val encoded = ProductQuantizer.encode(emb, m)
    val approx = ProductQuantizer.adcTopK(
        encoded.filter(col("vec_id") =!= 0L), emb, m, queryVec,
        k = 10, rerank = 80)
      .collect()
    approx should have length 10
    // descending exact cosine, query excluded
    approx.map(_.getDouble(1)).sliding(2).foreach {
      case Array(a, b) => a should be >= b
      case _ =>
    }
    approx.map(_.getLong(0)) should not contain 0L
    val recall = exact.intersect(approx.map(_.getLong(0)).toSet).size / 10.0
    recall should be >= 0.7
  }

  test("the ADC candidate scan is column-pruned: the embedding column " +
    "is never read by candidate generation") {
    val m = model
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    ProductQuantizer.encode(Tables.embeddings(spark, sf), m)
      .write.mode("overwrite").parquet(dir)
    val encoded = spark.read.parquet(dir)
    val queryVec = Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    val top = ProductQuantizer.adcTopK(encoded, spark.read.parquet(dir), m,
      queryVec, k = 10, rerank = 80)
    val plan = top.queryExecution.executedPlan.toString
    // two scans of the same table: the candidate side must read only
    // (vec_id, pq_code); only the rerank side may read the embedding
    val readSchemas = "ReadSchema: [^\\n]+".r.findAllIn(plan).toList
    readSchemas.filter(_.contains("pq_code")).foreach { s =>
      s should not include "embedding"
    }
    atLeast(1, readSchemas) should include("pq_code")
    top.collect() should have length 10
  }

  test("IVF-PQ composition: a cell-membership candidate filter prunes " +
    "candidate generation and the result still ranks by exact cosine") {
    val emb = Tables.embeddings(spark, sf)
    val m = model
    val (assigned, centroids) = Similarity.ivfIndex(emb, nCells = 16)
    val queryVec = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    val probeCells = Similarity.rankCells(centroids, queryVec, nProbe = 8)
    val encoded = ProductQuantizer.encode(assigned, m)
    val approx = ProductQuantizer.adcTopK(
        encoded.filter(col("vec_id") =!= 0L), emb, m, queryVec,
        k = 10, rerank = 80,
        candidateFilter = Some(col("cell").isInCollection(probeCells)))
      .collect()
    approx should have length 10
    val exact = Similarity.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    exact.intersect(approx.map(_.getLong(0)).toSet).size / 10.0 should be >= 0.6
  }

  test("lake IVF-PQ: probePq recalls most of the exact top-10, its " +
    "candidate scan reads only the probed cells' (vec_id, pq_code), " +
    "and an append encodes under the pinned codebook") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    IvfIndexStore.build(spark, sf, dir)
    val emb = Tables.embeddings(spark, sf)
    val queryVec = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    val top = IvfIndexStore.probePq(spark, dir, queryVec, k = 10,
      nProbe = 8, rerank = 80, excludeId = Some(0L))
    val plan = top.queryExecution.executedPlan.toString
    // the candidate side reads codes, never embeddings; the rerank side
    // may read embeddings — and BOTH scans list only probed-cell files
    val readSchemas = "ReadSchema: [^\\n]+".r.findAllIn(plan).toList
    readSchemas.filter(_.contains("pq_code")).foreach { s =>
      s should not include "embedding"
    }
    atLeast(1, readSchemas) should include("pq_code")
    val rows = top.collect()
    rows should have length 10
    val exact = Similarity.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    exact.intersect(rows.map(_.getLong(0)).toSet).size / 10.0 should be >= 0.7
    // append under the pinned codebook: the appended copy of vector 0
    // becomes the top PQ hit at cosine 1.0 (its code ties its source's,
    // so ADC ranks it into the pool and the exact rerank tops it)
    IvfIndexStore.append(
      emb.filter($"vec_id" === 0L).withColumn("vec_id", lit(910000L)), dir)
    val after = IvfIndexStore.probePq(spark, dir, queryVec, k = 1,
      nProbe = 4, rerank = 40, excludeId = Some(0L)).collect()
    after.head.getLong(0) shouldBe 910000L
    after.head.getDouble(1) shouldBe 1.0 +- 1e-12
  }

  test("a code outside the codebook range fails by name, not silently") {
    val m = model
    import spark.implicits._
    val bad = Seq((1L, Array.fill(m.m)(m.ksub))).toDF("vec_id", "pq_code")
    val lut = ProductQuantizer.lut(m, Array.fill(m.m * m.dsub)(1.0))
    val ex = intercept[Exception] {
      bad.withColumn("s",
        graft.functions.PqCodec.adcScore(col("pq_code"), lut, m.m, m.ksub))
        .collect()
    }
    // surfaces directly on a local-relation eval, wrapped in a
    // SparkException from an executor task — accept either framing
    val messages = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    messages should include("out of range")
  }

  test("zero vectors encode deterministically and never rank in the top-k") {
    val m = model
    import spark.implicits._
    val zero = Seq((999999L, Array.fill(m.m * m.dsub)(0.0f)))
      .toDF("vec_id", "embedding")
    val codes = ProductQuantizer.encode(zero, m)
      .select("pq_code").collect().head.getSeq[Int](0)
    codes should have length m.m
    // all-zero subvector scores every codeword at -||c||²/2 → the
    // LARGEST (least-negative) wins; verify against the reference rule
    (0 until m.m).foreach { sub =>
      val c2 = (0 until m.ksub).map(j =>
        m.codewords(sub)(j).map(x => x * x).sum / 2.0)
      codes(sub) shouldBe c2.indexOf(c2.min)
    }
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).unionByName(zero)
    val queryVec = Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    val top = ProductQuantizer.adcTopK(
      ProductQuantizer.encode(emb, m).filter(col("vec_id") =!= 0L),
      emb, m, queryVec, k = 10, rerank = 80).collect()
    top.map(_.getLong(0)) should not contain 999999L
  }
}
