package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck property: weighted replication emits exactly Σ max(weight,1)
  * rows — the invariant behind the reference's weighted-KMeans trick
  * (`/root/reference/dags/lib/k_means_with_spark.py:114-125`). */
class ReplicationPropertySpec extends AnyFunSuite with Matchers
    with SparkSpec {

  test("replication cardinality == Σ max(weight, 1)") {
    import spark.implicits._
    val prop = Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-3, 50))) {
      weights: List[Int] =>
        val df = weights.toDF("weight")
          .withColumn("w", when($"weight" > 0, $"weight").otherwise(1))
          .select(explode(array_repeat(lit(1), $"w")))
        df.count() == weights.map(w => math.max(w, 1).toLong).sum
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(5).withMaxSize(40)
    val result = SCTest.check(params, prop)
    withClue(result.status.toString) { result.passed shouldBe true }
  }
}
