package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The engine's reproducibility cornerstone: exact decimal sums are
  * partitioning-independent — the same data summed under different
  * partition counts (and hence different accumulation orders) yields the
  * same BITS. A plain double sum fails this under reordering, which is
  * exactly why money aggregates route through [[exact.decSum]]. */
class ExactSumPropertySpec extends AnyFunSuite with Matchers with SparkSpec {

  test("decSum is bit-identical across partitionings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val valueGen = Gen.chooseNum(-1000000L, 1000000L).map(_ / 100.0)
    val prop = Prop.forAll(Gen.nonEmptyListOf(valueGen)) { values =>
      val df = values.toDF("v")
      val sums = Seq(1, 3, 16).map(n =>
        java.lang.Double.doubleToRawLongBits(
          df.repartition(n).agg(exact.decSum(col("v"), 2)).head.getDouble(0)))
      sums.distinct.size == 1
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10)
        .withMaxSize(200), prop)
    withClue(result.status.toString) { result.passed shouldBe true }
  }
}
