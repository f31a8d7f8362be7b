package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** ScalaCheck property for the winnowing guarantee: any two documents
  * sharing a substring of at least `window + k - 1` characters share at
  * least one fingerprint — the recall bound the MOSS scheme is built on.
  * Pure JVM (no Spark) — the expression's kernel is a plain function. */
class WinnowPropertySpec extends AnyFunSuite with Matchers {

  private val K = 8
  private val W = 16

  private val word: Gen[String] =
    Gen.chooseNum(3, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))

  private val textGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("a shared substring of window+k-1 chars implies a shared fingerprint") {
    val sharedGen = Gen.stringOfN(W + K - 1, Gen.alphaLowerChar)
    val prop = Prop.forAll(sharedGen, textGen, textGen, textGen, textGen) {
      (shared, p1, s1, p2, s2) =>
        val a = WinnowFingerprint.fingerprints(s"$p1$shared$s1", K, W).toSet
        val b = WinnowFingerprint.fingerprints(s"$p2$shared$s2", K, W).toSet
        a.intersect(b).nonEmpty
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    withClue(result.status.toString) { result.passed shouldBe true }
  }

  test("fingerprints are deterministic, sorted, and distinct") {
    val prop = Prop.forAll(textGen) { t =>
      val fps = WinnowFingerprint.fingerprints(t, K, W)
      fps.sameElements(WinnowFingerprint.fingerprints(t, K, W)) &&
        fps.sameElements(fps.distinct.sorted)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    withClue(result.status.toString) { result.passed shouldBe true }
  }
}
