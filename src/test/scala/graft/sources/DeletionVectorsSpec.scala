package graft.sources

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The deletion-vector block codec and in-memory representations —
  * pure-JVM properties (the end-to-end per-file application rides in
  * ManifestLakeSpec's MOR tests, where plans and counts are
  * observable). */
class DeletionVectorsSpec extends AnyFunSuite with Matchers {

  private def roundTrip(sorted: Array[Long]): Array[Long] = {
    val out = new java.io.ByteArrayOutputStream()
    val len = DeletionVectors.writeBlock(out, sorted)
    val bytes = out.toByteArray
    len shouldBe bytes.length.toLong
    DeletionVectors.decodeBlock(bytes)
  }

  test("block codec round-trips arbitrary sorted index sets") {
    val gen = Gen.listOf(Gen.chooseNum(0L, 1L << 40))
      .map(_.distinct.sorted.toArray)
    val prop = Prop.forAll(gen) { arr =>
      java.util.Arrays.equals(roundTrip(arr), arr)
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200),
      prop).passed shouldBe true
  }

  test("block codec rejects unsorted or duplicate indexes — a corrupt " +
    "vector must fail the write, not silently drop rows") {
    val out = new java.io.ByteArrayOutputStream()
    an[IllegalArgumentException] should be thrownBy
      DeletionVectors.writeBlock(out, Array(5L, 5L))
    an[IllegalArgumentException] should be thrownBy
      DeletionVectors.writeBlock(out, Array(9L, 3L))
  }

  test("membership agrees with the source set for dense (bitmap) and " +
    "sparse (binary search) vectors alike") {
    // dense: >1/64 of the index space → bitmap representation
    val dense = (0L until 10000L by 2).toArray
    val denseBits = DeletionVectors.bitsFor(dense)
    denseBits.cardinality shouldBe 5000L
    (0L until 10000L).foreach { i =>
      denseBits.contains(i) shouldBe (i % 2 == 0)
    }
    // sparse: indexes spread over a huge range → sorted-array rep
    val sparse = Array(3L, 1L << 20, 1L << 45, (1L << 45) + 1)
    val sparseBits = DeletionVectors.bitsFor(sparse)
    sparseBits.cardinality shouldBe 4L
    sparse.foreach(i => sparseBits.contains(i) shouldBe true)
    Seq(0L, 4L, (1L << 20) - 1, 1L << 44, (1L << 45) + 2)
      .foreach(i => sparseBits.contains(i) shouldBe false)
    // empty vector: nothing is deleted
    val empty = DeletionVectors.bitsFor(Array.empty[Long])
    empty.contains(0L) shouldBe false
    empty.cardinality shouldBe 0L
  }

  test("dv tokens round-trip rel#offset#length") {
    val ref = DeletionVectors.DvRef("_dv/v00000007-ab12cd34-p00003-a9.bin",
      12345L, 678L)
    DeletionVectors.parseRef(DeletionVectors.encodeRef(ref)) shouldBe ref
    an[IllegalArgumentException] should be thrownBy
      DeletionVectors.parseRef("no-offsets-here.bin")
  }
}
