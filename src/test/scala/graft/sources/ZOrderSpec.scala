package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the z-order contract: after [[ZOrder.writeZOrdered]] on two
  * columns, a narrow range on EITHER column prunes files at the
  * manifest level (the capability 1-D clustering can't give), skipping
  * loses no rows, and NULL z-values neither crash the write nor get
  * wrongly skipped. */
class ZOrderSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft-zorder").toString + "/t"

  test("both z-dimensions prune files; a 1-D clustered layout prunes " +
    "only its own") {
    import spark.implicits._
    // x uniform, y decorrelated from x (multiplicative shuffle)
    val rows = (0 until 32000)
      .map(i => (i.toLong, (i % 1000).toDouble, ((i * 7919) % 1000).toDouble))
      .toDF("id", "x", "y")
    val zt = freshTable()
    ZOrder.writeZOrdered(rows, zt, Seq("x", "y"), nFiles = 16)
    val zsnap = ManifestLake.snapshot(spark, zt)
    zsnap.entries should have size 16
    // every file records ranges for BOTH dimensions
    all(zsnap.entries.map(_.ranges.map(_.col).toSet)) shouldBe Set("x", "y")

    val xCand = ManifestLake.rangeCandidates(
      zsnap, "x", BigDecimal(100), BigDecimal(149))
    val yCand = ManifestLake.rangeCandidates(
      zsnap, "y", BigDecimal(100), BigDecimal(149))
    withClue(s"x:${xCand.size} y:${yCand.size} of 16") {
      xCand.size should be < 16
      yCand.size should be < 16
      // a 5% window over 4×4 z-tiles touches about a quarter of files
      xCand.size should be <= 8
      yCand.size should be <= 8
    }

    // the same data 1-D clustered on x: x prunes harder, y not at all
    val ct = freshTable()
    ManifestLake.writeClustered(rows, ct, "x", nFiles = 16,
      extraStatsCols = Seq("y"))
    val csnap = ManifestLake.snapshot(spark, ct)
    ManifestLake.rangeCandidates(csnap, "x", BigDecimal(100),
      BigDecimal(149)).size should be <= xCand.size
    ManifestLake.rangeCandidates(csnap, "y", BigDecimal(100),
      BigDecimal(149)).size shouldBe csnap.entries.size // no pruning

    // skipping loses nothing, on either dimension
    ManifestLake.readRange(spark, zt, "x", 100.0, 149.0).count() shouldBe
      rows.filter($"x".between(100.0, 149.0)).count()
    ManifestLake.readRange(spark, zt, "y", 100.0, 149.0).count() shouldBe
      rows.filter($"y".between(100.0, 149.0)).count()
  }

  test("interleave runs in long arithmetic: 4 dims fill 32 bits without " +
    "sign inversion, wider than 63 bits is rejected by name") {
    import spark.implicits._
    val df = Seq(
      (255L, 255L, 255L, 255L),
      (0L, 0L, 0L, 0L),
      (128L, 0L, 0L, 0L)).toDF("a", "b", "c", "d")
    val z = df.select(ZOrder.interleave(
        Seq(col("a"), col("b"), col("c"), col("d"))).as("z"))
      .as[Long].collect()
    // all 32 interleaved bits set: 2^32-1, POSITIVE — int arithmetic
    // would have produced -1 and inverted the range order
    z(0) shouldBe (1L << 32) - 1
    z(1) shouldBe 0L
    // dim 0's top bucket bit lands on position 31 (the int sign bit):
    // in long arithmetic it stays an ordinary magnitude bit
    z(2) shouldBe (1L << 31)
    z(2) should be > 0L
    z(0) should be > z(2)
    val e = intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq.fill(8)(lit(0L)))
    }
    e.getMessage should include("63")
  }

  test("a (string, numeric) z-ordered pair prunes files on BOTH " +
    "dimensions — truncated-key rank buckets for the string, and " +
    "skipping loses no rows on either") {
    import spark.implicits._
    // doc ids share a 4-byte prefix (the truncated-key worst case that
    // still discriminates); score decorrelated from id order
    val rows = (0 until 32000)
      .map(i => (i.toLong, f"doc_${i % 1000}%04d",
        ((i * 7919) % 1000).toDouble))
      .toDF("id", "doc_id", "score")
    val zt = freshTable()
    ZOrder.writeZOrdered(rows, zt, Seq("doc_id", "score"), nFiles = 16)
    val snap = ManifestLake.snapshot(spark, zt)
    snap.entries should have size 16
    // every file records the STRING stats for doc_id and numeric for score
    all(snap.entries.map(_.strRanges.map(_.col).toSet)) shouldBe
      Set("doc_id")
    all(snap.entries.map(_.ranges.map(_.col).toSet)) shouldBe Set("score")
    val sCand = ManifestLake.strRangeCandidates(
      snap, "doc_id", "doc_0100", "doc_0149")
    val nCand = ManifestLake.rangeCandidates(
      snap, "score", BigDecimal(100), BigDecimal(149))
    withClue(s"doc_id:${sCand.size} score:${nCand.size} of 16") {
      sCand.size should be <= 8
      nCand.size should be <= 8
    }
    // skipping loses nothing, on either dimension
    ManifestLake.readRangeStr(spark, zt, "doc_id", "doc_0100", "doc_0149")
      .count() shouldBe
      rows.filter($"doc_id".between("doc_0100", "doc_0149")).count()
    ManifestLake.readRange(spark, zt, "score", 100.0, 149.0)
      .count() shouldBe
      rows.filter($"score".between(100.0, 149.0)).count()
  }

  test("NULL z-values cluster low, never match a range, and are never " +
    "wrongly skipped away from a full read") {
    import spark.implicits._
    val rows = (0 until 2000)
      .map(i => (i.toLong,
        if (i % 100 == 0) None else Some((i % 500).toDouble),
        (i % 300).toDouble))
      .toDF("id", "x", "y")
    val t = freshTable()
    ZOrder.writeZOrdered(rows, t, Seq("x", "y"), nFiles = 4)
    ManifestLake.read(spark, t).count() shouldBe 2000
    ManifestLake.read(spark, t).filter($"x".isNull).count() shouldBe 20
    // a range query never returns (or counts) null-x rows — SQL semantics
    ManifestLake.readRange(spark, t, "x", 0.0, 500.0)
      .count() shouldBe 1980
  }
}
