package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.text.Dedup

class NativeTextExprSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("minhash signature: fixed width, deterministic, sensitive to edits") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "z b c d e f g h i j"),
      (4L, "completely different words here now")).toDF("id", "text")
      .withColumn("sig", MinHashSignature(col("text"), 3, 32))
    val sigs = df.select($"id", $"sig").as[(Long, Seq[Long])]
      .collect().toMap
    sigs(1L) should have length 32
    sigs(1L) shouldBe sigs(2L) // identical text → identical signature
    sigs(1L) should not be sigs(4L)
    // near-identical text shares most signature slots (Jaccard kernel)
    val agree = sigs(1L).zip(sigs(3L)).count { case (x, y) => x == y }
    agree should be >= 16
  }

  test("native ngram_jaccard matches the declarative shingle jaccard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j", "x"),
      (2L, "q b c d e f g h i j", "x"),
      (3L, "a b c d e f g h i j", "x")).toDF("doc_id", "text", "lang")
    // declarative path (string shingles, array_intersect/union)
    val declarative = Dedup.blockedNgramJaccardShingled(docs)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().map { case (a, b, j) => (a, b) -> j }.toMap
    // native path on the same pairs
    val a = docs.select($"doc_id".as("id_a"), $"text".as("text_a"))
    val b = docs.select($"doc_id".as("id_b"), $"text".as("text_b"))
    val native = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("j", NgramJaccard($"text_a", $"text_b", 3))
      .select($"id_a", $"id_b", $"j").as[(Long, Long, Double)]
      .collect().map { case (x, y, j) => (x, y) -> j }.toMap
    declarative.foreach { case (pair, j) =>
      native(pair) shouldBe j +- 1e-12
    }
    // identical docs → 1.0; single-token edit on 10 tokens → 5/11 shingles
    native((1L, 3L)) shouldBe 1.0
  }

  test("ngram_containment: subset → 1.0 on the contained side, diluted " +
    "jaccard; asymmetric; equals jaccard on identical docs") {
    import spark.implicits._
    // doc 1 is a verbatim chunk of doc 2 (every 3-shingle of 1 occurs
    // in 2) — the quoted-body shape
    val small = "a b c d e f g h"
    val big = "p q r " + small + " x y z w v u t s r2 q2 p2 o2 n2 m2"
    val row = Seq((small, big)).toDF("a", "b")
      .select(
        NgramContainment($"a", $"b", 3).as("ab"),
        NgramContainment($"b", $"a", 3).as("ba"),
        NgramJaccard($"a", $"b", 3).as("j"))
      .collect().head
    row.getDouble(0) shouldBe 1.0 // contained side: full overlap
    row.getDouble(1) should be < 0.3 // container side: mostly its own
    row.getDouble(2) should be < 0.3 // symmetric jaccard dilutes to ~|A|/|B|
    // identical docs: containment == jaccard == 1.0, both directions
    val same = Seq(("m n o p", "m n o p")).toDF("a", "b")
      .select(NgramContainment($"a", $"b", 3).as("c"),
        NgramContainment($"b", $"a", 3).as("c2"))
      .collect().head
    same.getDouble(0) shouldBe 1.0
    same.getDouble(1) shouldBe 1.0
    // SQL surface
    spark.sql("SELECT ngram_containment('a b c d', 'z z a b c d', 3) AS c")
      .as[Double].head() shouldBe 1.0
  }

  test("native simhash: identical text → identical fingerprint, small " +
    "edit → small hamming, different text → large hamming") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h i j k l m n o p q r s t"),
      (2L, "a b c d e f g h i j k l m n o p q r s t"),
      (3L, "a b c d e f g h i j k l m n o p q r s Z"),
      (4L, "entirely unrelated vocabulary in this document text body"))
      .toDF("id", "text")
      .withColumn("fp", SimHash64(col("text")))
    val fp = df.select($"id", $"fp").as[(Long, Long)].collect().toMap
    fp(1L) shouldBe fp(2L)
    java.lang.Long.bitCount(fp(1L) ^ fp(3L)) should be <= 12
    java.lang.Long.bitCount(fp(1L) ^ fp(4L)) should be > 12
  }

  test("empty and sub-width documents are handled") {
    import spark.implicits._
    val df = Seq((1L, "one two"), (2L, "one two"), (3L, ""))
      .toDF("id", "text")
      .withColumn("sig", MinHashSignature(col("text"), 3, 8))
      .withColumn("j12", NgramJaccard(lit("one two"), col("text"), 3))
    val rows = df.collect()
    rows.foreach(_.getSeq[Long](2) should have length 8)
    rows(1).getDouble(3) shouldBe 1.0 // identical short docs
  }

  test("winnowing guarantee: a shared substring of window+k-1 chars " +
    "yields a shared fingerprint; disjoint texts share none") {
    val k = 8; val w = 16
    val shared = "the quick brown fox jumps over the lazy dog today"
    require(shared.length >= w + k - 1)
    val a = WinnowFingerprint.fingerprints(s"AAAA $shared BBBB", k, w).toSet
    val b = WinnowFingerprint.fingerprints(s"XXXX $shared YYYY", k, w).toSet
    a.intersect(b) should not be empty
    val c = WinnowFingerprint.fingerprints(
      "0123456789 zyxwvutsrq 9876543210 qrstuvwxyz", k, w).toSet
    a.intersect(c) shouldBe empty
    // deterministic + sparse: far fewer fingerprints than k-grams
    WinnowFingerprint.fingerprints(shared, k, w) shouldBe
      WinnowFingerprint.fingerprints(shared, k, w)
    a.size should be < shared.length
    // short-document degradation
    WinnowFingerprint.fingerprints("ab", k, w) should have length 1
    WinnowFingerprint.fingerprints("", k, w) shouldBe Array(0L)
  }

  test("all native kernels are callable from SQL via GraftExtensions") {
    import spark.implicits._
    spark.sql(
      """SELECT simhash64('a b c') AS sh,
        |  minhash_signature('a b c d e', 3, 8) AS mh,
        |  ngram_jaccard('a b c d', 'a b c d', 3) AS j,
        |  hyperplane_sketch(array(1.0d, -0.5d, 0.25d), 16) AS hp,
        |  cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs,
        |  winnow_fingerprint('abcdefgh abcdefgh', 5, 4) AS wf
        |""".stripMargin).collect().head match {
      case r =>
        r.getSeq[Long](r.fieldIndex("mh")) should have length 8
        r.getDouble(r.fieldIndex("j")) shouldBe 1.0
        r.getDouble(r.fieldIndex("cs")) shouldBe 1.0 +- 1e-12
        r.getSeq[Long](r.fieldIndex("wf")) should not be empty
    }
    // SQL values match the Column-API expressions exactly
    val viaSql = spark.sql("SELECT simhash64('x y z') AS v").as[Long].head()
    val viaCol = Seq("x y z").toDF("t")
      .select(SimHash64($"t")).as[Long].head()
    viaSql shouldBe viaCol
    // non-literal tuning parameters are rejected with a clear error
    val err = intercept[Exception] {
      spark.sql("SELECT hyperplane_sketch(array(1.0d), CAST(rand()*4 AS INT))")
        .collect()
    }
    err.getMessage should include("literal integer")
  }
}
