package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class TextStatsSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("language ID picks the profile with most stopword hits; CJK → zh; " +
    "no hits → und") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "le chat est dans la maison et un jardin"),
      (3L, "der hund ist nicht mit der katze"),
      (4L, "el perro es un amigo y los gatos"),
      (5L, "你好世界数据引擎"),
      (6L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextStats.langId(docs)
      .select($"doc_id", $"predicted_lang").as[(Long, String)]
      .collect().toMap
    out shouldBe Map(1L -> "en", 2L -> "fr", 3L -> "de", 4L -> "es",
      5L -> "zh", 6L -> "und")
  }

  test("quality ratios on a crafted document") {
    import spark.implicits._
    // "ab3! cd" → 7 chars, 2 tokens, 4 alpha, 1 digit, 1 punct
    val out = TextStats.quality(Seq((1L, "ab3! cd")).toDF("doc_id", "text"))
      .collect().head
    out.getAs[Int]("n_tokens") shouldBe 2
    out.getAs[Double]("alpha_ratio") shouldBe 4.0 / 7 +- 1e-12
    out.getAs[Double]("digit_ratio") shouldBe 1.0 / 7 +- 1e-12
    out.getAs[Double]("punct_ratio") shouldBe 1.0 / 7 +- 1e-12
  }

  test("token counts: whitespace vs lexer tokens") {
    import spark.implicits._
    val out = TextStats.tokenCounts(
      Seq((1L, "ab 12 c!d")).toDF("doc_id", "text")).collect().head
    out.getAs[Int]("ws_tokens") shouldBe 3
    // lexer: ab | 12 | c | ! | d
    out.getAs[Int]("lex_tokens") shouldBe 5
  }

  test("repetition profile counts duplicate lines, top bigrams, and " +
    "duplicated 5-grams on crafted documents") {
    import spark.implicits._
    // doc 1: 4 non-empty lines ("spam" ×3 of 4 chars + "real text" of 9),
    //   words: spam spam spam real text → 4 bigrams, top "spam spam" ×2,
    //   one 5-gram, none duplicated
    // doc 2: no newline, "a b a b a b a b" → 8 words, 7 bigrams
    //   ("a b" ×4, "b a" ×3), 4 5-grams: "a b a b a" ×2, "b a b a b" ×2
    //   → dup_5grams = 2
    // doc 3: empty-ish (whitespace only) → all zeros
    val docs = Seq(
      (1L, "spam\nspam\n\nspam\nreal text\n"),
      (2L, "a b a b a b a b"),
      (3L, " \n \n")).toDF("doc_id", "text")
    val out = TextStats.repetition(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d1 = out(1L)
    d1.getAs[Long]("n_lines") shouldBe 4L
    d1.getAs[Long]("dup_lines") shouldBe 2L
    d1.getAs[Long]("line_chars") shouldBe (4 + 4 + 4 + 9).toLong
    d1.getAs[Long]("dup_line_chars") shouldBe 12L
    d1.getAs[Long]("n_bigrams") shouldBe 4L
    d1.getAs[Long]("top_bigram") shouldBe 2L
    d1.getAs[Long]("n_5grams") shouldBe 1L
    d1.getAs[Long]("dup_5grams") shouldBe 0L
    d1.getAs[Boolean]("repetitive") shouldBe true // dup_line_chars 12*5 > 21
    val d2 = out(2L)
    d2.getAs[Long]("n_lines") shouldBe 1L
    d2.getAs[Long]("dup_lines") shouldBe 0L
    d2.getAs[Long]("n_bigrams") shouldBe 7L
    d2.getAs[Long]("top_bigram") shouldBe 4L
    d2.getAs[Long]("n_5grams") shouldBe 4L
    d2.getAs[Long]("dup_5grams") shouldBe 2L
    d2.getAs[Boolean]("repetitive") shouldBe true // top_bigram 4*5 > 7
    val d3 = out(3L)
    d3.getAs[Long]("n_lines") shouldBe 2L // " " twice: non-empty, dup
    d3.getAs[Long]("dup_lines") shouldBe 1L
    d3.getAs[Long]("n_bigrams") shouldBe 0L
    d3.getAs[Long]("n_5grams") shouldBe 0L
  }

  test("repetition profile is registered in SQL and a clean document " +
    "is not flagged") {
    import spark.implicits._
    Seq((1L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text").createOrReplaceTempView("rep_docs")
    val r = spark.sql(
      """SELECT repetition_profile(text) AS p FROM rep_docs""")
      .select("p.n_lines", "p.dup_lines", "p.n_bigrams", "p.top_bigram")
      .collect().head
    r.getLong(0) shouldBe 1L
    r.getLong(1) shouldBe 0L
    r.getLong(2) shouldBe 9L
    r.getLong(3) shouldBe 1L
    TextStats.repetition(
      Seq((1L, "the quick brown fox jumps over the lazy dog tonight"))
        .toDF("doc_id", "text"))
      .select($"repetitive").as[Boolean].collect().head shouldBe false
  }

  test("fingerprint is stable under case and whitespace noise") {
    import spark.implicits._
    val out = TextStats.fingerprint(Seq(
      (1L, "Hello   World"),
      (2L, "  hello world "),
      (3L, "hello worlds")).toDF("doc_id", "text"))
      .select($"fingerprint").as[String].collect()
    out(0) shouldBe out(1)
    out(2) should not be out(0)
    out(0) should have length 16
  }

  test("PII scrub replaces every class with its placeholder and counts " +
    "against the text each pattern actually sees") {
    import spark.implicits._
    val out = TextStats.piiScrub(Seq(
      (1L, "mail a.b+c@x.co and d@y.org, host 10.0.0.1, id 123-45-6789"),
      (2L, "no pii here at all"),
      (3L, "two ips 192.168.1.1 8.8.8.8 and 999-99-9999"))
      .toDF("doc_id", "text"))
      .select($"doc_id", $"n_email", $"n_ipv4", $"n_id", $"text_scrubbed")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, 2, 1, 1,
      "mail <EMAIL> and <EMAIL>, host <IP>, id <ID>"))
    out(1) shouldBe ((2L, 0, 0, 0, "no pii here at all"))
    out(2) shouldBe ((3L, 0, 2, 1, "two ips <IP> <IP> and <ID>"))
  }

  test("line-quality filter keeps punctuated lines over the word floor, " +
    "rebuilds in order, and flags docs under the kept-lines floor") {
    import spark.implicits._
    val out = TextStats.lineQualityFilter(Seq(
      (1L, "one two three.\nno punctuation here\ntoo short.\n" +
        "ends with question?\n  trailing spaces count.  "),
      (2L, "just one good line.\nbad\nbad")).toDF("doc_id", "text"),
      minWords = 3, minKeptLines = 3)
      .select($"doc_id", $"text_clean", $"n_lines", $"n_kept", $"kept_doc")
      .as[(Long, String, Int, Int, Boolean)].collect().sortBy(_._1)
    out(0) shouldBe ((1L,
      "one two three.\nends with question?\n  trailing spaces count.  ",
      5, 3, true))
    out(1) shouldBe ((2L, "just one good line.", 3, 1, false))
  }

  test("PII scrub order: an address with a dotted-numeric host is one " +
    "email, never an extra IP") {
    import spark.implicits._
    val out = TextStats.piiScrub(Seq((1L, "x u@10.0.0.1.co y"))
      .toDF("doc_id", "text"))
      .select($"n_email", $"n_ipv4", $"text_scrubbed")
      .as[(Int, Int, String)].collect().head
    out shouldBe ((1, 0, "x <EMAIL> y"))
  }

  test("unigram NLL: hand-computed scores on a toy corpus, empty tokens " +
    "dropped, zero-token docs absent") {
    import spark.implicits._
    // corpus: N = 6 tokens; counts: a=3, b=2, c=1
    val out = TextStats.unigramNll(Seq(
      (1L, "a  b a"), // leading/multi spaces: empty tokens never count
      (2L, "B c A"),  // lowercased before counting
      (3L, "   ")     // no tokens: absent from the output
    ).toDF("doc_id", "text"))
      .select($"doc_id", $"n_tokens", $"sum_nll", $"avg_nll")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    def nll(c: Int): BigDecimal =
      BigDecimal(-math.log(c / 6.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    out should have length 2
    out(0)._1 shouldBe 1L
    out(0)._2 shouldBe 3L
    out(0)._3 shouldBe (nll(3) * 2 + nll(2)).toDouble
    out(0)._4 shouldBe out(0)._3 / 3.0
    out(1)._1 shouldBe 2L
    out(1)._2 shouldBe 3L
    out(1)._3 shouldBe (nll(2) + nll(1) + nll(3)).toDouble
    // the rare-token doc scores HIGHER avg NLL — the filter signal
    out(1)._4 should be > out(0)._4
  }

  test("PMI collocations: hand-computed scores; a true collocation " +
    "outscores an incidental pair; minCount gates the tail") {
    import spark.implicits._
    // "a b" ×6 (collocation), "a c" ×3, singles pad the unigram mass
    val docs = Seq(
      (1L, "a b a b a b"), (2L, "a b a b a b"),
      (3L, "a c a c a c"), (4L, "d d d d d d")
    ).toDF("doc_id", "text")
    val out = TextStats.pmiBigrams(docs, minCount = 3)
      .select($"w1", $"w2", $"n_pair", $"pmi")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // bigrams per doc: 5 each → N_pairs = 20; tokens: a=9, b=6, c=3,
    // d=6, N_tok = 24
    val nt = 24.0; val np = 20.0
    def pmi(nab: Long, na: Long, nb: Long): Double =
      BigDecimal(math.log((nab.toDouble * nt * nt) / (np * na * nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out(("a", "b"))._1 shouldBe 6L
    out(("a", "b"))._2 shouldBe pmi(6, 9, 6)
    out(("a", "c"))._1 shouldBe 3L
    // "a b" is the stronger collocation than chance predicts
    out(("a", "b"))._2 should be > 0.0
    // minCount gates the tail: (c,a) occurs only twice and is absent
    out(("d", "d"))._1 shouldBe 5L
    out.keySet shouldBe Set(("a", "b"), ("b", "a"), ("a", "c"),
      ("d", "d"))
  }

  test("DSIR weights: hand-computed log-ratios on a toy corpus; the " +
    "target doc outscores the source-only doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa aa bb", "en"),   // the target subset
      (2L, "cc cc bb", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = TextStats.dsirWeights(docs, $"lang" === "en")
      .select($"doc_id", $"n_tokens", $"logw_sum", $"target_like")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    // replicate the bucket hash (first 16 bits of sha256 mod 1024) and
    // the 6-decimal grid by hand
    def bucket(t: String): Long = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(t.getBytes("UTF-8"))
      (((d(0) & 0xffL) << 8) | (d(1) & 0xffL)) % 1024
    }
    Seq("aa", "bb", "cc").map(bucket).distinct should have length 3
    val nt = 3.0 + 1024; val ns = 6.0 + 1024
    def grid(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def lr(ct: Long, cs: Long): BigDecimal =
      grid(math.log((ct + 1) / nt)) - grid(math.log((cs + 1) / ns))
    val logw1 = (lr(2, 2) * 2 + lr(1, 2)).toDouble    // aa×2 + bb
    val logw2 = (lr(0, 2) * 2 + lr(1, 2)).toDouble    // cc×2 + bb
    out(0) shouldBe ((1L, 3L, logw1, logw1 > 0))
    out(1) shouldBe ((2L, 3L, logw2, logw2 > 0))
    out(0)._3 should be > out(1)._3
  }

  test("Gopher rules: each metric on a crafted document; every rule can " +
    "fail the verdict on its own") {
    import spark.implicits._
    // A passing doc: 6 words of mean length in [3,10], 2 stopwords, all
    // alphabetic, no symbols/bullets/ellipses (minWords lowered to 5).
    val good = (1L, "the quick brown foxes jumped with")
    val docs = Seq(
      good,
      (2L, "one two"),                                  // too few words
      (3L, "the of a# b# c# d# e# f#"),                 // symbol ratio
      (4L, "- the aaa\n- of bbb\n- ccc ddd"),           // bullet lines
      (5L, "the aaa...\nof bbb...\nccc...\nddd eee"),   // ellipsis lines
      (6L, "the of 11 22 33 44 55 66"),                 // alpha fraction
      (7L, "aaa bbb ccc ddd eee fff")                   // no stopwords
    ).toDF("doc_id", "text")
    val out = TextStats.gopherRules(docs, minWords = 5)
      .select($"doc_id", $"kept").as[(Long, Boolean)].collect().toMap
    out shouldBe Map(1L -> true, 2L -> false, 3L -> false, 4L -> false,
      5L -> false, 6L -> false, 7L -> false)
    val m = TextStats.gopherRules(docs, minWords = 5)
      .where($"doc_id" === 5L).collect().head
    m.getAs[Long]("n_ellipsis") shouldBe 3L
    m.getAs[Long]("ellipsis_lines") shouldBe 3L
    m.getAs[Long]("n_lines") shouldBe 4L
    val b = TextStats.gopherRules(docs, minWords = 5)
      .where($"doc_id" === 4L).collect().head
    b.getAs[Long]("bullet_lines") shouldBe 3L
    b.getAs[Long]("stopword_hits") shouldBe 2L
    val g = TextStats.gopherRules(docs, minWords = 5)
      .where($"doc_id" === 1L).collect().head
    g.getAs[Long]("n_words") shouldBe 6L
    g.getAs[Double]("mean_word_len") shouldBe 28.0 / 6 +- 1e-12
    g.getAs[Long]("alpha_words") shouldBe 6L
  }

  test("BM25: hand-computed scores on a toy corpus; rarer terms score " +
    "higher, the absent term contributes nothing, top-k tie-breaks on id") {
    import spark.implicits._
    // 3 docs, query = (a, z): 'a' appears everywhere (df=3), 'z' only in
    // doc 2 (df=1) — BM25 must rank doc 2 first on idf alone.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a z b z"),
      (3L, "a a b c")).toDF("doc_id", "text")
    val out = TextStats.bm25Rank(docs, Seq("a", "z"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.map(_._1).head shouldBe 2L
    // hand computation: N=3, avgdl=4, dl=4 for all -> norm = 1.2
    def idf(df: Long): Double =
      math.rint(math.log((3.0 - df + 0.5) / (df + 0.5) + 1.0) * 1e6) / 1e6
    def w(tf: Long, idfV: Double): Double =
      idfV * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * 1.0)))
    def grid(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (idfA, idfZ) = (idf(3), idf(1))
    out.find(_._1 == 2L).get._3 shouldBe grid(w(1, idfA) + w(2, idfZ))
    out.find(_._1 == 1L).get._3 shouldBe grid(w(1, idfA))
    out.find(_._1 == 3L).get._3 shouldBe grid(w(2, idfA))
    // doc 3 (tf_a=2) beats doc 1 (tf_a=1); both trail doc 2
    out.map(_._1) shouldBe Array(2L, 3L, 1L)
  }

  test("BM25 index serving equals corpus scanning BIT FOR BIT, " +
    "zero-score docs included") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha alpha beta"),
      (3L, "epsilon zeta eta"),          // zero-score for this query
      (4L, "beta beta beta gamma")).toDF("doc_id", "text")
    val scan = TextStats.bm25Rank(docs, Seq("alpha", "gamma"), k = 4)
      .as[(Long, Long, Double)].collect()
    val (postings, dl) = TextStats.bm25IndexBuild(docs)
    val served = TextStats.bm25IndexRank(dl,
        t => postings.filter($"term" === t), Seq("alpha", "gamma"), k = 4)
      .as[(Long, Long, Double)].collect()
    served shouldBe scan // exact equality, not tolerance
    served.map(_._1) should contain(3L) // the zero-score doc is ranked
  }
}
