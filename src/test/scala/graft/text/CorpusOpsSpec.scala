package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.Tables

class CorpusOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("deterministic split: stable across repartitioning, roughly " +
    "proportional, and a pure function of the id") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val a = CorpusOps.deterministicSplit(docs)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val b = CorpusOps.deterministicSplit(docs.repartition(17))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    a shouldBe b // identical assignment under any partitioning
    val byCount = a.values.groupBy(identity).view.mapValues(_.size).toMap
    // 8/1/1 buckets of a 16-bit hash: coarse proportionality is enough
    byCount("train").toDouble / a.size should be(0.8 +- 0.1)
    byCount.keySet shouldBe Set("train", "valid", "test")
  }

  test("token packing: offsets are gapless per block, chunk spans are " +
    "consistent, and totals add up") {
    import spark.implicits._
    val out = CorpusOps.packTokens(Tables.documents(spark, sf), budget = 64)
      .orderBy($"lang", $"doc_id").collect()
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      // each doc starts exactly where the previous one ended
      rows.sliding(2).foreach {
        case Array(p, n) =>
          n.getAs[Long]("token_offset") shouldBe
            p.getAs[Long]("token_offset") + p.getAs[Long]("n_tokens")
        case _ =>
      }
    }
    out.foreach { r =>
      val (off, n) = (r.getAs[Long]("token_offset"), r.getAs[Long]("n_tokens"))
      r.getAs[Long]("first_seq") shouldBe off / 64
      r.getAs[Long]("last_seq") shouldBe (off + n - 1) / 64
      r.getAs[Long]("n_chunks") shouldBe
        r.getAs[Long]("last_seq") - r.getAs[Long]("first_seq") + 1
    }
    // budget-1 docs never split; docs longer than the budget always do
    out.filter(_.getAs[Long]("n_tokens") > 64)
      .foreach(_.getAs[Long]("n_chunks") should be >= 2L)
  }

  test("mixture rebalancing: kept counts hit floored quotas in target " +
    "proportion, selection is stable under repartitioning") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val targets = Seq("en" -> 0.4, "de" -> 0.15, "es" -> 0.15,
      "fr" -> 0.15, "zh" -> 0.15)
    val out = CorpusOps.rebalanceMix(docs, targets)
    val kept = out.filter($"kept")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val nByLang = docs.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val m = targets.map { case (g, t) => nByLang(g) / t }.min
    targets.foreach { case (g, t) =>
      kept(g) shouldBe math.floor(t * m).toLong
    }
    // every group's quota is satisfiable and the mix is proportional:
    // ratio of any two groups differs from the target ratio only by
    // flooring
    kept("en").toDouble / kept.values.sum should be(0.4 +- 0.01)
    // determinism: identical keep-set under a different partitioning
    val a = out.filter($"kept").select($"doc_id").as[Long].collect().sorted
    val b = CorpusOps.rebalanceMix(docs.repartition(13), targets)
      .filter($"kept").select($"doc_id").as[Long].collect().sorted
    a shouldBe b
  }

  test("mixture rebalancing edge cases: a target group with no corpus " +
    "rows empties the selection; duplicate targets are rejected; " +
    "quantile gate keeps NULL-group rows") {
    import spark.implicits._
    val docs = Seq((1L, "en", "a b"), (2L, "en", "c d"), (3L, "de", "e f"))
      .toDF("doc_id", "lang", "text")
    // "zh" has zero rows: the only mixture matching the target is empty
    val out = CorpusOps.rebalanceMix(docs,
      Seq("en" -> 0.5, "de" -> 0.25, "zh" -> 0.25))
    out.filter($"kept").count() shouldBe 0
    out.count() shouldBe 3 // en/de rows still flow through, flagged false
    intercept[IllegalArgumentException] {
      CorpusOps.rebalanceMix(docs, Seq("en" -> 0.5, "en" -> 0.5))
    }
    // a NULL group must not vanish from a flag-style operator
    val withNull = Seq((1L, Some("en"), 5L), (2L, None, 7L), (3L, None, 9L))
      .toDF("doc_id", "lang", "n_tokens")
    val gated = CorpusOps.quantileFilter(withNull, "n_tokens", 0.5)
    gated.count() shouldBe 3
    gated.filter($"lang".isNull && $"kept").select($"doc_id")
      .as[Long].collect().sorted shouldBe Array(3L) // median of {7,9} = 8
    // NULL-block rows form their own packing block (they must not fall
    // out of the sharded layout's equi-joins)
    val nullLang = Seq((1L, Some("en"), "a b"), (2L, None, "c d e"),
      (3L, None, "f g")).toDF("doc_id", "lang", "text")
    val packed = CorpusOps.packTokens(nullLang, budget = 4)
    packed.count() shouldBe 3
    packed.filter($"lang".isNull).select($"doc_id", $"token_offset")
      .as[(Long, Long)].collect().sorted shouldBe Array((2L, 0L), (3L, 3L))
    graft.core.TransientCache.drain()
    // a NULL id still ranks (shard 0, nulls-first) instead of vanishing
    val nullId = Seq((Some(1L), "en", "x"), (None, "en", "y"))
      .toDF("doc_id", "lang", "text")
    val mixed = CorpusOps.rebalanceMix(nullId, Seq("en" -> 1.0))
    mixed.count() shouldBe 2
    mixed.select($"mix_rank").as[Long].collect().sorted shouldBe
      Array(1L, 2L)
    graft.core.TransientCache.drain()
  }

  test("approx quantile gate: the sketch cut is an actual member value " +
    "near the requested rank, and the flag semantics match the exact " +
    "form's") {
    import spark.implicits._
    // continuous domain — the case the bounded-buffer variant exists for
    val vals = (1 to 1000).map(i => (i.toLong, "en", i * 0.001 + 0.5))
      .toDF("doc_id", "lang", "score")
    val out = CorpusOps.quantileFilter(vals, "score", 0.5, exact = false)
    out.count() shouldBe 1000
    val cut = out.select($"cut").head().getDouble(0)
    // GK sketch returns a member value within rank error 1/accuracy
    vals.select($"score").as[Double].collect() should contain(cut)
    val kept = out.filter($"kept").count()
    kept.toDouble shouldBe (500.0 +- 10.0)
    // exact and approx agree on which rows clear an identical cut
    val exactOut = CorpusOps.quantileFilter(vals, "score", 0.5)
    exactOut.filter($"kept").count().toDouble shouldBe (500.0 +- 1.0)
  }

  test("sharded corpus windows: hierarchical prefix equals the global " +
    "window on a maximally skewed corpus, and no shard holds the whole " +
    "group") {
    import spark.implicits._
    // 2,000 docs, ONE language — the exact shape where a per-lang window
    // sorts the entire corpus on one reducer
    val docs = (0L until 2000L)
      .map(i => (i * 37 % 4096, "en", ("tok " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "lang", "text")
    // packTokens: sharded output must be byte-identical to the
    // single-window layout (offsets are doc_id-global by contract)
    val packed1 = CorpusOps.packTokens(docs, budget = 64, shards = 1)
      .orderBy($"doc_id").collect()
    val packed8 = CorpusOps.packTokens(docs, budget = 64, shards = 8)
      .orderBy($"doc_id").collect()
    packed8 shouldBe packed1
    // rebalanceMix: global sha-ordered rank must survive sharding
    val mix1 = CorpusOps.rebalanceMix(docs, Seq("en" -> 1.0), shards = 1)
      .select($"doc_id", $"mix_rank", $"kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val mix8 = CorpusOps.rebalanceMix(docs, Seq("en" -> 1.0), shards = 8)
      .select($"doc_id", $"mix_rank", $"kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    mix8 shouldBe mix1
    // balance: the biggest block a single task sorts is far below the
    // group size (range shards ≈ N/8; hex-prefix shards hash-uniform)
    val rangeSizes = CorpusOps.rangeShard(docs, "lang", "doc_id", 8)
      .groupBy($"__shard").count().as[(Int, Long)].collect().toMap
    rangeSizes.size shouldBe 8
    rangeSizes.values.max should be <= (2 * 2000L / 8)
    val hexSizes = docs
      .withColumn("__sha", sha2($"doc_id".cast("string"), 256))
      .withColumn("__shard", CorpusOps.hexPrefixShard($"__sha", 8))
      .groupBy($"__shard").count().as[(Int, Long)].collect().toMap
    hexSizes.size shouldBe 8
    hexSizes.values.max should be <= (2 * 2000L / 8)
  }

  test("dedupClusters frees every checkpoint RDD at drain") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val nodes = (1L to 50L).toDF("id")
    // five 5-node stars: diameter 2, a few propagation rounds
    val pairs = (0L until 5L).flatMap(s =>
      (2L to 5L).map(i => (s * 5 + 1, s * 5 + i))).toDF("id_a", "id_b")
    Dedup.dedupClusters(nodes, "id", pairs)
      .write.format("noop").mode("overwrite").save()
    graft.core.TransientCache.drain()
    // async unpersists need a beat to land
    eventually {
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      leaked shouldBe empty
    }
  }

  private def eventually(assert: => Unit): Unit = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    var last: Throwable = null
    while (System.nanoTime() < deadline) {
      try { assert; return }
      catch { case t: org.scalatest.exceptions.TestFailedException =>
        last = t; Thread.sleep(100) }
    }
    throw last
  }

  test("connected components: chains merge transitively, singletons " +
    "keep their own label, non-convergence raises") {
    import spark.implicits._
    val nodes = (1L to 7L).toDF("id")
    // path 1-2-3-4, edge 5-6, singleton 7
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L))
      .toDF("id_a", "id_b")
    val out = Dedup.dedupClusters(nodes, "id", pairs)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    graft.core.TransientCache.drain()
    out.map(r => r._1 -> r._2).toMap shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L)
    out.filter(_._2 == 1L).map(_._3).distinct shouldBe Array(4L)
    out.filter(_._4).map(_._1).sorted shouldBe Array(1L, 5L, 7L)
    // a 4-path needs 3 propagation hops: maxIter=1 must refuse to
    // return a half-merged labeling
    intercept[IllegalStateException] {
      Dedup.connectedComponents(nodes, "id", pairs, maxIter = 1)
    }
    graft.core.TransientCache.drain()
  }

  test("chunkDocs: overlapping windows tile the token stream, short docs " +
    "are exactly one chunk") {
    import spark.implicits._
    val words = (1 to 150).map(i => s"w$i")
    val docs = Seq((1L, words.mkString(" ")), (2L, "a b c"))
      .toDF("doc_id", "text")
    val chunks = CorpusOps.chunkDocs(docs, maxTokens = 64, overlap = 16)
      .as[(Long, Int, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // 150 tokens, stride 48: starts 0/48/96 → sizes 64/64/54
    chunks(1L).map(_._4).toSeq shouldBe Seq(64, 64, 54)
    chunks(1L).map(_._3).distinct.toSeq shouldBe Seq(150)
    chunks(2L).map(_._4).toSeq shouldBe Seq(3)
    // the middle chunk's hash is the sha256 of tokens 49..112 —
    // independently computed, so the slice arithmetic cannot be off by one
    val expect = java.security.MessageDigest.getInstance("SHA-256")
      .digest(words.slice(48, 112).mkString(" ")
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    chunks(1L)(1)._5 shouldBe expect
    // consecutive chunks overlap by exactly 16 tokens: token w49 (start of
    // chunk 1) sits 16 from the end of chunk 0's window [1,64]
    CorpusOps.chunkDocs(docs.filter($"doc_id" === 1L), 64, 0)
      .count() shouldBe 3 // ceil(150/64) with no overlap
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the " +
    "eval set; short eval items match only verbatim") {
    import spark.implicits._
    val evalItem = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"prefix words here $evalItem and a suffix tail"), // contains it
      (2L, "completely unrelated text with many distinct tokens " +
        "that never collide with anything"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"), // 7-overlap only
      (4L, "tiny doc"), // short doc, whole-text shingle
      (5L, "tiny doc")  // verbatim copy of a short eval item
    ).toDF("doc_id", "text")
    val eval_ = Seq(evalItem, "tiny doc").toDF("text")
    val flagged = CorpusOps.decontaminate(docs, eval_, n = 8)
      .select($"doc_id", $"contaminated").as[(Long, Boolean)]
      .collect().toMap
    flagged(1L) shouldBe true  // shares the full 8-gram
    flagged(2L) shouldBe false
    flagged(3L) shouldBe false // 7 shared tokens ≠ any shared 8-gram
    flagged(4L) shouldBe true  // whole-text match with short eval item
    flagged(5L) shouldBe true
  }

  test("temperature mix: copy counts sum exactly to each domain's " +
    "quota, alpha < 1 flattens toward uniform, and the deal is stable " +
    "under repartitioning") {
    import spark.implicits._
    // skewed corpus: 64 en, 8 de, 2 zh
    val docs = ((1 to 64).map(i => (i.toLong, "en")) ++
      (101 to 108).map(i => (i.toLong, "de")) ++
      Seq((201L, "zh"), (202L, "zh"))).toDF("doc_id", "lang")
    // budget = corpus size, so "flatter than natural" is visible as
    // head-subsample / tail-upsample
    val out = CorpusOps.temperatureMix(docs, budget = 74L, alpha = 0.5)
    val perGroup = out.groupBy($"lang")
      .agg(sum($"n_copies").as("copies"), max($"quota").as("quota"),
        max($"mix_share").as("share"), count(lit(1)).as("n"))
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // Σ n_copies == quota, exactly, per domain
    perGroup.values.foreach { case (_, copies, quota, _, _) =>
      copies shouldBe quota
    }
    // sqrt-temperature shares: 8/11.242, 2.828/11.242, 1.414/11.242 —
    // flatter than the natural 64/74, 8/74, 2/74
    perGroup("en")._4 should be < 64.0 / 74.0
    perGroup("zh")._4 should be > 2.0 / 74.0
    // the small domain upsamples (copies > corpus size), the head
    // subsamples (copies < corpus size)
    perGroup("zh")._2 should be > perGroup("zh")._5
    perGroup("en")._2 should be < perGroup("en")._5
    // copy counts differ by at most one WITHIN a domain (the dealt
    // remainder), and the deal is partitioning-invariant
    val byDomain = out.select($"lang", $"n_copies")
      .as[(String, Long)].collect().groupBy(_._1)
    byDomain.values.foreach { g =>
      g.map(_._2).max - g.map(_._2).min should be <= 1L
    }
    val copies = out.select($"doc_id", $"n_copies")
      .as[(Long, Long)].collect().toMap
    val re = CorpusOps.temperatureMix(docs.repartition(7), budget = 74L,
      alpha = 0.5).select($"doc_id", $"n_copies")
      .as[(Long, Long)].collect().toMap
    re shouldBe copies
  }

  test("stratified split: exact floor quotas per stratum, tiny strata " +
    "keep a test remainder, assignment partitioning-invariant") {
    import spark.implicits._
    // strata: 20 en, 10 fr, 3 zh
    val docs = ((1L to 20L).map(i => (i, "en")) ++
      (21L to 30L).map(i => (i, "fr")) ++
      (31L to 33L).map(i => (i, "zh"))).toDF("doc_id", "lang")
    val out = CorpusOps.stratifiedSplit(docs)
      .select($"doc_id", $"lang", $"strat_rank", $"split")
      .as[(Long, String, Long, String)].collect()
    val byStratum = out.groupBy(_._2).view
      .mapValues(_.groupBy(_._4).view.mapValues(_.length).toMap).toMap
    byStratum("en") shouldBe Map("train" -> 16, "valid" -> 2, "test" -> 2)
    byStratum("fr") shouldBe Map("train" -> 8, "valid" -> 1, "test" -> 1)
    // 3 docs: floor(2.4)=2 train, floor(0.3)=0 valid, 1 test — the
    // stratum is never swallowed whole into train
    byStratum("zh") shouldBe Map("train" -> 2, "test" -> 1)
    // ranks are a permutation of 1..n within each stratum
    out.groupBy(_._2).foreach { case (_, g) =>
      g.map(_._3).sorted shouldBe (1L to g.length).toArray
    }
    val re = CorpusOps.stratifiedSplit(docs.repartition(7), shards = 3)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    re shouldBe out.map(r => r._1 -> r._4).toMap
  }
}
