package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.ann.Similarity
import graft.text.Dedup

/** The LSH chains persist intermediates for their bucket self-joins; in a
  * long-lived session those must be released once the result is consumed
  * (r2 verdict: bare persists leaked cache). Pins the TransientCache
  * contract: after an action + drain, no cached RDD survives.
  */
class CacheHygieneSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def persistentCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("pair-mining chains leave no cached RDDs after drain") {
    // start clean: other suites share the session
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)

    Dedup.nearDupPairs(docs).write.format("noop").mode("overwrite").save()
    persistentCount should be > 0 // intermediates live during/after the action
    TransientCache.drain()
    persistentCount shouldBe 0

    Dedup.simhashPairs(docs).write.format("noop").mode("overwrite").save()
    TransientCache.drain()
    persistentCount shouldBe 0

    Similarity.hyperplanePairs(emb, threshold = 0.9)
      .write.format("noop").mode("overwrite").save()
    TransientCache.drain()
    persistentCount shouldBe 0
  }

  test("drain is thread-scoped: another thread's intermediates survive") {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val docs = Tables.documents(spark, sf)
    val t = new Thread(() => {
      Dedup.simhashPairs(docs).write.format("noop").mode("overwrite").save()
    })
    t.start(); t.join()
    val before = persistentCount
    before should be > 0
    TransientCache.drain() // this thread's scope is empty — must not touch
    persistentCount shouldBe before
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }
}
