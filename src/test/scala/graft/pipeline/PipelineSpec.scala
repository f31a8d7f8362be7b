package graft.pipeline

import java.time.{Clock, Instant, ZoneOffset}

import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.bike.BikeQueries
import graft.ml.WeightedKMeans

class PipelineSpec extends AnyFunSuite with Matchers with SparkSpec {

  // fixed wall clock just after the fixture feed timestamps, so the
  // trailing-90-minute K-Means window covers them deterministically
  private val clock =
    Clock.fixed(Instant.ofEpochSecond(1740000300L), ZoneOffset.UTC)

  private def fixtureClient = new FixtureFeedClient(BikeQueries.fixtureDir)

  test("ingest drops bytes verbatim under the date/time raw layout") {
    val lakeRoot = java.nio.file.Files.createTempDirectory("graft-ing").toString
    val drop = Ingest.fetchStore(fixtureClient, Feed.VelibSs, lakeRoot, clock)
    drop shouldBe s"$lakeRoot/raw/velib/stations_status/20250219/212500/station_status.json"
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(drop)) shouldBe
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        s"${BikeQueries.fixtureDir}/station_status.json"))
  }

  test("step retry: recovers after transient failures, reports attempts") {
    var calls = 0
    val flaky = new FeedClient {
      def fetch(feed: Feed): Array[Byte] = {
        calls += 1
        if (calls < 3) throw new RuntimeException("transient")
        fixtureClient.fetch(feed)
      }
    }
    val lakeRoot = java.nio.file.Files.createTempDirectory("graft-rty").toString
    val report = BikePipeline.run(spark, flaky, lakeRoot, clock,
      BikePipeline.RetryPolicy(retries = 2, delay = 0.millis),
      WeightedKMeans.Params(k = 3, seed = 1L))
    // exactly one fetch step needed 3 attempts; the rest ran clean
    report.steps.filter(_.name.startsWith("fetch_"))
      .map(_.attempts).sum shouldBe 5
  }

  test("retry exhaustion fails the pipeline") {
    val dead = new FeedClient {
      def fetch(feed: Feed): Array[Byte] = throw new RuntimeException("down")
    }
    val lakeRoot = java.nio.file.Files.createTempDirectory("graft-dead").toString
    val ex = the[RuntimeException] thrownBy BikePipeline.run(spark, dead,
      lakeRoot, clock, BikePipeline.RetryPolicy(retries = 1, delay = 0.millis))
    ex.getMessage should include("exhausted 2 attempts")
  }

  test("full DAG on fixtures: fan-out, barrier, enrich, serve, k-means") {
    val lakeRoot = java.nio.file.Files.createTempDirectory("graft-dag").toString
    val report = BikePipeline.run(spark, fixtureClient, lakeRoot, clock,
      BikePipeline.RetryPolicy(retries = 0, delay = 0.millis),
      WeightedKMeans.Params(k = 3, seed = 1L))

    report.steps.map(_.name) should contain allOf("fetch_ss", "fetch_si",
      "fetch_lime", "transform_ss", "transform_si", "transform_lime",
      "enriched_stage", "index_to_serving", "k_means")
    // serving saw the full 12-row enriched union
    report.servedCount shouldBe Some(12L)
    // k-means window [20:55, 22:25] keeps velib 1001/1002/1003/1004/1006/
    // 1007 (null-time 1005 drops; 1004 has null lat → skipped by the
    // assembler; 1008 not in SI) and lime 1-4 ⇒ 9 entities; replication
    // default is OFF (native weights) so rows == entities
    report.kmeansRows shouldBe 9L
    // formatted + enriched + usage zones all materialized
    new java.io.File(s"$lakeRoot/formatted/velib/stations_status/20250219/212500")
      .exists() shouldBe true
    new java.io.File(s"$lakeRoot/enriched/default_velib_lime/enriched_join_velib_lime/default")
      .exists() shouldBe true
    new java.io.File(s"$lakeRoot/usage/kmeans_results").exists() shouldBe true
  }
}
