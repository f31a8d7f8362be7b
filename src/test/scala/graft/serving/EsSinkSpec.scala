package graft.serving

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.bike.{BikeQueries, BikeSchemas, Transforms}
import graft.enriched.Enriched

/** Round-trips the ES sink's REST bulk transport against a local stub
  * HTTP server — the offline-closable part of S8: bulk NDJSON shape,
  * basic auth, keyed-upsert idempotency, and `_count` verification. */
class EsSinkSpec extends AnyFunSuite with Matchers with SparkSpec {

  /** In-memory fake ES: stores docs by `_id`, serves `_count`. */
  private final class StubEs {
    val docs = new java.util.concurrent.ConcurrentHashMap[String, String]()
    private val autoIds = new java.util.concurrent.atomic.AtomicLong()
    val sawAuth = new java.util.concurrent.atomic.AtomicBoolean(false)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange: com.sun.net.httpserver.HttpExchange =>
      val path = exchange.getRequestURI.getPath
      if (exchange.getRequestHeaders.containsKey("Authorization"))
        sawAuth.set(true)
      val body = scala.io.Source.fromInputStream(
        exchange.getRequestBody, "UTF-8").mkString
      val resp =
        if (path.endsWith("/_bulk")) {
          body.linesIterator.filter(_.nonEmpty).grouped(2).foreach {
            case Seq(action, doc) =>
              val id = "\"_id\"\\s*:\\s*\"([^\"]+)\"".r
                .findFirstMatchIn(action).map(_.group(1))
                .getOrElse("auto-" + autoIds.incrementAndGet())
              docs.put(id, doc)
            case _ =>
          }
          """{"took":1,"errors":false,"items":[]}"""
        } else if (path.endsWith("/_count")) s"""{"count":${docs.size}}"""
        else "{}"
      val bytes = resp.getBytes("UTF-8")
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  private def enrichedFixture = {
    val ss = Transforms.transformSs(Transforms.readRawJson(
      spark, s"${BikeQueries.fixtureDir}/station_status.json",
      BikeSchemas.ssRaw))
    val si = Transforms.transformSi(Transforms.readRawJson(
      spark, s"${BikeQueries.fixtureDir}/station_information.json",
      BikeSchemas.siRaw))
    val lime = Transforms.transformLime(Transforms.readRawJson(
      spark, s"${BikeQueries.fixtureDir}/free_bike_status.json",
      BikeSchemas.limeRaw))
    Enriched.enrichedJoinVelibLime(ss, si, lime)
  }

  test("bulk round-trip: keyed docs upsert idempotently; count verifies") {
    val es = new StubEs
    try {
      val sink = ElasticsearchSink("127.0.0.1", es.port, "u", "p",
        "all_bike_data")
      val keyed = Serving.prepare(enrichedFixture)
        .filter(col("id_concat").isNotNull)
      val n = keyed.count()
      n shouldBe 10 // fixture: 12 rows, 2 with null time → null key
      sink.write(keyed)
      sink.verifiedCount(spark) shouldBe Some(n)
      es.sawAuth.get() shouldBe true
      // re-serving the same window: same _ids overwrite — idempotent
      sink.write(keyed)
      sink.verifiedCount(spark) shouldBe Some(n)
      // the doc payload carries the serving projection
      es.docs.keySet.size shouldBe 10
      es.docs.values().iterator().next() should include("provider")
    } finally es.stop()
  }

  test("null mapping-id rows become ES-assigned creates, not upserts") {
    val es = new StubEs
    try {
      val sink = ElasticsearchSink("127.0.0.1", es.port, "u", "p",
        "all_bike_data")
      val all = Serving.prepare(enrichedFixture) // includes 2 null-key rows
      sink.write(all)
      sink.verifiedCount(spark) shouldBe Some(12)
      sink.write(all) // keyed rows overwrite; the 2 null-key rows duplicate
      sink.verifiedCount(spark) shouldBe Some(14)
    } finally es.stop()
  }
}
