package graft.serving

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.bike.{BikeQueries, BikeSchemas, Transforms}
import graft.enriched.Enriched

class ServingSpec extends AnyFunSuite with Matchers with SparkSpec {

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

  test("prepare: id_concat key, [lon,lat] location, geo columns dropped") {
    val served = Serving.prepare(enrichedFixture)
    served.columns.toSeq shouldBe Seq("provider", "id", "time", "num_bikes",
      "num_docks", "id_concat", "location")
    val r1001 = served.filter(col("id") === "1001").collect().head
    r1001.getAs[String]("id_concat") shouldBe "1001_2025-02-19 21:19:50"
    val loc = r1001.getSeq[Float](r1001.fieldIndex("location"))
    loc.toList shouldBe List(2.275725f, 48.865983f) // GeoJSON order: lon first
    // null time → null key (upsert identity undefined, faithfully)
    served.filter(col("id") === "1005").collect()
      .head.getAs[String]("id_concat") shouldBe null
  }

  test("parquet sink round-trips and verifies the count") {
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val sink = ParquetSink(s"$out/docs")
    sink.write(Serving.prepare(enrichedFixture))
    sink.verifiedCount(spark) shouldBe Some(12L)
  }

  test("listSubfolders + pickFirst mirror the reference's discovery") {
    val root = java.nio.file.Files.createTempDirectory("graft-list").toString
    Serving.listSubfolders(spark, s"$root/missing") shouldBe empty
    new java.io.File(s"$root/a").mkdirs()
    new java.io.File(s"$root/b").mkdirs()
    val subs = Serving.listSubfolders(spark, root)
    subs.map(_.split('/').last) shouldBe Seq("a", "b")
    Serving.pickFirst(subs, root) shouldBe subs.head
    an[IllegalStateException] should be thrownBy
      Serving.pickFirst(Seq.empty, root)
  }

  test("end-to-end index job: enriched stage → serve → verified count") {
    val lakeRoot = java.nio.file.Files.createTempDirectory("graft-serve").toString
    val ss = Transforms.transformSs(Transforms.readRawJson(
      spark, s"${BikeQueries.fixtureDir}/station_status.json",
      BikeSchemas.ssRaw))
    val si = Transforms.transformSi(Transforms.readRawJson(
      spark, s"${BikeQueries.fixtureDir}/station_information.json",
      BikeSchemas.siRaw))
    val lime = Transforms.transformLime(Transforms.readRawJson(
      spark, s"${BikeQueries.fixtureDir}/free_bike_status.json",
      BikeSchemas.limeRaw))
    Enriched.runStage(ss, si, lime, lakeRoot)
    val count = Serving.indexJob(spark, lakeRoot,
      ParquetSink(s"$lakeRoot/serving/all_bike_data"))
    count shouldBe Some(12L)
  }

  test("ES sink exposes the reference's option surface; unreachable " +
    "cluster fails the write, count verification degrades to None") {
    val sink = ElasticsearchSink("127.0.0.1", 1, "u", "p", // port 1: nothing listens
      "all_bike_data")
    sink.options shouldBe Map(
      "es.nodes" -> "127.0.0.1",
      "es.port" -> "1",
      "es.net.http.auth.user" -> "u",
      "es.net.http.auth.pass" -> "p",
      "es.nodes.wan.only" -> "true",
      "es.resource" -> "all_bike_data",
      "es.mapping.id" -> "id_concat",
      "es.index.auto.create" -> "false")
    sink.connectorAvailable shouldBe false
    an[Exception] should be thrownBy
      sink.write(Serving.prepare(enrichedFixture))
    sink.verifiedCount(spark) shouldBe None
  }
}
