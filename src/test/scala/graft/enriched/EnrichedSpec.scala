package graft.enriched

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.bike.{BikeQueries, BikeSchemas, Transforms}

/** Enriched-stage behavior: join/union contract, inner-join drop semantics,
  * the quality gate blocking the write on injected violations, and the
  * end-to-end stage writing the 7-column parquet. */
class EnrichedSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fixtures = (
    Transforms.transformSs(Transforms.readRawJson(
      spark, s"${BikeQueries.fixtureDir}/station_status.json",
      BikeSchemas.ssRaw)),
    Transforms.transformSi(Transforms.readRawJson(
      spark, s"${BikeQueries.fixtureDir}/station_information.json",
      BikeSchemas.siRaw)),
    Transforms.transformLime(Transforms.readRawJson(
      spark, s"${BikeQueries.fixtureDir}/free_bike_status.json",
      BikeSchemas.limeRaw)))

  test("velib join keeps only stations present in BOTH feeds") {
    val (ss, si, _) = fixtures
    val ids = Enriched.enrichedJoinVelib(ss, si)
      .select(col("id")).collect().map(_.getString(0)).sorted
    // 1008 is SS-only, 1009 is SI-only — both must drop
    ids shouldBe Array("1001", "1002", "1003", "1004", "1005", "1006", "1007")
  }

  test("union carries 7 velib + 5 lime rows with the unified contract") {
    val (ss, si, lime) = fixtures
    val out = Enriched.enrichedJoinVelibLime(ss, si, lime)
    out.columns.toSeq shouldBe Seq("provider", "id", "time", "lat", "lon",
      "num_bikes", "num_docks")
    out.groupBy(col("provider")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("velib" -> 7L, "lime" -> 5L)
    // lime rows: one bike each, no docks
    out.filter(col("provider") === "lime")
      .select(col("num_bikes"), col("num_docks")).collect().foreach { r =>
        r.getInt(0) shouldBe 1
        r.isNullAt(1) shouldBe true
      }
  }

  test("velib join plans a broadcast of the SI dimension side") {
    val (ss, si, _) = fixtures
    val plan = Enriched.enrichedJoinVelib(ss, si)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("quality gate passes on the clean fixture chain") {
    val (ss, si, lime) = fixtures
    QualityGate.failures(
      Enriched.enrichedJoinVelibLime(ss, si, lime)) shouldBe empty
  }

  test("quality gate counts injected violations and aborts the stage") {
    val (ss, si, lime) = fixtures
    val dirty = Enriched.enrichedJoinVelibLime(ss, si, lime)
      .withColumn("provider",
        when(col("id") === "1001", lit(null).cast("string"))
          .when(col("id") === "1002", lit("uber"))
          .otherwise(col("provider")))
      .withColumn("lat",
        when(col("id") === "lime-0001", lit(123.45f)).otherwise(col("lat")))
    val byName = QualityGate.checks(dirty)
      .map(c => c.name -> c.violations).toMap
    byName("provider_not_null") shouldBe 1
    byName("provider_accepted_values") shouldBe 1
    byName("geo_in_range") shouldBe 1
    byName("id_not_null") shouldBe 0
    // duplicated row → uniqueness violation
    val duped = Enriched.enrichedJoinVelibLime(ss, si, lime)
    QualityGate.checks(duped.unionByName(duped.limit(1)))
      .find(_.name == "provider_id_time_unique").get.violations shouldBe 1
  }

  test("runStage writes the enriched parquet and gates dirty input") {
    val (ss, si, lime) = fixtures
    val lakeRoot = java.nio.file.Files.createTempDirectory("graft-enr").toString
    val out = Enriched.runStage(ss, si, lime, lakeRoot)
    out shouldBe s"$lakeRoot/${Enriched.EnrichedVelibLime}default/"
    val readBack = spark.read.parquet(out)
    readBack.count() shouldBe 12
    readBack.schema.fields.map(f => (f.name, f.dataType)).toSeq shouldBe
      BikeSchemas.enriched.fields.map(f => (f.name, f.dataType)).toSeq
    // dirty input → exception, nothing written
    val dirtyLime = lime.withColumn("lat", lit(999.0f))
    val lake2 = java.nio.file.Files.createTempDirectory("graft-enr2").toString
    a[QualityGate.QualityGateException] should be thrownBy
      Enriched.runStage(ss, si, dirtyLime, lake2)
    new java.io.File(s"$lake2/${Enriched.EnrichedVelibLime}").exists() shouldBe false
  }
}
