package graft.ml

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.bike.{BikeQueries, BikeSchemas, Transforms}
import graft.enriched.Enriched

class WeightedKMeansSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

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

  test("prepare: closed-interval filter + weight clamp to >= 1") {
    val prepared = WeightedKMeans.prepare(enrichedFixture,
      ts(1739999700L), ts(1740000100L))
    // in-window: velib 1001/1002/1003 (1004 t=..650 out, 1005 t=null out,
    // 1006/1007 out) + lime 1..4 (lime-0005 t=null out)
    prepared.count() shouldBe 7
    prepared.select(min(col("weight"))).collect().head.getInt(0) should be >= 1
    // station 1002 has 0 bikes → clamped weight 1
    prepared.filter(col("id") === "1002").select(col("weight"))
      .collect().head.getInt(0) shouldBe 1
  }

  test("replication parity mode trains on Σ max(weight,1) rows and serves " +
    "the 7-column contract") {
    val (served, _) = WeightedKMeans.run(enrichedFixture,
      ts(1739999700L), ts(1740000100L),
      WeightedKMeans.Params(k = 3, seed = 1L,
        mode = WeightedKMeans.Replication))
    served.columns.toSeq shouldBe Seq("provider", "id_concat", "location",
      "time", "num_bikes", "num_docks", "prediction")
    // weights: 1001→5, 1002→1, 1003→2, lime→1×4 ⇒ 12 replicated rows
    served.count() shouldBe 12
    served.select(countDistinct(col("prediction"))).collect()
      .head.getLong(0) shouldBe 3
    // id_concat is the serving key: replicas of one point share it
    served.filter(col("id_concat").startsWith("1001_"))
      .select(countDistinct(col("id_concat"))).collect()
      .head.getLong(0) shouldBe 1
  }

  test("native weightCol mode: one row per point, objective matches " +
    "replication within tolerance") {
    import spark.implicits._
    // well-separated synthetic clusters so both modes reach the optimum
    val pts = Seq(
      ("a", "p1", 0.0f, 0.0f, 5), ("a", "p2", 0.1f, 0.1f, 3),
      ("a", "p3", 10.0f, 10.0f, 4), ("a", "p4", 10.1f, 10.1f, 2),
      ("a", "p5", 20.0f, 0.0f, 6), ("a", "p6", 20.1f, 0.1f, 1))
      .toDF("provider", "id", "lat", "lon", "num_bikes")
      .withColumn("time", to_timestamp(lit("2025-02-19 21:00:00")))
      .withColumn("num_docks", lit(0))
    val window = (ts(0L), ts(4102444800L))
    val (servedNative, modelNative) = WeightedKMeans.run(pts,
      window._1, window._2,
      WeightedKMeans.Params(k = 3, seed = 1L,
        mode = WeightedKMeans.NativeWeight))
    val (servedRepl, modelRepl) = WeightedKMeans.run(pts,
      window._1, window._2,
      WeightedKMeans.Params(k = 3, seed = 1L,
        mode = WeightedKMeans.Replication))
    servedNative.count() shouldBe 6   // no blowup
    servedRepl.count() shouldBe 21    // Σ weights
    val (wNative, wRepl) =
      (WeightedKMeans.wssse(modelNative), WeightedKMeans.wssse(modelRepl))
    // identical objective: Σ wᵢ·d² == replicated Σ d²
    math.abs(wNative - wRepl) should be <= 1e-6 * math.max(wNative, 1.0)
  }

  test("null geo points are skipped, not crashed on") {
    val (served, _) = WeightedKMeans.run(enrichedFixture,
      ts(1739990000L), ts(1740000100L),
      WeightedKMeans.Params(k = 3, seed = 1L))
    // window now includes station 1004 (null lat) — it must be dropped
    served.filter(col("id_concat").startsWith("1004_")).count() shouldBe 0
  }
}
