package graft.bike

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Golden fixture tests for the three GBFS transforms — the contract the
  * reference's transform jobs implement
  * (`/root/reference/dags/lib/transform_ss_velib_with_spark.py:59-108` and
  * SI/Lime siblings). Pins: declared output schemas, null-swallowing
  * boolean coercion (both int and string flavors), the two-step timestamp
  * dance at second granularity, null timestamp propagation, float/int
  * narrowing, and the engine-defined array→string rendering for
  * `rental_methods`.
  */
class BikeTransformSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fixture(name: String) = s"${BikeQueries.fixtureDir}/$name"

  private def tsMillis(sec: Long): Long = sec * 1000L

  /** Name+type schema equality. Nullability is compared one-way: the
    * transform may be *stricter* than the declared contract (the
    * `when(...).otherwise(false)` coercion provably never yields null, so
    * those columns come out non-nullable), never looser. */
  private def assertSchema(actual: org.apache.spark.sql.types.StructType,
                           declared: org.apache.spark.sql.types.StructType): Unit = {
    actual.fields.map(f => (f.name, f.dataType)).toSeq shouldBe
      declared.fields.map(f => (f.name, f.dataType)).toSeq
    actual.fields.zip(declared.fields).foreach { case (a, d) =>
      withClue(s"${a.name}: actual nullable=${a.nullable} but declared " +
        s"nullable=${d.nullable}") {
        (!a.nullable || d.nullable) shouldBe true
      }
    }
  }

  test("SS transform: schema matches the declared 9-column contract") {
    val out = Transforms.transformSs(Transforms.readRawJson(
      spark, fixture("station_status.json"), BikeSchemas.ssRaw))
    assertSchema(out.schema, BikeSchemas.ssFormatted)
  }

  test("SS transform: golden rows incl. null-flag→false and null timestamp") {
    val out = Transforms.transformSs(Transforms.readRawJson(
      spark, fixture("station_status.json"), BikeSchemas.ssRaw))
    val rows = out.collect().map { r =>
      (r.getString(1), r.getInt(3), r.getInt(4), r.getBoolean(5),
        r.getBoolean(6), r.getBoolean(7),
        Option(r.getTimestamp(8)).map(_.getTime))
    }.sortBy(_._1)
    rows should have length 8
    // station 1004: is_installed null in the feed → false (the reference's
    // otherwise-branch swallows null; SURVEY §2.3 F3)
    rows(3) shouldBe ("1004", 7, 12, false, true, true,
      Some(tsMillis(1739999650L)))
    // station 1005: last_reported null → null timestamp survives the dance
    rows(4) shouldBe ("1005", 1, 24, true, false, true, None)
    rows(0) shouldBe ("1001", 5, 30, true, true, true,
      Some(tsMillis(1739999990L)))
    // every row carries the root lastUpdatedOther timestamp
    out.collect().foreach { r =>
      r.getTimestamp(0).getTime shouldBe tsMillis(1740000000L)
    }
  }

  test("SI transform: schema + golden rows incl. null lat and array rendering") {
    val out = Transforms.transformSi(Transforms.readRawJson(
      spark, fixture("station_information.json"), BikeSchemas.siRaw))
    assertSchema(out.schema, BikeSchemas.siFormatted)
    val byId = out.collect().map { r =>
      r.getString(1) -> ((Option(r.get(4)).map(_.asInstanceOf[Float]),
        r.getString(3), Option(r.get(6)).map(_.asInstanceOf[Int]),
        r.getString(7)))
    }.toMap
    byId.keySet shouldBe Set("1001", "1002", "1003", "1004", "1005", "1006",
      "1007", "1009")
    byId("1001") shouldBe ((Some(48.865983f), "Place Alpha", Some(35),
      "[CREDITCARD]"))
    byId("1002")._4 shouldBe "[CREDITCARD, KEY]"
    byId("1004")._1 shouldBe None // null lat narrows to null float
    byId("1005")._4 shouldBe "[]" // empty array renders as []
    byId("1006")._4 shouldBe null // absent key stays null
  }

  test("Lime transform: schema + string-flavor boolean coercion goldens") {
    val out = Transforms.transformLime(Transforms.readRawJson(
      spark, fixture("free_bike_status.json"), BikeSchemas.limeRaw))
    assertSchema(out.schema, BikeSchemas.limeFormatted)
    val byId = out.collect().map { r =>
      r.getString(1) -> ((r.getBoolean(4), r.getBoolean(5), r.getInt(6),
        Option(r.getTimestamp(9)).map(_.getTime)))
    }.toMap
    byId should have size 5
    byId("lime-0001") shouldBe ((false, false, 15000,
      Some(tsMillis(1739999999L))))
    byId("lime-0002")._1 shouldBe true
    // lime-0003: is_reserved null → false (string flavor, SURVEY §2.3 F4)
    byId("lime-0003") shouldBe ((false, true, 0, Some(tsMillis(1739999950L))))
    byId("lime-0004")._2 shouldBe false // is_disabled null → false
    byId("lime-0005")._4 shouldBe None  // last_reported null → null ts
  }

  test("declared-schema read equals inference-parity read (SS fixture)") {
    val declared = Transforms.transformSs(Transforms.readRawJson(
      spark, fixture("station_status.json"), BikeSchemas.ssRaw))
    val inferred = Transforms.transformSs(Transforms.readRawJsonInferred(
      spark, fixture("station_status.json")))
    declared.collect().map(_.toString).sorted shouldBe
      inferred.collect().map(_.toString).sorted
  }

  test("mirrorPartition derives <date>/<time>/ from the drop path") {
    BikeJobs.mirrorPartition(
      "raw/velib/stations_status/20250210/180813/station_status.json",
      BikeJobs.FormattedVelibSs) shouldBe
      "formatted/velib/stations_status/20250210/180813/"
    an[IllegalArgumentException] should be thrownBy
      BikeJobs.mirrorPartition("flat.json", BikeJobs.FormattedVelibSs)
  }

  test("SS job writes formatted parquet under the mirrored partition") {
    val lakeRoot = java.nio.file.Files.createTempDirectory("graft-lake")
      .toString
    val dropDir = new java.io.File(
      s"$lakeRoot/raw/velib/stations_status/20250210/180813")
    dropDir.mkdirs()
    val src = java.nio.file.Paths.get(fixture("station_status.json"))
    java.nio.file.Files.copy(src,
      java.nio.file.Paths.get(s"$dropDir/station_status.json"))
    val out = BikeJobs.runSs(spark,
      s"$lakeRoot/raw/velib/stations_status/20250210/180813/station_status.json",
      lakeRoot)
    out shouldBe s"$lakeRoot/formatted/velib/stations_status/20250210/180813/"
    val readBack = spark.read.parquet(out)
    assertSchema(readBack.schema, BikeSchemas.ssFormatted)
    readBack.count() shouldBe 8
  }

  test("lake-resident formatted zone: drops append under hour-generated " +
    "partitions and a window read PRUNES to the touched hour's files") {
    val lakeRoot = java.nio.file.Files.createTempDirectory("graft-lakefmt")
      .toString
    def drop(date: String, time: String): String = {
      val dir = new java.io.File(
        s"$lakeRoot/raw/velib/stations_status/$date/$time")
      dir.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(fixture("station_status.json")),
        java.nio.file.Paths.get(s"$dir/station_status.json"))
      s"$dir/station_status.json"
    }
    // two drops in hour 09, one in hour 11 — the reference's dated
    // path layout, committed through hour-generated lake partitions
    BikeJobs.runSsLake(spark, drop("20250210", "090500"), lakeRoot)
    BikeJobs.runSsLake(spark, drop("20250210", "094500"), lakeRoot)
    BikeJobs.runSsLake(spark, drop("20250210", "110500"), lakeRoot)
    val table = s"$lakeRoot/formatted_lake/velib/stations_status"
    val all = graft.sources.ManifestLake.read(spark, table)
    all.count() shouldBe 24 // 3 drops × 8 stations
    // the drop timestamp decodes the path segments as UTC
    BikeJobs.dropTimestamp("x/20250210/090500/f.json") shouldBe
      java.sql.Timestamp.from(java.time.Instant.parse("2025-02-10T09:05:00Z"))
    // window read: hour 09 only — rows AND files prune to that hour
    val window = graft.sources.ManifestLake.readTsRange(spark, table,
      "drop_ts",
      java.sql.Timestamp.from(java.time.Instant.parse("2025-02-10T09:00:00Z")),
      java.sql.Timestamp.from(java.time.Instant.parse("2025-02-10T09:59:59Z")))
    window.count() shouldBe 16
    val touched = window.inputFiles
    touched should not be empty
    every(touched.toSeq) should include("p_hour=2025-02-10-09")
    // the generation is ENFORCED: a later append through the plain
    // write path must carry a correct p_hour or abort by name
    val bad = all.limit(1).drop("p_hour")
    intercept[Exception] {
      graft.sources.ManifestLake.write(bad, table, append = true)
    }
  }

  test("malformed drops: FAILFAST aborts, audited read quarantines") {
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt")
    val good = java.nio.file.Files.readString(
      java.nio.file.Paths.get(fixture("station_status.json"))).trim
    java.nio.file.Files.writeString(dir.resolve("drop.json"),
      good + "\n{not valid json at all\n")
    // cache: Spark disallows queries touching ONLY the corrupt column
    // on a raw JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val audited = Transforms.readRawJsonAudited(spark,
      dir.toString + "/drop.json", BikeSchemas.ssRaw).cache()
    audited.filter(org.apache.spark.sql.functions.col("_corrupt_record")
      .isNotNull).count() shouldBe 1
    audited.filter(org.apache.spark.sql.functions.col("_corrupt_record")
      .isNull).count() shouldBe 1
    an[Exception] should be thrownBy
      Transforms.readRawJsonStrict(spark, dir.toString + "/drop.json",
        BikeSchemas.ssRaw).collect()
  }

  test("enforceSchema rejects arity mismatch") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("x", "y")
    an[IllegalArgumentException] should be thrownBy
      Transforms.enforceSchema(df, BikeSchemas.ssFormatted)
  }
}
