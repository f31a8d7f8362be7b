package graft.bike

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate entries for the bike transform module.
  *
  * Each query runs the full fixture-JSON → formatted transform and projects
  * the result to engine-neutral comparison types (timestamps as epoch
  * micros) so the driver's DuckDB oracle can hash-match it cell for cell.
  * The oracle SQL re-derives the same semantics independently from the same
  * fixture via `read_json_auto` — a genuine two-engine check of explode,
  * nested projection, null-swallowing boolean coercion, the timestamp
  * dance, and cast enforcement.
  *
  * The un-projected formatted outputs (TimestampType etc.) are pinned by
  * golden ScalaTest suites in `graft.bike` (see BikeTransformSpec).
  */
object BikeQueries {

  /** Fixture GBFS drops live in-repo; override for out-of-repo runs. */
  val fixtureDir: String =
    sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/src/main/resources/gbfs")

  def b1TransformSs(s: SparkSession, d: String): DataFrame =
    Transforms.transformSs(Transforms.readRawJson(
        s, s"$fixtureDir/station_status.json", BikeSchemas.ssRaw))
      .select(col("station_id"), col("stationCode"),
        col("num_bikes_available"), col("num_docks_available"),
        col("is_installed"), col("is_returning"), col("is_renting"),
        unix_micros(col("lastUpdatedOther_timestamp")).as("last_updated_us"),
        unix_micros(col("last_reported_timestamp")).as("last_reported_us"))

  val b1Oracle: String =
    s"""SELECT CAST(station.station_id AS VARCHAR) AS station_id,
       |  station.stationCode AS stationCode,
       |  CAST(station.num_bikes_available AS INTEGER) AS num_bikes_available,
       |  CAST(station.num_docks_available AS INTEGER) AS num_docks_available,
       |  COALESCE(station.is_installed = 1, false) AS is_installed,
       |  COALESCE(station.is_returning = 1, false) AS is_returning,
       |  COALESCE(station.is_renting = 1, false) AS is_renting,
       |  CAST(lastUpdatedOther * 1000000 AS BIGINT) AS last_updated_us,
       |  CAST(station.last_reported * 1000000 AS BIGINT) AS last_reported_us
       |FROM (SELECT lastUpdatedOther, unnest(data.stations) AS station
       |      FROM read_json_auto('$fixtureDir/station_status.json'))""".stripMargin

  def b2TransformSi(s: SparkSession, d: String): DataFrame =
    Transforms.transformSi(Transforms.readRawJson(
        s, s"$fixtureDir/station_information.json", BikeSchemas.siRaw))
      .select(col("station_id"), col("stationCode"), col("name"),
        col("lat"), col("lon"), col("capacity"), col("rental_methods"),
        unix_micros(col("lastUpdatedOther_timestamp")).as("last_updated_us"))

  val b2Oracle: String =
    s"""SELECT CAST(station.station_id AS VARCHAR) AS station_id,
       |  station.stationCode AS stationCode,
       |  station.name AS name,
       |  CAST(station.lat AS REAL) AS lat,
       |  CAST(station.lon AS REAL) AS lon,
       |  CAST(station.capacity AS INTEGER) AS capacity,
       |  CASE WHEN station.rental_methods IS NULL THEN NULL
       |       ELSE '[' || COALESCE(array_to_string(station.rental_methods, ', '), '') || ']'
       |  END AS rental_methods,
       |  CAST(lastUpdatedOther * 1000000 AS BIGINT) AS last_updated_us
       |FROM (SELECT lastUpdatedOther, unnest(data.stations) AS station
       |      FROM read_json_auto('$fixtureDir/station_information.json'))""".stripMargin

  def b3TransformLime(s: SparkSession, d: String): DataFrame =
    Transforms.transformLime(Transforms.readRawJson(
        s, s"$fixtureDir/free_bike_status.json", BikeSchemas.limeRaw))
      .select(col("bike_id"), col("lat"), col("lon"),
        col("is_reserved"), col("is_disabled"), col("current_range_meters"),
        col("vehicle_type_id"), col("vehicle_type"),
        unix_micros(col("last_updated_timestamp")).as("last_updated_us"),
        unix_micros(col("last_reported_timestamp")).as("last_reported_us"))

  val b3Oracle: String =
    s"""SELECT bike.bike_id AS bike_id,
       |  CAST(bike.lat AS REAL) AS lat,
       |  CAST(bike.lon AS REAL) AS lon,
       |  COALESCE(bike.is_reserved = 'true', false) AS is_reserved,
       |  COALESCE(bike.is_disabled = 'true', false) AS is_disabled,
       |  CAST(bike.current_range_meters AS INTEGER) AS current_range_meters,
       |  bike.vehicle_type_id AS vehicle_type_id,
       |  bike.vehicle_type AS vehicle_type,
       |  CAST(last_updated * 1000000 AS BIGINT) AS last_updated_us,
       |  CAST(bike.last_reported * 1000000 AS BIGINT) AS last_reported_us
       |FROM (SELECT last_updated, unnest(data.bikes) AS bike
       |      FROM read_json_auto('$fixtureDir/free_bike_status.json'))""".stripMargin

  // -- enriched layer over the fixture chain --

  private[graft] def formattedFixtures(s: SparkSession) = (
    Transforms.transformSs(Transforms.readRawJson(
      s, s"$fixtureDir/station_status.json", BikeSchemas.ssRaw)),
    Transforms.transformSi(Transforms.readRawJson(
      s, s"$fixtureDir/station_information.json", BikeSchemas.siRaw)),
    Transforms.transformLime(Transforms.readRawJson(
      s, s"$fixtureDir/free_bike_status.json", BikeSchemas.limeRaw)))

  /** b4 — the full raw→formatted→enriched chain (R1 broadcast join + R2
    * harmonize + R3 union) projected engine-neutral. */
  def b4Enriched(s: SparkSession, d: String): DataFrame = {
    val (ss, si, lime) = formattedFixtures(s)
    graft.enriched.Enriched.enrichedJoinVelibLime(ss, si, lime)
      .select(col("provider"), col("id"),
        unix_micros(col("time")).as("time_us"),
        col("lat"), col("lon"), col("num_bikes"), col("num_docks"))
  }

  val b4Oracle: String =
    s"""WITH ss AS (SELECT unnest(data.stations) AS st
       |            FROM read_json_auto('$fixtureDir/station_status.json')),
       |     si AS (SELECT unnest(data.stations) AS inf
       |            FROM read_json_auto('$fixtureDir/station_information.json')),
       |     lime AS (SELECT unnest(data.bikes) AS bk
       |            FROM read_json_auto('$fixtureDir/free_bike_status.json'))
       |SELECT 'velib' AS provider, CAST(st.station_id AS VARCHAR) AS id,
       |  CAST(st.last_reported * 1000000 AS BIGINT) AS time_us,
       |  CAST(inf.lat AS REAL) AS lat, CAST(inf.lon AS REAL) AS lon,
       |  CAST(st.num_bikes_available AS INTEGER) AS num_bikes,
       |  CAST(st.num_docks_available AS INTEGER) AS num_docks
       |FROM ss, si WHERE st.station_id = inf.station_id
       |UNION ALL
       |SELECT 'lime', bk.bike_id, CAST(bk.last_reported * 1000000 AS BIGINT),
       |  CAST(bk.lat AS REAL), CAST(bk.lon AS REAL), 1, CAST(NULL AS INTEGER)
       |FROM lime""".stripMargin

  /** b5 — the quality-gate violation counts over the enriched fixture
    * output (the dbt-test replacement; all-zero = gate passes, the failure
    * path is exercised in EnrichedSpec). */
  def b5QualityGate(s: SparkSession, d: String): DataFrame = {
    val (ss, si, lime) = formattedFixtures(s)
    val results = graft.enriched.QualityGate.checks(
      graft.enriched.Enriched.enrichedJoinVelibLime(ss, si, lime))
    import s.implicits._
    results.map(r => (r.name, r.violations)).toDF("name", "violations")
  }

  val b5Oracle: String =
    s"""WITH enriched AS (
       |  SELECT 'velib' AS provider, CAST(st.station_id AS VARCHAR) AS id,
       |    st.last_reported AS t, inf.lat AS lat, inf.lon AS lon,
       |    st.num_bikes_available AS num_bikes,
       |    st.num_docks_available AS num_docks
       |  FROM (SELECT unnest(data.stations) AS st
       |        FROM read_json_auto('$fixtureDir/station_status.json')) ss,
       |       (SELECT unnest(data.stations) AS inf
       |        FROM read_json_auto('$fixtureDir/station_information.json')) si
       |  WHERE st.station_id = inf.station_id
       |  UNION ALL
       |  SELECT 'lime', bk.bike_id, bk.last_reported, bk.lat, bk.lon, 1,
       |    CAST(NULL AS INTEGER)
       |  FROM (SELECT unnest(data.bikes) AS bk
       |        FROM read_json_auto('$fixtureDir/free_bike_status.json')))
       |SELECT 'provider_not_null' AS name,
       |  count(*) FILTER (provider IS NULL) AS violations FROM enriched
       |UNION ALL SELECT 'id_not_null',
       |  count(*) FILTER (id IS NULL) FROM enriched
       |UNION ALL SELECT 'provider_accepted_values',
       |  count(*) FILTER (provider NOT IN ('velib', 'lime')) FROM enriched
       |UNION ALL SELECT 'geo_in_range',
       |  count(*) FILTER (lat < -90 OR lat > 90 OR lon < -180 OR lon > 180)
       |  FROM enriched
       |UNION ALL SELECT 'counts_non_negative',
       |  count(*) FILTER (num_bikes < 0 OR num_docks < 0) FROM enriched
       |UNION ALL SELECT 'provider_id_time_unique',
       |  (SELECT count(*) FROM (SELECT provider, id, t FROM enriched
       |     GROUP BY provider, id, t HAVING count(*) > 1))""".stripMargin

  /** b6 — serving projection (F5 id_concat key, F7 [lon,lat] geo array,
    * P3 drop) over the enriched chain. The timestamp-string flavor of
    * id_concat is the reference's exact key
    * (`index_to_elastic_with_spark.py:133`), rendered under the pinned UTC
    * session. */
  def b6ServingPrep(s: SparkSession, d: String): DataFrame = {
    val (ss, si, lime) = formattedFixtures(s)
    // The `[lon, lat]` geo array is built by Serving.prepare exactly as the
    // reference does; the gate projects it back to elements because the
    // driver's pandas comparison cannot hash raw array cells (r2 `err`).
    graft.serving.Serving.prepare(
        graft.enriched.Enriched.enrichedJoinVelibLime(ss, si, lime))
      .select(col("provider"), col("id"),
        unix_micros(col("time")).as("time_us"),
        col("num_bikes"), col("num_docks"), col("id_concat"),
        element_at(col("location"), 1).as("location_lon"),
        element_at(col("location"), 2).as("location_lat"))
  }

  val b6Oracle: String =
    s"""WITH enriched AS (
       |  SELECT 'velib' AS provider, CAST(st.station_id AS VARCHAR) AS id,
       |    st.last_reported AS t, inf.lat AS lat, inf.lon AS lon,
       |    CAST(st.num_bikes_available AS INTEGER) AS num_bikes,
       |    CAST(st.num_docks_available AS INTEGER) AS num_docks
       |  FROM (SELECT unnest(data.stations) AS st
       |        FROM read_json_auto('$fixtureDir/station_status.json')) ss,
       |       (SELECT unnest(data.stations) AS inf
       |        FROM read_json_auto('$fixtureDir/station_information.json')) si
       |  WHERE st.station_id = inf.station_id
       |  UNION ALL
       |  SELECT 'lime', bk.bike_id, bk.last_reported, bk.lat, bk.lon, 1,
       |    CAST(NULL AS INTEGER)
       |  FROM (SELECT unnest(data.bikes) AS bk
       |        FROM read_json_auto('$fixtureDir/free_bike_status.json')))
       |SELECT provider, id, CAST(t * 1000000 AS BIGINT) AS time_us,
       |  num_bikes, num_docks,
       |  id || '_' || strftime(make_timestamp(t * 1000000),
       |    '%Y-%m-%d %H:%M:%S') AS id_concat,
       |  CAST(lon AS REAL) AS location_lon,
       |  CAST(lat AS REAL) AS location_lat
       |FROM enriched""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b1_transform_ss" -> (b1TransformSs _),
    "b2_transform_si" -> (b2TransformSi _),
    "b3_transform_lime" -> (b3TransformLime _),
    "b4_enriched" -> (b4Enriched _),
    "b5_quality_gate" -> (b5QualityGate _),
    "b6_serving_prep" -> (b6ServingPrep _))

  val oracles: Map[String, String] = Map(
    "b1_transform_ss" -> b1Oracle,
    "b2_transform_si" -> b2Oracle,
    "b3_transform_lime" -> b3Oracle,
    "b4_enriched" -> b4Oracle,
    "b5_quality_gate" -> b5Oracle,
    "b6_serving_prep" -> b6Oracle)
}
