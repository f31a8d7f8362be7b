package graft.bike

import org.apache.spark.sql.types._

/** Schema contracts for the GBFS bike pipeline.
  *
  * Two layers per feed:
  *   - `*Raw`: explicit read schema for the raw GBFS JSON drop. The
  *     reference infers this on every read (`spark.read.json` with no
  *     schema, `/root/reference/dags/lib/transform_ss_velib_with_spark.py:59`),
  *     which costs a second scan of the input; a declared schema reads once
  *     and is deterministic. Numeric JSON fields are read wide (Long/Double)
  *     exactly as inference would produce them.
  *   - `*Formatted`: the declared output contract the reference enforces via
  *     `createDataFrame(df.rdd, schema)`
  *     (`transform_ss_velib_with_spark.py:71-81`,
  *     `transform_si_velib_with_spark.py:64-73`,
  *     `transform_lime_with_spark.py:70-81`). We enforce the same contract
  *     with a positional cast projection ([[Transforms.enforceSchema]]) —
  *     same result schema, no plan-severing RDD round-trip.
  *
  * `enriched` is the 7-column contract both downstream consumers declare
  * (`index_to_elastic_with_spark.py:115-123`, `k_means_with_spark.py:89-97`).
  */
object BikeSchemas {

  // ---- Vélib' station_status ----

  val ssRaw: StructType = StructType(Seq(
    StructField("lastUpdatedOther", LongType),
    StructField("ttl", LongType),
    StructField("data", StructType(Seq(
      StructField("stations", ArrayType(StructType(Seq(
        StructField("station_id", StringType),
        StructField("stationCode", StringType),
        StructField("num_bikes_available", LongType),
        StructField("num_docks_available", LongType),
        StructField("is_installed", LongType),
        StructField("is_returning", LongType),
        StructField("is_renting", LongType),
        StructField("last_reported", LongType))))))))))

  val ssFormatted: StructType = StructType(Seq(
    StructField("lastUpdatedOther_timestamp", TimestampType),
    StructField("station_id", StringType),
    StructField("stationCode", StringType),
    StructField("num_bikes_available", IntegerType),
    StructField("num_docks_available", IntegerType),
    StructField("is_installed", BooleanType),
    StructField("is_returning", BooleanType),
    StructField("is_renting", BooleanType),
    StructField("last_reported_timestamp", TimestampType)))

  // ---- Vélib' station_information ----

  val siRaw: StructType = StructType(Seq(
    StructField("lastUpdatedOther", LongType),
    StructField("ttl", LongType),
    StructField("data", StructType(Seq(
      StructField("stations", ArrayType(StructType(Seq(
        StructField("station_id", StringType),
        StructField("stationCode", StringType),
        StructField("name", StringType),
        StructField("lat", DoubleType),
        StructField("lon", DoubleType),
        StructField("capacity", LongType),
        StructField("rental_methods", ArrayType(StringType)))))))))))

  /** `rental_methods` arrives as a JSON array but the reference declares it
    * StringType (`transform_si_velib_with_spark.py:72`); our cast renders
    * the array as its string form (`[CREDITCARD, KEY]`). The reference's
    * Python row verifier would reject a non-null list for a StringType
    * field, so this column is engine-defined where the reference would
    * crash — documented divergence, pinned in the golden test.
    */
  val siFormatted: StructType = StructType(Seq(
    StructField("lastUpdatedOther_timestamp", TimestampType),
    StructField("station_id", StringType),
    StructField("stationCode", StringType),
    StructField("name", StringType),
    StructField("lat", FloatType),
    StructField("lon", FloatType),
    StructField("capacity", IntegerType),
    StructField("rental_methods", StringType)))

  // ---- Lime free_bike_status ----

  val limeRaw: StructType = StructType(Seq(
    StructField("last_updated", LongType),
    StructField("ttl", LongType),
    StructField("data", StructType(Seq(
      StructField("bikes", ArrayType(StructType(Seq(
        StructField("bike_id", StringType),
        StructField("lat", DoubleType),
        StructField("lon", DoubleType),
        StructField("is_reserved", StringType),
        StructField("is_disabled", StringType),
        StructField("current_range_meters", LongType),
        StructField("vehicle_type_id", StringType),
        StructField("vehicle_type", StringType),
        StructField("last_reported", LongType))))))))))

  val limeFormatted: StructType = StructType(Seq(
    StructField("last_updated_timestamp", TimestampType),
    StructField("bike_id", StringType),
    StructField("lat", FloatType),
    StructField("lon", FloatType),
    StructField("is_reserved", BooleanType),
    StructField("is_disabled", BooleanType),
    StructField("current_range_meters", IntegerType),
    StructField("vehicle_type_id", StringType),
    StructField("vehicle_type", StringType),
    StructField("last_reported_timestamp", TimestampType)))

  // ---- Enriched layer (dbt-model output contract) ----

  val enriched: StructType = StructType(Seq(
    StructField("provider", StringType),
    StructField("id", StringType),
    StructField("time", TimestampType),
    StructField("lat", FloatType),
    StructField("lon", FloatType),
    StructField("num_bikes", IntegerType),
    StructField("num_docks", IntegerType)))
}
