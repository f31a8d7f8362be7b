package graft.bike

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The three GBFS JSON→Parquet transform jobs — the reference pipeline's
  * workhorse, run every 3 h per feed
  * (`/root/reference/dags/lib/transform_ss_velib_with_spark.py:59-108`,
  * `transform_si_velib_with_spark.py:53-94`,
  * `transform_lime_with_spark.py:58-109`).
  *
  * Each transform is a pure `DataFrame => DataFrame`: JSON scan and parquet
  * write live in [[BikeJobs]] so tests can feed fixture frames directly.
  *
  * Semantics preserved exactly (SURVEY.md §2.2-§2.4):
  *   - root epoch → `from_unixtime` string → `to_timestamp` (the two-step
  *     "timestamp dance", F1+F2 — second-granularity, TZ = session TZ,
  *     pinned UTC here);
  *   - `explode(data.stations|data.bikes)` (P5) then nested projection (P1);
  *   - `when(flag === 1, true).otherwise(false)` int flavor (F3) and
  *     `when(flag === "true", ...)` string flavor (F4) — BOTH swallow null
  *     into false, faithfully;
  *   - declared-schema enforcement as one positional cast projection (E1)
  *     instead of the reference's plan-severing
  *     `createDataFrame(df.rdd, schema)` round-trip — identical result
  *     schema, whole-stage codegen and pushdown intact (SURVEY §4.3.1).
  *
  * Scale note: all three transforms are narrow (scan → generate → project);
  * no shuffle at any size. At 100 TB the only knobs that matter are input
  * split size and output file sizing, both handled by the writer config.
  */
object Transforms {

  /** E1 — positional schema enforcement as a cast projection. Mirrors the
    * reference's positional `createDataFrame(df.rdd, schema)`: column i of
    * `df` is coerced to field i of `schema` (type AND name). Unlike the
    * Python row verifier (which throws on un-coercible values), `cast`
    * yields null — callers that need fail-on-corrupt add explicit checks
    * (see `enriched.QualityGate`).
    */
  def enforceSchema(df: DataFrame, schema: StructType): DataFrame = {
    require(df.schema.length == schema.length,
      s"positional schema enforcement: ${df.schema.length} columns vs " +
        s"${schema.length} declared fields")
    df.select(df.columns.zip(schema.fields).map { case (c, f) =>
      col(c).cast(f.dataType).as(f.name)
    }.toSeq: _*)
  }

  /** Vélib' station_status: 9-column formatted contract. */
  def transformSs(raw: DataFrame): DataFrame = {
    val flattened = raw.select(
      from_unixtime(col("lastUpdatedOther")).as("lastUpdatedOther_timestamp"),
      explode(col("data.stations")).as("station"))
    val projected = flattened.select(
      col("lastUpdatedOther_timestamp"),
      col("station.station_id"),
      col("station.stationCode"),
      col("station.num_bikes_available"),
      col("station.num_docks_available"),
      col("station.is_installed"),
      col("station.is_returning"),
      col("station.is_renting"),
      from_unixtime(col("station.last_reported")).as("last_reported_timestamp"))
    val typed = projected
      .withColumn("is_installed",
        when(col("is_installed") === 1, true).otherwise(false))
      .withColumn("is_returning",
        when(col("is_returning") === 1, true).otherwise(false))
      .withColumn("is_renting",
        when(col("is_renting") === 1, true).otherwise(false))
      .withColumn("lastUpdatedOther_timestamp",
        to_timestamp(col("lastUpdatedOther_timestamp")))
      .withColumn("last_reported_timestamp",
        to_timestamp(col("last_reported_timestamp")))
    enforceSchema(typed, BikeSchemas.ssFormatted)
  }

  /** Vélib' station_information: 8-column formatted contract (no boolean
    * coercion — SI carries static geo/capacity data only). */
  def transformSi(raw: DataFrame): DataFrame = {
    val flattened = raw.select(
      from_unixtime(col("lastUpdatedOther")).as("lastUpdatedOther_timestamp"),
      explode(col("data.stations")).as("station"))
    val projected = flattened.select(
      col("lastUpdatedOther_timestamp"),
      col("station.station_id"),
      col("station.stationCode"),
      col("station.name"),
      col("station.lat"),
      col("station.lon"),
      col("station.capacity"),
      col("station.rental_methods"))
    val typed = projected
      .withColumn("lastUpdatedOther_timestamp",
        to_timestamp(col("lastUpdatedOther_timestamp")))
    enforceSchema(typed, BikeSchemas.siFormatted)
  }

  /** Lime free_bike_status: 10-column formatted contract (string-flavor
    * boolean coercion: the feed delivers "true"/"false" strings). */
  def transformLime(raw: DataFrame): DataFrame = {
    val flattened = raw.select(
      from_unixtime(col("last_updated")).as("last_updated_timestamp"),
      explode(col("data.bikes")).as("bike"))
    val projected = flattened.select(
      col("last_updated_timestamp"),
      col("bike.bike_id"),
      col("bike.lat"),
      col("bike.lon"),
      col("bike.is_reserved"),
      col("bike.is_disabled"),
      col("bike.current_range_meters"),
      col("bike.vehicle_type_id"),
      col("bike.vehicle_type"),
      from_unixtime(col("bike.last_reported")).as("last_reported_timestamp"))
    val typed = projected
      .withColumn("is_reserved",
        when(col("is_reserved") === "true", true).otherwise(false))
      .withColumn("is_disabled",
        when(col("is_disabled") === "true", true).otherwise(false))
      .withColumn("last_updated_timestamp",
        to_timestamp(col("last_updated_timestamp")))
      .withColumn("last_reported_timestamp",
        to_timestamp(col("last_reported_timestamp")))
    enforceSchema(typed, BikeSchemas.limeFormatted)
  }

  /** S5 — raw GBFS scan with a declared schema (one pass; the reference's
    * schema-less `spark.read.json` scans the input twice, SURVEY §4.3.2).
    * GBFS drops are one JSON document per file; `multiLine=false` handles
    * the single-line form, pass `multiLine=true` for pretty-printed drops.
    */
  def readRawJson(spark: SparkSession, path: String, schema: StructType,
                  multiLine: Boolean = false): DataFrame =
    spark.read.schema(schema).option("multiLine", multiLine).json(path)

  /** Inference-parity variant of [[readRawJson]] (the reference's exact
    * read). Kept for divergence testing; production uses the declared-schema
    * read. */
  def readRawJsonInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Fail-fast variant: any malformed drop aborts the job instead of
    * silently yielding null structs (PERMISSIVE would null `data`, the
    * explode would drop the rows, and a bad feed day would just vanish
    * from the lake). Use for scheduled production runs where the retry
    * policy owns recovery. */
  def readRawJsonStrict(spark: SparkSession, path: String,
                        schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Audited variant: malformed documents are RETAINED in
    * `_corrupt_record` so ingest can count/quarantine them while good
    * rows flow on — the lake-scale middle ground between silent
    * PERMISSIVE and all-or-nothing FAILFAST. */
  def readRawJsonAudited(spark: SparkSession, path: String,
                         schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
}
