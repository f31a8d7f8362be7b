package graft.bike

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Job wrappers around [[Transforms]]: raw JSON drop → formatted parquet,
  * mirroring the reference's time-partitioned path layout and its
  * spark-submit argv contract
  * (`/root/reference/dags/lib/transform_ss_velib_with_spark.py:30-38,108`).
  *
  * Zone layout (SURVEY §1.1): every ingest drop lands at
  * `<raw prefix>/<YYYYMMDD>/<HHMMSS>/<file>.json`; the transform writes to
  * `<formatted prefix>/<YYYYMMDD>/<HHMMSS>/` — same date/time partition,
  * derived by position from the input path.
  */
object BikeJobs {

  /** Default zone prefixes — the reference's Airflow Variable defaults
    * (`transform_ss_velib_with_spark.py:18-20`,
    * `transform_si_velib_with_spark.py:14`,
    * `transform_lime_with_spark.py:17-19`). */
  val FormattedVelibSs = "formatted/velib/stations_status/"
  val FormattedVelibSi = "formatted/velib/station_information/"
  val FormattedLimeBs = "formatted/lime/free_bike_status/"

  /** Date/time partition mirroring: `<...>/<date>/<time>/<file>` →
    * `<targetPrefix><date>/<time>/` (the reference's `split('/')[-3..-2]`).
    */
  def mirrorPartition(inputPath: String, targetPrefix: String): String = {
    val parts = inputPath.split('/')
    require(parts.length >= 3,
      s"input path '$inputPath' lacks the <date>/<time>/<file> layout")
    s"$targetPrefix${parts(parts.length - 3)}/${parts(parts.length - 2)}/"
  }

  private def run(spark: SparkSession, inputPath: String, lakeRoot: String,
                  targetPrefix: String, rawSchema: StructType,
                  transform: DataFrame => DataFrame): String = {
    val outPath = s"$lakeRoot/${mirrorPartition(inputPath, targetPrefix)}"
    val raw = Transforms.readRawJson(spark, inputPath, rawSchema)
    transform(raw).write.mode(SaveMode.Overwrite).parquet(outPath)
    outPath
  }

  def runSs(spark: SparkSession, inputPath: String, lakeRoot: String): String =
    run(spark, inputPath, lakeRoot, FormattedVelibSs, BikeSchemas.ssRaw,
      Transforms.transformSs)

  def runSi(spark: SparkSession, inputPath: String, lakeRoot: String): String =
    run(spark, inputPath, lakeRoot, FormattedVelibSi, BikeSchemas.siRaw,
      Transforms.transformSi)

  def runLime(spark: SparkSession, inputPath: String, lakeRoot: String): String =
    run(spark, inputPath, lakeRoot, FormattedLimeBs, BikeSchemas.limeRaw,
      Transforms.transformLime)

  /** The drop instant encoded in the reference's dated path layout
    * (`<...>/<YYYYMMDD>/<HHMMSS>/<file>`,
    * `dags/lib/velib_data_fetcher.py:27-29`), read back as a UTC
    * timestamp — the zone the reference's `datetime.now(timezone.utc)`
    * formatted the segments in. */
  def dropTimestamp(inputPath: String): java.sql.Timestamp = {
    val parts = inputPath.split('/')
    require(parts.length >= 3,
      s"input path '$inputPath' lacks the <date>/<time>/<file> layout")
    val (d, t) = (parts(parts.length - 3), parts(parts.length - 2))
    require(d.matches("\\d{8}") && t.matches("\\d{6}"),
      s"input path '$inputPath' segments '$d/$t' are not " +
        "YYYYMMDD/HHMMSS")
    java.sql.Timestamp.from(java.time.LocalDateTime
      .parse(d + t,
        java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
      .atZone(java.time.ZoneOffset.UTC).toInstant)
  }

  /** Lake-resident formatted zone: the SAME transform, committed to a
    * time-partitioned [[graft.sources.ManifestLake]] table instead of
    * a plain computed path. The reference's `<YYYYMMDD>/<HHMMSS>/`
    * drop layout maps onto hour-granularity generated partitioning —
    * every drop APPENDS under `p_hour=yyyy-MM-dd-HH` derived from the
    * drop instant ([[dropTimestamp]]), with the derivation recorded as
    * an enforced CHECK constraint — so serving a window of drops is an
    * hour-pruned [[graft.sources.ManifestLake.readTsRange]] instead of
    * a directory walk, and the parity surface and the scale surface
    * are ONE code path. At years of 10-minute drops (~52k dirs/year in
    * the plain layout) the hour partitions keep directory fan-out
    * bounded while the manifest prunes reads to the touched hours. */
  def runLakeFormatted(spark: SparkSession, inputPath: String,
                       lakeRoot: String, feedPrefix: String,
                       rawSchema: StructType,
                       transform: DataFrame => DataFrame): Long = {
    val table = s"$lakeRoot/formatted_lake/" +
      feedPrefix.stripPrefix("formatted/")
    val raw = Transforms.readRawJson(spark, inputPath, rawSchema)
    graft.sources.ManifestLake.writeTimePartitioned(
      transform(raw).withColumn("drop_ts",
        org.apache.spark.sql.functions.lit(dropTimestamp(inputPath))),
      table, "drop_ts", append = true, dayCol = "p_hour",
      granularity = "hour")
  }

  def runSsLake(spark: SparkSession, inputPath: String,
                lakeRoot: String): Long =
    runLakeFormatted(spark, inputPath, lakeRoot, FormattedVelibSs,
      BikeSchemas.ssRaw, Transforms.transformSs)

  def runSiLake(spark: SparkSession, inputPath: String,
                lakeRoot: String): Long =
    runLakeFormatted(spark, inputPath, lakeRoot, FormattedVelibSi,
      BikeSchemas.siRaw, Transforms.transformSi)

  def runLimeLake(spark: SparkSession, inputPath: String,
                  lakeRoot: String): Long =
    runLakeFormatted(spark, inputPath, lakeRoot, FormattedLimeBs,
      BikeSchemas.limeRaw, Transforms.transformLime)
}

/** spark-submit entry point: `TransformCli <ss|si|lime> <inputPath> <lakeRoot>`
  * — one main covering the reference's three per-feed jobs (each of which
  * reads `sys.argv[1]` as the drop path). */
object TransformCli {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: TransformCli <ss|si|lime> <inputPath> <lakeRoot>")
    val Array(feed, inputPath, lakeRoot) = args
    val spark = graft.core.GraftSession.local(appName = s"graft-transform-$feed")
    val out = feed match {
      case "ss" => BikeJobs.runSs(spark, inputPath, lakeRoot)
      case "si" => BikeJobs.runSi(spark, inputPath, lakeRoot)
      case "lime" => BikeJobs.runLime(spark, inputPath, lakeRoot)
      case other => throw new IllegalArgumentException(s"unknown feed: $other")
    }
    println(s"[transform-$feed] wrote $out")
    spark.stop()
  }
}
