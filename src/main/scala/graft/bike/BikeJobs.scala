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
