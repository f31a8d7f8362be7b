package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Mirrors the reference's session bootstrap
  * (`/root/reference/dags/lib/transform_ss_velib_with_spark.py:47-54`) but
  * Spark-native: one JVM, UTC session timezone (the reference leaves the TZ
  * unset, so its `from_unixtime` output is cluster-TZ-dependent — we pin UTC
  * and document the divergence, SURVEY.md §7.4), AQE on, shuffle partitions
  * sized to the actual parallelism instead of the 200 default.
  *
  * `spark.sql.legacy.parquet.nanosAsLong=true` is required for the driver
  * test tables: `events.parquet` stores INT64 TIMESTAMP(NANOS), which Spark
  * 4.x otherwise rejects with PARQUET_TYPE_ILLEGAL. With the flag on, the
  * column surfaces as a nanosecond-epoch Long and [[Tables.events]] converts
  * it to a proper TimestampType via integer division (micros).
  *
  * At cluster scale the same builder is used minus `.master(local)` —
  * spark-submit supplies master/memory and `shuffle.partitions` should be
  * ~2-3× total executor cores (set via --conf).
  */
object GraftSession {
  /** Number of local cores: SPARK_GRAFT_CPUS env, else all available. */
  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  def local(cores: Int = defaultCores,
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
