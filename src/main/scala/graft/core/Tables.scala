package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (`/root/repo/TESTDATA.md`).
  *
  * Each table is a single parquet file per scale factor. Reads are plain
  * `spark.read.parquet` — schema comes from the parquet footer, so Catalyst
  * gets exact column types for free and filter/projection pushdown applies.
  *
  * `events.ts` is stored as parquet INT64 TIMESTAMP(NANOS). With
  * `spark.sql.legacy.parquet.nanosAsLong=true` (set in [[GraftSession]]) it
  * reads as a nanosecond-epoch Long; [[events]] converts it to TimestampType
  * with `timestamp_micros(ts div 1000)`. Integer `div` is mandatory: ns
  * epochs (~1.7e18) exceed double's 53-bit mantissa, so a float division
  * would round half the values up by 1µs and break oracle parity.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Normalize `events.ts` to session-zoned TimestampType whatever the
    * generator wrote — the driver has shipped this column as INT64
    * TIMESTAMP(NANOS) (surfaced as a raw nanos Long under `nanosAsLong`)
    * and as plain TIMESTAMP(MICROS) (surfaced as TIMESTAMP_NTZ) in
    * different rounds, and a schema-shape change in the input must not
    * ripple into every consumer. Long nanos convert via integer
    * division (ns epochs exceed double's 53-bit mantissa, so a float
    * division would round half the values up by 1µs); NTZ wall-clock
    * values cast in the UTC session to the same instant the nanos path
    * produced. Shared by the batch loader and the streaming reader so
    * the type handling lives in exactly one place. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other")
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
