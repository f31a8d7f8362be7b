package graft.serving

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Serving layer — the reference's `index_to_elastic` job re-expressed
  * behind a pluggable [[Sink]] (SURVEY §2.1 S6/S8/S9/S11;
  * `/root/reference/dags/lib/index_to_elastic_with_spark.py:96-155`).
  *
  * The contract to preserve is keyed upsert: every document carries
  * `id_concat = id + "_" + time` as its identity, so re-serving the same
  * window is idempotent. The concrete sink (Elasticsearch in the
  * reference; parquet/console for offline runs) is an implementation
  * detail behind the trait.
  */
trait Sink {
  def write(df: DataFrame): Unit

  /** S11 — post-write count verification (the reference's `match_all`
    * REST count, `index_to_elastic_with_spark.py:40-68`). None when the
    * sink cannot count (console). */
  def verifiedCount(spark: SparkSession): Option[Long]
}

final case class ParquetSink(path: String) extends Sink {
  def write(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
  def verifiedCount(spark: SparkSession): Option[Long] =
    Some(spark.read.parquet(path).count())
}

final case class ConsoleSink(numRows: Int = 20) extends Sink {
  def write(df: DataFrame): Unit = df.show(numRows, truncate = false)
  def verifiedCount(spark: SparkSession): Option[Long] = None
}

/** S8 — option-for-option surface of the reference's ES connector write
  * (`index_to_elastic_with_spark.py:139-150`). The connector jar
  * (`elasticsearch-spark-30`) is not shipped in this offline environment;
  * [[write]] raises a clear error unless it is on the classpath, but the
  * options map is the tested contract either way. */
final case class ElasticsearchSink(nodes: String, port: Int, user: String,
                                   password: String, index: String,
                                   mappingId: String = "id_concat",
                                   wanOnly: Boolean = true,
                                   autoCreate: Boolean = false) extends Sink {
  val format = "org.elasticsearch.spark.sql"

  def options: Map[String, String] = Map(
    "es.nodes" -> nodes,
    "es.port" -> port.toString,
    "es.net.http.auth.user" -> user,
    "es.net.http.auth.pass" -> password,
    "es.nodes.wan.only" -> wanOnly.toString,
    "es.resource" -> index,
    "es.mapping.id" -> mappingId,
    "es.index.auto.create" -> autoCreate.toString)

  def connectorAvailable: Boolean =
    scala.util.Try(Class.forName(s"$format.DefaultSource15")).isSuccess ||
      scala.util.Try(Class.forName(s"$format.DefaultSource")).isSuccess

  def write(df: DataFrame): Unit = {
    if (!connectorAvailable)
      throw new IllegalStateException(
        s"elasticsearch-spark connector not on classpath; cannot write " +
          s"index '$index' (offline environment — use ParquetSink)")
    df.write.format(format).options(options).mode(SaveMode.Overwrite).save()
  }

  def verifiedCount(spark: SparkSession): Option[Long] =
    if (!connectorAvailable) None
    else Some(spark.read.format(format).options(options).load(index).count())
}

object Serving {

  /** F5/F7/P3 — serving projection: identity key, GeoJSON-ordered
    * `[lon, lat]` location array, raw geo columns dropped
    * (`index_to_elastic_with_spark.py:133-136`). */
  def prepare(enriched: DataFrame): DataFrame =
    enriched
      .withColumn("id_concat",
        concat(col("id"), lit("_"), col("time").cast("string")))
      .withColumn("location", array(col("lon"), col("lat")))
      .drop("lat", "lon")

  /** S9 — immediate-subdirectory listing via the Hadoop FS API (the
    * reference lists with a boto3 `Delimiter="/"` call,
    * `index_to_elastic_with_spark.py:16-38`). */
  def listSubfolders(spark: SparkSession, dir: String): Seq[String] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).filter(_.isDirectory)
      .map(_.getPath.toString).sorted.toSeq
  }

  /** The reference's pick-first semantics ("there is only one"), kept
    * faithfully but with a warning when the assumption is violated. */
  def pickFirst(subfolders: Seq[String], prefix: String): String = {
    if (subfolders.isEmpty)
      throw new IllegalStateException(s"No subfolders found in $prefix")
    if (subfolders.length > 1)
      System.err.println(s"[serving] WARNING: ${subfolders.length} " +
        s"subfolders under $prefix; picking first (${subfolders.head})")
    subfolders.head
  }

  /** The full serving job: discover the enriched drop (S9), read it with
    * the declared schema (S6), project to serving shape, write through the
    * sink (S8), verify the count (S11). Returns the verified count. */
  def indexJob(spark: SparkSession, lakeRoot: String, sink: Sink): Option[Long] = {
    val prefix = s"$lakeRoot/${graft.enriched.Enriched.EnrichedVelibLime}"
    val folder = pickFirst(listSubfolders(spark, prefix), prefix)
    val enriched = spark.read.schema(graft.bike.BikeSchemas.enriched)
      .parquet(folder)
    sink.write(prepare(enriched))
    val n = sink.verifiedCount(spark)
    n.foreach(c => println(s"[serving] total documents indexed: $c"))
    n
  }
}

/** S10 — debug parquet reader CLI (the reference's pandas inspection
  * script, `/root/reference/test/lire_donnees_parquet.py`). */
object DebugReader {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: DebugReader <parquet path>")
    val spark = graft.core.GraftSession.local(appName = "graft-debug-reader")
    val df = spark.read.parquet(args(0))
    df.printSchema()
    df.show(10, truncate = false)
    println(s"rows: ${df.count()}")
    spark.stop()
  }
}
