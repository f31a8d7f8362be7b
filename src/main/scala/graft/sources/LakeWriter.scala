package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned lake writes — the SURVEY §1.1 alternative to
  * the reference's computed `<date>/<time>/` paths: `partitionBy` makes
  * the layout self-describing (`date=YYYYMMDD/time=HHMMSS/`), so reads
  * with date/time predicates prune whole directories (PartitionFilters)
  * instead of listing and scanning every drop — the difference between
  * O(day) and O(lake) scans at 100 TB.
  */
object LakeWriter {

  /** Write `df` partitioned by `partitionCols` (must exist as columns). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Stamp the reference's drop identifiers as partition columns. */
  def withDropPartition(df: DataFrame, date: String, time: String): DataFrame =
    df.withColumn("date", lit(date)).withColumn("time", lit(time))

  /** Read one drop with partition pruning (predicates on partition
    * columns never touch file contents). */
  def readDrop(spark: SparkSession, path: String, date: String,
               time: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("date") === date && col("time") === time)

  /** Range-clustered write: `repartitionByRange` + `sortWithinPartitions`
    * on the cluster column, so every output file (and every row group
    * inside it) covers a narrow, pairwise-disjoint value range. Parquet
    * footer min/max stats then let a range predicate skip whole row
    * groups and files. This is the data-skipping lever for columns too
    * high-cardinality to partition by (timestamps, ids): at 100 TB it is
    * the difference between scanning the lake and scanning the slice.
    * One range shuffle at write time, amortized over every future read. */
  def writeClustered(df: DataFrame, path: String, clusterCol: String,
                     nFiles: Int,
                     mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartitionByRange(nFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode(mode).parquet(path)
}
