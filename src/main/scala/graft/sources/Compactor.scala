package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet lake directories.
  *
  * Streaming appends and per-drop batch writes (one GBFS drop every 3 h ×
  * feeds × years) accumulate thousands of tiny files; at scale, listing
  * and footer-opening dominate scan time long before row decoding does.
  * Compaction rewrites a directory to ~`targetFileBytes` files and swaps
  * it in atomically-enough for a single-writer lake (write to sibling tmp
  * dir → delete original → rename).
  */
object Compactor {

  final case class Report(filesBefore: Int, filesAfter: Int, bytes: Long)

  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Report = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val bytes = dataFiles.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)

    val tmp = new Path(path.getParent, path.getName + "__compacting")
    // repartition (not coalesce): coalesce would chain the upstream scan
    // parallelism to nFiles; repartition keeps the read wide and only
    // the write narrow
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)

    fs.delete(path, true)
    fs.rename(tmp, path)
    val after = fs.listStatus(path)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    Report(dataFiles.length, after, bytes)
  }
}
