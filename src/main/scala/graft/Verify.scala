package graft
import java.nio.file.{Files, Paths}
import graft.core.GraftSession
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Exits non-zero if
  * any query fails so breakage is never silent. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.local(appName = "graft-verify")
    new java.io.File(outDir).mkdirs()
    // Announce the output dir so self-diagnosing gate rows (mv1) can
    // drop their evidence sidecars next to the gate parquet.
    spark.conf.set("spark.graft.verify.outDir", outDir)
    // SPARK_GRAFT_VERIFY_ONLY=<name,name,...> restricts the run to a
    // subset — the stress/debug path (fresh-JVM repros of one query's
    // neighborhood without paying the full 118-query pass). Unset in
    // the driver's run: all queries, unchanged behavior.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case None => SparkEntry.queries.toSeq
      case Some(names) =>
        val unknown = names -- SparkEntry.queries.keySet
        require(unknown.isEmpty,
          s"SPARK_GRAFT_VERIFY_ONLY names unknown queries: " +
            unknown.mkString(", "))
        SparkEntry.queries.filter(kv => names(kv._1)).toSeq
    }
    val failed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // 4 queries in flight: Spark's scheduler interleaves their jobs, so
    // the wall time is bounded by the slowest chain instead of the sum.
    // Each query writes its own directory — no shared mutable state.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = selected.map { case (name, fn) =>
      scala.concurrent.Future {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          failed.add(name)
          System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        } finally graft.core.TransientCache.drain()
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (!failed.isEmpty) {
      val names = failed.toArray(Array.empty[String]).sorted
      System.err.println(s"[verify] ${names.length} queries failed: " +
        names.mkString(", "))
      sys.exit(1)
    }
  }
}
