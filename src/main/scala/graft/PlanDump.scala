package graft

/** Plan-pinning utility: prints the EXECUTED physical plan of named
  * `SparkEntry.queries` entries over a testdata dir — what PLANS.md
  * entries are captured from (`runMain graft.PlanDump
  * /root/testdata/sf0.001 ic19_v3_defaults …`). Not part of the
  * driver contract; local evidence tooling only.
  *
  * With `--out <dir>` as the second arg, each named query is
  * EXECUTED through the noop sink and two artifacts land per query:
  * `<dir>/<name>.txt` — `explain("formatted")` (the optimization
  * round's plan evidence: Exchange count, join strategy,
  * PushedFilters/ReadSchema, codegen spans) — followed by the
  * AQE-final executed plan (`executedPlan` AFTER the action, so
  * runtime join rewrites and coalesced reads are visible). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(appName = "graft-plan")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val (outDir, names) = args.drop(1) match {
      case Array("--out") => sys.error("--out requires a directory")
      case Array("--out", dir, rest @ _*) => (Some(dir), rest)
      case rest => (None, rest.toSeq)
    }
    outDir.foreach(o => new java.io.File(o).mkdirs())
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      outDir match {
        case None =>
          println(s"===== $name =====")
          println(df.queryExecution.executedPlan.toString)
        case Some(o) =>
          val formatted = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          // Execute the dataset's OWN QueryExecution: a noop write
          // runs a separate QueryExecution built by DataFrameWriter,
          // leaving df.queryExecution.executedPlan unexecuted
          // (isFinalPlan=false, no AQE rewrites visible).
          df.queryExecution.toRdd.foreach(_ => ())
          val fin = df.queryExecution.executedPlan.toString
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$o/$name.txt"),
            s"===== $name: explain(formatted) =====\n$formatted\n" +
              s"===== $name: AQE-final executedPlan =====\n$fin\n")
          println(s"[plandump] wrote $o/$name.txt")
      }
      graft.core.TransientCache.drain()
    }
    spark.stop()
  }
}
