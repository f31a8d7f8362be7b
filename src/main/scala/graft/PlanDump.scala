package graft

import graft.core.GraftSession

/** Plan-audit helper: print the EXECUTED physical plan of named gate
  * queries (all of them with no names given) against a dataset dir —
  * the source for PLANS.md's pinned plans. Each query runs through a
  * noop sink first so AQE's final plan (the one a cluster actually
  * executes) is what prints, not the pre-runtime guess. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <sfDir> [queryName...]")
    val sfDir = args.head
    val names =
      if (args.length > 1) args.tail.toSeq
      else SparkEntry.queries.keySet.toSeq.sorted
    val spark = GraftSession.local(appName = "graft-plandump")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(s"## $n")
      println(df.queryExecution.executedPlan.toString)
      graft.core.TransientCache.drain()
    }
    spark.stop()
  }
}
