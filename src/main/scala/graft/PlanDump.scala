package graft

/** Plan-pinning utility: prints the EXECUTED physical plan of named
  * `SparkEntry.queries` entries over a testdata dir — what PLANS.md
  * entries are captured from (`runMain graft.PlanDump
  * /root/testdata/sf0.001 ic19_v3_defaults …`). Not part of the
  * driver contract; local evidence tooling only. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(appName = "graft-plan")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    args.drop(1).foreach { name =>
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, d)
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
