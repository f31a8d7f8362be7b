package graft

import org.apache.spark.sql.SparkSession
import graft.core.GraftSession

/** Shared local session for suites. One forked test JVM (build.sbt
  * `Test/fork := true`) ⇒ one session across all suites. */
trait SparkSpec {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, appName = "graft-test")
}
