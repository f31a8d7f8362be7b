package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.CosineSimilarity

/** Engine extension point (`spark.sql.extensions` /
  * `SparkSession.builder.withExtensions`): registers the engine's native
  * Catalyst functions so they're first-class in both the Column API and
  * SQL. Add future custom expressions / rules / strategies here. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction(CosineSimilarity.registration)
  }
}
