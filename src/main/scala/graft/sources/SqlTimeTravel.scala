package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types.TimestampType

/** The shared `TIMESTAMP AS OF` argument evaluator for both SQL
  * dialects: the parser hands `RelationTimeTravel` a literal
  * expression (a timestamp/date/string), which folds through a
  * session-zone Cast to epoch milliseconds — exactly how Spark's own
  * time-travel resolution evaluates it. Non-foldable or unparseable
  * arguments refuse by name. */
object SqlTimeTravel {

  def tsMillisOf(spark: SparkSession, e: Expression): Long = {
    require(e.foldable,
      s"TIMESTAMP AS OF requires a literal timestamp, got ${e.sql}")
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    val micros = Cast(e, TimestampType, Some(zone)).eval(null)
    require(micros != null,
      s"cannot parse ${e.sql} as a timestamp")
    Math.floorDiv(micros.asInstanceOf[Long], 1000L)
  }
}
