package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-exact aggregation helpers.
  *
  * Summing doubles is order-dependent, and shuffle order differs between
  * engines (and between runs at scale), so a plain `sum(double)` is not
  * reproducible against an oracle — or against a re-run of the same job on a
  * different partitioning. These helpers round each input to a decimal of
  * fixed scale (a deterministic per-row operation) and sum in exact decimal
  * arithmetic, which is associative and therefore partitioning-independent.
  * The final cast back to double is a single correctly-rounded conversion.
  *
  * This matters at 100 TB: a metric that changes when AQE re-partitions a
  * shuffle is a broken metric.
  */
object exact {
  /** Exact sum of a money-like double column (2 decimal places). */
  def moneySum(c: Column): Column = decSum(c, 2)

  /** Exact sum after rounding each value to `scale` decimal places. */
  def decSum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(27, scale))).cast(DoubleType)

  /** Exact mean: decimal sum / count, one deterministic double division. */
  def decAvg(c: Column, scale: Int): Column =
    (sum(c.cast(DecimalType(27, scale))).cast(DoubleType) /
      count(c).cast(DoubleType))

  /** DuckDB spelling of [[decSum]] for oracle SQL. */
  def decSumSql(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(27,$scale))) AS DOUBLE)"

  /** DuckDB spelling of [[decAvg]]. */
  def decAvgSql(expr: String, scale: Int): String =
    s"(CAST(SUM(CAST($expr AS DECIMAL(27,$scale))) AS DOUBLE) / CAST(COUNT($expr) AS DOUBLE))"
}
