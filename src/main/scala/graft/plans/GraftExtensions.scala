package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** Engine extension point (`spark.sql.extensions` /
  * `SparkSession.builder.withExtensions`): registers the engine's native
  * Catalyst functions so they're first-class in both the Column API and
  * SQL. Also surfaces Spark's internal bloom-filter expressions (used by
  * AQE's runtime filters but absent from the public registry) — the
  * building blocks of [[graft.operators.BloomJoin]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction(CosineSimilarity.registration)
    extensions.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(child) => new BloomFilterAggregate(child)
        case Seq(child, items) => new BloomFilterAggregate(child, items)
        case Seq(child, items, bits) =>
          new BloomFilterAggregate(child, items, bits)
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg(child[, estimatedItems[, numBits]])")
      }))
    extensions.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "might_contain"),
      (exprs: Seq[Expression]) =>
        BloomFilterMightContain(exprs.head, exprs(1))))
  }
}
