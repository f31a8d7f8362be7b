package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.Tables

/** Bucketing = pre-shuffling at write time: two tables bucketed the same
  * way on the join key join WITHOUT a shuffle exchange — at 100 TB this
  * turns every recurring fact⋈fact join on the same key into a local
  * zip of bucket files. Verified here by plan shape: the bucketed join
  * has no ShuffleExchange on either side, the plain-parquet join has
  * them on both.
  */
class BucketedJoinSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("same-bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bucket_test LOCATION '$wh'")
    try {
      Tables.orders(spark, sf)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("graft_bucket_test.orders_b")
      Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_quantity"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("graft_bucket_test.lineitem_b")

      // force SMJ (hint on a join INPUT) so exchange behavior is visible
      val smj = spark.table("graft_bucket_test.lineitem_b").hint("merge")
        .join(spark.table("graft_bucket_test.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = smj.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      // the join inputs are bucket-scanned: no shuffle before the join
      (plan.split("SortMergeJoin")(1).take(2000) should not)
        .include("Exchange hashpartitioning")

      // contrast: the same join over plain parquet shuffles both sides
      val plainPlan = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_quantity")).hint("merge")
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      plainPlan should include("Exchange hashpartitioning")

      // and the result is right
      smj.agg(sum(col("n"))).collect().head.getLong(0) shouldBe
        Tables.lineitem(spark, sf).count()
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_bucket_test CASCADE")
    }
  }
}
