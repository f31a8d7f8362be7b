package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Operator-semantics suites promised by the ScalarOps doc comments:
  * the two-step timestamp dance vs the single-step `timestamp_seconds`,
  * both null-swallowing boolean-coercion flavors, and E1 cast parity. */
class ScalarOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("timestamp dance (from_unixtime→to_timestamp) == timestamp_seconds " +
    "under pinned UTC") {
    import spark.implicits._
    val epochs = Seq(0L, 1L, 1739999990L, 1740000000L, 2147483647L,
      4102444800L) // 2100-01-01
    val df = epochs.toDF("epoch_s")
      .withColumn("danced", to_timestamp(from_unixtime($"epoch_s")))
      .withColumn("direct", timestamp_seconds($"epoch_s"))
    df.filter($"danced" =!= $"direct").count() shouldBe 0
    // and the dance truncates to whole seconds by construction
    df.select(unix_micros($"danced")).as[Long].collect() shouldBe
      epochs.map(_ * 1000000L)
  }

  test("when(col === 1).otherwise(false) swallows null → false (int flavor)") {
    import spark.implicits._
    val df = Seq(Some(1L), Some(0L), None).toDF("flag")
      .withColumn("b", when($"flag" === 1, true).otherwise(false))
    df.select($"b").as[Boolean].collect().toSeq shouldBe
      Seq(true, false, false)
    // contrast: a plain cast would preserve the null — the reference's
    // otherwise-branch is deliberately lossy and we keep it that way
    df.withColumn("cast_b", $"flag".cast("boolean"))
      .filter($"cast_b".isNull).count() shouldBe 1
  }

  test("when(col === \"true\").otherwise(false) swallows null → false " +
    "(string flavor)") {
    import spark.implicits._
    val df = Seq(Some("true"), Some("false"), Some("TRUE"), None).toDF("flag")
      .withColumn("b", when($"flag" === "true", true).otherwise(false))
    // case-sensitive compare: "TRUE" → false, exactly like the reference
    df.select($"b").as[Boolean].collect().toSeq shouldBe
      Seq(true, false, false, false)
  }

  test("E1 cast projection narrows Long→Int and Double→Float with the " +
    "declared names") {
    import spark.implicits._
    val df = Seq((42L, 48.865983, "x")).toDF("a", "b", "c")
    val out = graft.bike.Transforms.enforceSchema(df,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a2",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("b2",
          org.apache.spark.sql.types.FloatType),
        org.apache.spark.sql.types.StructField("c2",
          org.apache.spark.sql.types.StringType))))
    out.columns.toSeq shouldBe Seq("a2", "b2", "c2")
    val row = out.collect().head
    row.getInt(0) shouldBe 42
    row.getFloat(1) shouldBe 48.865983f
  }
}
