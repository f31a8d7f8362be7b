package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins [[Tables.normalizeEventTs]] across every storage shape the driver's
  * testdata generator has shipped for `events.ts` — INT64 TIMESTAMP(NANOS)
  * (reads as a raw nanos Long under `nanosAsLong`) and TIMESTAMP(MICROS)
  * (reads as TIMESTAMP_NTZ) — so a regeneration flipping the physical type
  * between rounds can never silently change query results again: all shapes
  * must normalize to the SAME session-zoned instant. */
class TablesSpec extends AnyFunSuite with Matchers with SparkSpec {

  // One instant, three storage shapes. 2024-01-10T06:30:15.123456Z.
  private val wall = java.time.LocalDateTime.parse("2024-01-10T06:30:15.123456")
  private val micros = wall.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
    wall.getNano / 1000L

  private def normalizedMicros(df: org.apache.spark.sql.DataFrame): Long = {
    val out = Tables.normalizeEventTs(df)
    out.schema("ts").dataType shouldBe TimestampType
    out.select(unix_micros(col("ts"))).head().getLong(0)
  }

  test("nanos-Long generation normalizes to the UTC instant") {
    import spark.implicits._
    normalizedMicros(Seq(micros * 1000L).toDF("ts")) shouldBe micros
  }

  test("TIMESTAMP_NTZ generation normalizes to the same UTC instant") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(wall)),
      StructType(Seq(StructField("ts", TimestampNTZType))))
    normalizedMicros(df) shouldBe micros
  }

  test("already-TimestampType columns pass through unchanged") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(java.sql.Timestamp.from(
        wall.toInstant(java.time.ZoneOffset.UTC)))),
      StructType(Seq(StructField("ts", TimestampType))))
    normalizedMicros(df) shouldBe micros
  }

  test("an unsupported ts type is a named error, not silent misreads") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Tables.normalizeEventTs(Seq("2024-01-10").toDF("ts"))
    }
    e.getMessage should include("unsupported type")
  }
}
