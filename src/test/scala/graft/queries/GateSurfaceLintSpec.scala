package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** The permanent guard against the driver-hasher precision artifact
  * class that cost two rounds (mv1: DECIMAL surface in r9; fn1:
  * DuckDB HUGEINT sum in r10). The driver's compare converts both
  * sides to pandas and hashes; two conversions are lossy and must
  * never appear on the gate surface:
  *
  *   1. a DECIMAL output column (decimal128 → float64 truncates), and
  *   2. a DuckDB integer `sum()` whose value exceeds 2^53 — DuckDB
  *      widens `sum(BIGINT)` to HUGEINT, and HUGEINT → float64 loses
  *      ulps above 2^53 even though the engine-side int64 is exact.
  *
  * This spec RUNS every gate query at sf0.001 and lints both: no
  * decimal anywhere in any output schema, and every LongType column
  * big enough to clear 2^53 at gate SF (observed max |value| × 32 —
  * 10× to the sf0.01 gate plus margin) that the oracle derives via a
  * `sum(...) AS col` must carry an explicit `AS BIGINT` cast on that
  * line, pinning the oracle to int64. */
class GateSurfaceLintSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val TwoPow53 = 9007199254740992L // 2^53
  private val Headroom = 32L

  private def hasDecimal(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
    case a: ArrayType => hasDecimal(a.elementType)
    case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
    case _ => false
  }

  test("gate surface lint: no decimal output columns, and every " +
    "2^53-capable integer sum is BIGINT-cast in its oracle") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df =
        try fn(spark, sf)
        catch { case e: Throwable =>
          fail(s"$name failed to build at sf0.001: ${e.getMessage}")
        }
      // lint 1: decimal anywhere in the schema is a hash hazard
      df.schema.fields.filter(f => hasDecimal(f.dataType)).foreach(f =>
        offenders += s"$name.${f.name}: DECIMAL-typed gate column " +
          s"(${f.dataType.sql}) — cast the surface to DOUBLE or BIGINT")
      // lint 2: huge integer sums must be BIGINT-cast in the oracle
      val longCols = df.schema.fields.collect {
        case f if f.dataType == LongType => f.name
      }
      if (longCols.nonEmpty && SparkEntry.oracleSql.contains(name)) {
        val maxRow = df.agg(
          max(abs(col(longCols.head))).as(longCols.head),
          longCols.tail.map(c => max(abs(col(c))).as(c)): _*
        ).collect().head
        val oracleLines = SparkEntry.oracleSql(name).split('\n')
        longCols.zipWithIndex.foreach { case (c, i) =>
          val observed =
            if (maxRow.isNullAt(i)) 0L else maxRow.getLong(i)
          val canOverflow =
            observed > TwoPow53 / Headroom
          if (canOverflow) {
            // the oracle line aliasing this column: if it SUMs into
            // the alias, it must pin int64 with an explicit cast —
            // DuckDB would otherwise return HUGEINT
            val aliasRe = ("(?i)\\bas\\s+\"?" +
              java.util.regex.Pattern.quote(c) + "\"?\\b").r
            oracleLines.filter(l => aliasRe.findFirstIn(l).nonEmpty)
              .foreach { line =>
                val sums = "(?i)\\bsum\\s*\\(".r.findFirstIn(line).nonEmpty
                val cast = "(?i)as\\s+bigint".r.findFirstIn(line).nonEmpty
                if (sums && !cast)
                  offenders += s"$name.$c: oracle sums an integer " +
                    s"surface observed at $observed (≥ 2^53/$Headroom) " +
                    s"without CAST(... AS BIGINT) — DuckDB HUGEINT " +
                    s"loses precision in the driver hash. Line: $line"
              }
          }
        }
      }
      graft.core.TransientCache.drain()
    }
    withClue(offenders.mkString("\n")) { offenders shouldBe empty }
  }
}
