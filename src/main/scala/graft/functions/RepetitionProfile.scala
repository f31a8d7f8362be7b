package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Within-document repetition profile — the Gopher-style repetition
  * signals (Rae et al. 2021, "Scaling Language Models", table A1) that
  * pretraining curation keys on: machine-generated and boilerplate-heavy
  * pages repeat themselves, and repetition is the cheapest strong
  * predictor of low-quality text. One pass over the document in a single
  * JVM call (the declarative alternative — split → explode → three
  * grouped self-aggregations per doc — shuffles the corpus three times;
  * this is a narrow map, the only shape that survives a 100 TB scan).
  *
  * All outputs are exact integer COUNTS, not fractions: counts
  * hash-compare exactly against an independent re-derivation, and every
  * Gopher fraction threshold is an integer comparison away
  * (`dup_lines/n_lines > 0.3` ⇔ `dup_lines*10 > n_lines*3`). Semantics,
  * chosen to be independently re-derivable:
  *  - lines = non-empty segments of a `\n` split; `n_lines` counts them,
  *    `dup_lines` counts occurrences beyond each value's first
  *    (Σ cnt−1), `line_chars` / `dup_line_chars` weight by codepoint
  *    length (duplicated = every occurrence of a value seen more than
  *    once, the Gopher "fraction of characters in duplicated lines").
  *  - words = non-empty segments of a `\s+` split; `n_bigrams` /
  *    `top_bigram` cover the top-n-gram family (most frequent word
  *    bigram's occurrence count), `n_5grams` / `dup_5grams` the
  *    duplicated-n-gram family (word 5-grams occurring more than once).
  * Lengths count Unicode codepoints (what SQL `length()` means), not
  * UTF-16 units.
  */
case class RepetitionProfile(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = RepetitionProfile.schema

  override def prettyName: String = "repetition_profile"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")

  private def codepoints(s: String): Long =
    s.codePointCount(0, s.length).toLong

  // RE2's \s -- [\t\n\f\r ] -- NOT Java's, which adds vertical tab:
  // the oracle re-derivation tokenizes with RE2 (DuckDB), and a
  // divergent separator set would split words differently on documents
  // containing a VT
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  override def nullSafeEval(t: Any): Any = {
    val text = t.asInstanceOf[UTF8String].toString
    val n = text.length

    // line family: one scan, counts keyed by exact line content
    val lineCounts = new java.util.HashMap[String, Int]()
    var nLines = 0L
    var lineChars = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == '\n') {
        if (i > start) {
          val line = text.substring(start, i)
          nLines += 1
          lineChars += codepoints(line)
          lineCounts.merge(line, 1, Integer.sum(_, _))
        }
        start = i + 1
      }
      i += 1
    }
    var dupLines = 0L
    var dupLineChars = 0L
    lineCounts.forEach { (line, cnt) =>
      if (cnt > 1) {
        dupLines += cnt - 1
        dupLineChars += codepoints(line) * cnt
      }
    }

    // word n-gram families: tokenize once, slide both widths
    val words = new java.util.ArrayList[String]()
    i = 0
    start = -1
    while (i <= n) {
      if (i == n || isWs(text.charAt(i))) {
        if (start >= 0) { words.add(text.substring(start, i)); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    val w = words.size
    def gramCounts(width: Int): java.util.HashMap[String, Int] = {
      val m = new java.util.HashMap[String, Int]()
      var j = 0
      while (j + width <= w) {
        val sb = new java.lang.StringBuilder(words.get(j))
        var k = 1
        while (k < width) { sb.append(' ').append(words.get(j + k)); k += 1 }
        m.merge(sb.toString, 1, Integer.sum(_, _)): Unit
        j += 1
      }
      m
    }
    val nBigrams = math.max(0, w - 1).toLong
    var topBigram = 0L
    gramCounts(2).forEach { (_, cnt) =>
      if (cnt > topBigram) topBigram = cnt.toLong
    }
    val n5grams = math.max(0, w - 4).toLong
    var dup5grams = 0L
    gramCounts(5).forEach { (_, cnt) =>
      if (cnt > 1) dup5grams += cnt - 1
    }

    val out = new GenericInternalRow(8)
    out.update(0, nLines)
    out.update(1, dupLines)
    out.update(2, lineChars)
    out.update(3, dupLineChars)
    out.update(4, nBigrams)
    out.update(5, topBigram)
    out.update(6, n5grams)
    out.update(7, dup5grams)
    out.asInstanceOf[InternalRow]
  }

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionProfile = copy(child = newChild)
}

object RepetitionProfile {

  /** Output shape: every field a BIGINT count (see class doc). */
  val schema: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("dup_lines", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false),
    StructField("n_5grams", LongType, nullable = false),
    StructField("dup_5grams", LongType, nullable = false)))

  def apply(c: Column): Column =
    ColumnBridge.column(RepetitionProfile(ColumnBridge.expression(c)))
}
