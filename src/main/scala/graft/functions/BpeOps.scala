package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for BPE tokenizer training/encoding
  * ([[graft.text.Bpe]]): array-of-symbol rewriting is a per-row JVM
  * scan, not an exploded shuffle — the per-iteration cost of training
  * is ONE pair-count aggregate plus this narrow projection. */

/** Replace every left-to-right non-overlapping adjacent occurrence of
  * `(left, right)` in a symbol array with the merged symbol — one BPE
  * merge step applied to one word. NULL symbols inside the array are
  * not expected (the trainer builds arrays from substring) and compare
  * unequal to everything, passing through unchanged. */
case class BpeMergePair(child: Expression, left: String, right: String)
  extends UnaryExpression with CodegenFallback {

  private val leftU = UTF8String.fromString(left)
  private val rightU = UTF8String.fromString(right)
  private val mergedU = UTF8String.fromString(left + right)

  override def dataType: DataType = ArrayType(StringType)

  override def prettyName: String = "bpe_merge_pair"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (i + 1 < n && s != null && s.equals(leftU)) {
        val next = arr.getUTF8String(i + 1)
        if (next != null && next.equals(rightU)) {
          out.add(mergedU)
          i += 2
        } else { out.add(s); i += 1 }
      } else { out.add(s); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeMergePair = copy(child = newChild)
}

object BpeMergePair {
  def apply(symbols: Column, left: String, right: String): Column =
    ColumnBridge.column(
      BpeMergePair(ColumnBridge.expression(symbols), left, right))
}

/** Apply a LEARNED merge list (rank order) to a symbol array — the
  * encoding half of BPE: the merges ride the expression as literals
  * (driver-known after training), so encoding a corpus is one narrow
  * projection with no join against a merges table. Each merge scans
  * the current symbol sequence once; words are short, merge lists are
  * bounded, and the whole loop runs inside one JVM call per word. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with CodegenFallback {

  private val leftU = merges.map(m => UTF8String.fromString(m._1)).toArray
  private val rightU = merges.map(m => UTF8String.fromString(m._2)).toArray
  private val mergedU =
    merges.map(m => UTF8String.fromString(m._1 + m._2)).toArray

  override def dataType: DataType = ArrayType(StringType)

  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var cur = new Array[UTF8String](arr.numElements())
    var i = 0
    while (i < cur.length) { cur(i) = arr.getUTF8String(i); i += 1 }
    var m = 0
    while (m < leftU.length) {
      // skip the rewrite when the pair cannot occur — the common case
      var hit = false
      var j = 0
      while (!hit && j + 1 < cur.length) {
        if (cur(j) != null && cur(j).equals(leftU(m)) &&
          cur(j + 1) != null && cur(j + 1).equals(rightU(m))) hit = true
        j += 1
      }
      if (hit) {
        val out = new java.util.ArrayList[UTF8String](cur.length)
        var k = 0
        while (k < cur.length) {
          if (k + 1 < cur.length && cur(k) != null &&
            cur(k).equals(leftU(m)) && cur(k + 1) != null &&
            cur(k + 1).equals(rightU(m))) {
            out.add(mergedU(m)); k += 2
          } else { out.add(cur(k)); k += 1 }
        }
        cur = out.toArray(new Array[UTF8String](out.size()))
      }
      m += 1
    }
    new GenericArrayData(cur.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncode = copy(child = newChild)
}

object BpeEncode {
  def apply(symbols: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(
      BpeEncode(ColumnBridge.expression(symbols), merges))
}
