package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (the MOSS scheme): polynomial rolling
  * hash over character `k`-grams, then robust winnowing — each sliding
  * window of `window` consecutive hashes contributes its minimum
  * (rightmost on ties), deduplicated — yielding a sparse, position-
  * independent fingerprint set with the winnowing guarantee: any shared
  * substring of at least `window + k - 1` characters produces at least
  * one shared fingerprint.
  *
  * Native one-pass expression: the rolling hash reuses the previous
  * window's value (subtract the outgoing char's contribution, shift,
  * add the incoming), and the window minimum is maintained with a
  * monotonic deque — O(chars) per document, no per-gram string
  * materialization. Output is the sorted distinct fingerprint array.
  */
case class WinnowFingerprint(child: Expression, k: Int, window: Int)
  extends UnaryExpression with CodegenFallback {

  require(k > 0 && window > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = WinnowFingerprint.fingerprints(s, k, window)
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {
  def apply(text: Column, k: Int, window: Int): Column =
    ColumnBridge.column(
      WinnowFingerprint(ColumnBridge.expression(text), k, window))

  private val B = 1000003L

  /** Sorted distinct winnowed fingerprints of `s`. Documents shorter
    * than `k` chars fingerprint as their single whole-string hash. */
  def fingerprints(s: String, k: Int, window: Int): Array[Long] = {
    val n = s.length
    if (n == 0) return Array(0L)
    if (n < k) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * B + s.charAt(i); i += 1 }
      return Array(mix(h))
    }
    // rolling k-gram hashes
    val m = n - k + 1
    var pow = 1L // B^(k-1)
    var j = 1
    while (j < k) { pow *= B; j += 1 }
    val hashes = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hashes(0) = mix(h)
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
      hashes(i) = mix(h)
      i += 1
    }
    if (m <= window) {
      // single window: one fingerprint — the global minimum
      var min = hashes(0)
      i = 1
      while (i < m) { if (hashes(i) < min) min = hashes(i); i += 1 }
      return Array(min)
    }
    // robust winnowing via a monotonic deque of indices (front = window
    // minimum, rightmost among equals)
    val selected = mutable.SortedSet.empty[Long]
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < m) {
      while (!deque.isEmpty && hashes(deque.peekLast) >= hashes(i))
        deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst <= i - window) deque.pollFirst()
      if (i >= window - 1) selected += hashes(deque.peekFirst)
      i += 1
    }
    selected.toArray
  }

  /** splitmix64 finalizer — decorrelates the weak polynomial hash so
    * window minima are uniform. */
  private def mix(x: Long): Long = Mix64.splitmix64(x)
}
