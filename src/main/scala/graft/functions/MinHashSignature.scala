package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: text → H-element `array<long>` in ONE pass.
  *
  * The declarative chain (split → transform/slice/concat_ws shingles →
  * array_distinct → fold of H hashes) runs interpreted and materializes
  * every shingle as a string; profiling showed it dominating dd2. This
  * expression tokenizes on whitespace, hashes each word n-gram directly
  * from the token-hash window (no string construction), dedups via a
  * hash set, and derives the H "permutations" from two base hashes
  * (h_i = h1 + i·h2 — the standard two-hash MinHash construction), all
  * in a single tight JVM loop.
  *
  * Signature VALUES differ from the declarative form (different hash
  * family) — Jaccard-estimation quality is what's contracted, and both
  * feed the same exact-Jaccard verification downstream.
  */
case class MinHashSignature(child: Expression, shingleWidth: Int,
                            numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  require(shingleWidth > 0 && numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val seen = mutable.HashSet.empty[Long]
    ShingleHashing.forEachShingle(input.asInstanceOf[UTF8String].toString,
      shingleWidth) { (h1, h2) =>
      if (seen.add(h1)) {
        var k = 0
        while (k < numHashes) {
          val hk = h1 + k.toLong * h2
          if (hk < sig(k)) sig(k) = hk
          k += 1
        }
      }
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(text: Column, shingleWidth: Int, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(text), shingleWidth, numHashes))
}

/** Shared tokenize-and-shingle-hash routine for the native text
  * expressions: whitespace tokens → xxhash64 per token → order-sensitive
  * (h1, h2) mix per n-gram window. Short documents (< width tokens)
  * contribute their full token sequence as one shingle. */
private[graft] object ShingleHashing {

  /** The ONE tokenizer all native text kernels share: non-empty
    * whitespace-separated tokens, each xxhash64'd (seed 42) from its
    * UTF-8 bytes. [[SimHash64]] and [[forEachShingle]] both consume it,
    * so their tokenizations are identical by construction. */
  def forEachTokenHash(text: String)(f: Long => Unit): Unit = {
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) {
        val bytes = text.substring(start, i).getBytes("UTF-8")
        f(XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          bytes.length, 42L))
      }
    }
  }

  def forEachShingle(text: String, width: Int)(f: (Long, Long) => Unit): Unit = {
    val tokenHashes = mutable.ArrayBuffer.empty[Long]
    forEachTokenHash(text)(tokenHashes += _)
    val nShingles = math.max(tokenHashes.length - width + 1, 1)
    var s = 0
    while (s < nShingles) {
      var h1 = 0x9e3779b97f4a7c15L
      var h2 = 0xc2b2ae3d27d4eb4fL
      var w = 0
      val end = math.min(s + width, tokenHashes.length)
      while (s + w < end) {
        val t = tokenHashes(s + w)
        h1 = java.lang.Long.rotateLeft(h1 ^ t, 27) * 0x9e3779b97f4a7c15L
        h2 = java.lang.Long.rotateLeft(h2 + t, 31) * 0xc2b2ae3d27d4eb4fL
        w += 1
      }
      f(h1, h2)
      s += 1
    }
  }

  /** Distinct shingle base-hash set of a document. */
  def shingleSet(text: String, width: Int): mutable.HashSet[Long] = {
    val set = mutable.HashSet.empty[Long]
    forEachShingle(text, width)((h1, _) => set.add(h1))
    set
  }
}
