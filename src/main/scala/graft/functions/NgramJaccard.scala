package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native exact n-gram Jaccard between two texts: tokenize, hash-shingle
  * and intersect in one JVM call — no intermediate shingle-string arrays
  * to build, ship, or persist. Pairs with [[MinHashSignature]] (same
  * shingle hashing) as the verify kernel of the MinHash-LSH chain.
  *
  * Exact up to 64-bit shingle-hash collisions (~2⁻⁶⁴ per pair —
  * irrelevant against thresholds like 0.5).
  */
case class NgramJaccard(left: Expression, right: Expression,
                        shingleWidth: Int)
  extends BinaryExpression with CodegenFallback {

  require(shingleWidth > 0)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "ngram_jaccard"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two string arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = ShingleHashing.shingleSet(
      a.asInstanceOf[UTF8String].toString, shingleWidth)
    val sb = ShingleHashing.shingleSet(
      b.asInstanceOf[UTF8String].toString, shingleWidth)
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.count(sb.contains)
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramJaccard =
    copy(left = newLeft, right = newRight)
}

object NgramJaccard {
  def apply(a: Column, b: Column, shingleWidth: Int): Column =
    ColumnBridge.column(NgramJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b), shingleWidth))
}

/** Native n-gram CONTAINMENT |A∩B| / |A| — the asymmetric companion of
  * [[NgramJaccard]]: how much of the LEFT document's shingle set appears
  * in the right one. Jaccard misses subset duplication (a paragraph
  * quoted inside a much larger doc scores near 0 on |∩|/|∪| but 1.0
  * here), which is the dominant dup shape in scraped training corpora —
  * boilerplate-wrapped bodies, quoted articles, concatenated shards.
  * Same shingle hashing, same one-JVM-pass cost model as the Jaccard
  * kernel. A is never empty ([[ShingleHashing.shingleSet]] emits at
  * least one shingle), so the ratio is always defined. */
case class NgramContainment(left: Expression, right: Expression,
                            shingleWidth: Int)
  extends BinaryExpression with CodegenFallback {

  require(shingleWidth > 0)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "ngram_containment"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two string arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = ShingleHashing.shingleSet(
      a.asInstanceOf[UTF8String].toString, shingleWidth)
    val sb = ShingleHashing.shingleSet(
      b.asInstanceOf[UTF8String].toString, shingleWidth)
    sa.count(sb.contains).toDouble / sa.size
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramContainment =
    copy(left = newLeft, right = newRight)
}

object NgramContainment {
  def apply(a: Column, b: Column, shingleWidth: Int): Column =
    ColumnBridge.column(NgramContainment(
      ColumnBridge.expression(a), ColumnBridge.expression(b), shingleWidth))
}

/** The distinct shingle-hash SET of one document as `array<long>` — the
  * one-pass JVM kernel behind set-at-a-time shingle operations
  * (decontamination's explode → semi-join). Building shingle STRINGS
  * declaratively (transform + slice + concat_ws) is the interpreted-HOF
  * trap: measured 10.9 s vs ~1 s at sf0.1 for the decontamination
  * sweep. Same hashing as [[NgramJaccard]]/[[MinHashSignature]], so
  * set operations across the kernels compose; exact up to 64-bit
  * collisions (~2⁻⁶⁴ per pair). Element order is unspecified (a set). */
case class ShingleHashes(child: Expression, shingleWidth: Int)
  extends UnaryExpression with CodegenFallback {

  require(shingleWidth > 0)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any = {
    val set = ShingleHashing.shingleSet(
      t.asInstanceOf[UTF8String].toString, shingleWidth)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(set.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)
}

object ShingleHashes {
  def apply(c: Column, shingleWidth: Int): Column =
    ColumnBridge.column(ShingleHashes(
      ColumnBridge.expression(c), shingleWidth))
}
