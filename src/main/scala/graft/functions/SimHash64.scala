package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash: per whitespace token, the token hash votes ±1
  * on each of 64 bit positions; the sign of each accumulated position
  * becomes the fingerprint bit. One JVM pass per document — replaces the
  * interpreted 64-wide array fold (same algorithm, same vote rule;
  * fingerprint VALUES differ only through the hash seed).
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val votes = new Array[Int](64)
    // tokenization shared with the shingle kernels — identical by
    // construction, not by coincidence
    ShingleHashing.forEachTokenHash(text) { h =>
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
}
