package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native sign-sketch: `array<double>` vector → packed long of
  * `bit p = (v · plane_p) > 0` in ONE JVM pass.
  *
  * The declarative form — `nPlanes` separate interpreted
  * `aggregate(zip_with(...))` folds against literal plane arrays — walks
  * the vector `nPlanes` times through non-codegen lambda machinery;
  * profiling showed it dominating the embedding near-dup chain. This
  * expression computes the same accumulation (ascending-index, strict
  * left-to-right IEEE adds against the same splitmix64-derived plane
  * components) so the sketch is BIT-IDENTICAL to the fold form — pinned
  * in AnnSpec — while touching each element once per plane in a tight
  * loop with no per-row allocation.
  */
case class HyperplaneSketch(child: Expression, nPlanes: Int)
  extends UnaryExpression with CodegenFallback {

  require(nPlanes > 0 && nPlanes <= 63, "sketch packs into a single long")

  override def dataType: DataType = LongType

  override def prettyName: String = "hyperplane_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toDoubleArray()
    var sketch = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var i = 0
      while (i < arr.length) {
        acc += arr(i) * HyperplaneSketch.planeComponent(p, i)
        i += 1
      }
      if (acc > 0) sketch |= (1L << p)
      p += 1
    }
    sketch
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketch =
    copy(child = newChild)
}

object HyperplaneSketch {
  def apply(vec: Column, nPlanes: Int): Column =
    ColumnBridge.column(
      HyperplaneSketch(ColumnBridge.expression(vec), nPlanes))

  /** Component i of pseudo-random plane p, in [-1, 1] — the single
    * source of truth shared with the declarative literal-array form
    * ([[graft.ann.Similarity.planes]] delegates here). */
  def planeComponent(p: Int, i: Int): Double =
    (math.floorMod(Mix64.splitmix64(p * 1000003L + i), 2000001L).toDouble /
      1000000.0) - 1.0
}
