package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for product quantization (PQ) — the
  * vector-compression half of IVF-PQ similarity search (Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * [[PqEncode]] maps an `array<double>` embedding to `m` small codes
  * (one per contiguous subspace), [[PqAdcScore]] turns the codes back
  * into an approximate cosine against one query via a per-query lookup
  * table (asymmetric distance computation). Both are single-pass
  * primitive loops with [[UnaryExpression.doGenCode]], so an encode or
  * ADC projection stays inside whole-stage codegen — same rationale as
  * [[CosineSimilarity]]: the higher-order-function form of these loops
  * would run interpreted.
  *
  * The trained codebook rides IN the expression (a flat `Array[Double]`
  * captured at construction and shipped via `ctx.addReferenceObj` in
  * codegen). That is deliberate: the codebook is m×ksub×dsub doubles
  * (KiBs), fit offline, and a per-query LUT is m×ksub doubles — both
  * are driver-side constants of the plan, exactly like the literal
  * plane arrays of [[HyperplaneSketch]]. No SQL registration: a
  * codebook is runtime data, not a literal a SQL call site could spell.
  *
  * Array-typed members make `equals` reference-based, so two
  * independently constructed encodes never compare equal — that only
  * disables common-subexpression sharing between them, never
  * correctness.
  */
object PqCodec {

  /** Column entry: encode `vec` under a trained codebook.
    * `codewordsFlat((sub*ksub + j)*dsub + t)` = component `t` of
    * codeword `j` of subspace `sub`. */
  def encode(vec: Column, codewordsFlat: Array[Double],
             m: Int, ksub: Int, dsub: Int): Column =
    ColumnBridge.column(PqEncode(
      ColumnBridge.expression(vec.cast("array<double>")),
      codewordsFlat, m, ksub, dsub))

  /** Column entry: approximate cosine of the encoded row against the
    * query whose LUT this is. `lut(sub*ksub + j)` = q̂_sub · codeword. */
  def adcScore(codes: Column, lut: Array[Double], m: Int, ksub: Int): Column =
    ColumnBridge.column(PqAdcScore(
      ColumnBridge.expression(codes), lut, m, ksub))
}

/** `pq_encode(vec)` — nearest codeword per subspace of the L2-NORMALIZED
  * vector, `array<int>` of length `m`.
  *
  * Semantics contract (the spec pins the Scala reference loop):
  *   - the vector is normalized once (zero vectors are used as-is —
  *     their ADC score is then the codeword choice of the all-zero
  *     subvector, deterministic);
  *   - per subspace the winner is `argmax_j (c_j · v̂_sub − ‖c_j‖²/2)`
  *     (equivalent to argmin Euclidean distance), ties to the LOWEST j
  *     by strict `>` — the same tie rule as
  *     [[graft.ann.Similarity.assignCells]];
  *   - vector length must be exactly `m*dsub` (a silent prefix would
  *     encode garbage for trailing subspaces).
  */
case class PqEncode(child: Expression, codewordsFlat: Array[Double],
                    m: Int, ksub: Int, dsub: Int)
  extends UnaryExpression {

  require(codewordsFlat.length == m * ksub * dsub,
    s"codebook length ${codewordsFlat.length} != m*ksub*dsub (${m * ksub * dsub})")

  /** ‖c_j‖²/2 per (sub, j), precomputed once at construction. */
  private val c2Half: Array[Double] = Array.tabulate(m * ksub) { sj =>
    var s = 0.0; var t = 0
    while (t < dsub) { val x = codewordsFlat(sj * dsub + t); s += x * x; t += 1 }
    s / 2.0
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: vector length ${v.numElements()} != m*dsub (${m * dsub})")
    var norm2 = 0.0
    var i = 0
    while (i < m * dsub) { val x = v.getDouble(i); norm2 += x * x; i += 1 }
    val inv = if (norm2 == 0.0) 1.0 else 1.0 / math.sqrt(norm2)
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = Double.NegativeInfinity
      var bestJ = 0
      var j = 0
      while (j < ksub) {
        var dot = 0.0
        var t = 0
        while (t < dsub) {
          dot += v.getDouble(sub * dsub + t) *
            codewordsFlat((sub * ksub + j) * dsub + t)
          t += 1
        }
        val score = dot * inv - c2Half(sub * ksub + j)
        if (score > best) { best = score; bestJ = j }
        j += 1
      }
      codes(sub) = bestJ
      sub += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cw = ctx.addReferenceObj("pqCodewords", codewordsFlat, "double[]")
      val c2 = ctx.addReferenceObj("pqC2Half", c2Half, "double[]")
      val norm2 = ctx.freshName("norm2")
      val inv = ctx.freshName("inv")
      val codes = ctx.freshName("codes")
      val i = ctx.freshName("i")
      val sub = ctx.freshName("sub")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val dot = ctx.freshName("dot")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      val score = ctx.freshName("score")
      s"""
         |if ($v.numElements() != ${m * dsub}) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: vector length " + $v.numElements() +
         |    " != m*dsub (${m * dsub})");
         |}
         |double $norm2 = 0.0;
         |for (int $i = 0; $i < ${m * dsub}; $i++) {
         |  double __x = $v.getDouble($i);
         |  $norm2 += __x * __x;
         |}
         |double $inv = ($norm2 == 0.0) ? 1.0 : 1.0 / Math.sqrt($norm2);
         |int[] $codes = new int[$m];
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  double $best = Double.NEGATIVE_INFINITY;
         |  int $bestJ = 0;
         |  for (int $j = 0; $j < $ksub; $j++) {
         |    double $dot = 0.0;
         |    for (int $t = 0; $t < $dsub; $t++) {
         |      $dot += $v.getDouble($sub * $dsub + $t) *
         |        $cw[($sub * $ksub + $j) * $dsub + $t];
         |    }
         |    double $score = $dot * $inv - $c2[$sub * $ksub + $j];
         |    if ($score > $best) { $best = $score; $bestJ = $j; }
         |  }
         |  $codes[$sub] = $bestJ;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_adc_score(codes)` — asymmetric-distance approximate cosine:
  * `Σ_sub lut(sub*ksub + codes(sub))`. The LUT is built per query from
  * the SAME codebook the codes were produced under (the caller's
  * contract — [[graft.ann.ProductQuantizer.lut]] is the one producer).
  * Out-of-range codes throw by name: a code from a different codebook
  * shape must never silently score. */
case class PqAdcScore(child: Expression, lut: Array[Double],
                      m: Int, ksub: Int)
  extends UnaryExpression {

  require(lut.length == m * ksub,
    s"LUT length ${lut.length} != m*ksub (${m * ksub})")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<int> codes, got ${other.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_adc_score: ${codes.numElements()} codes != m ($m)")
    var s = 0.0
    var sub = 0
    while (sub < m) {
      val c = codes.getInt(sub)
      if (c < 0 || c >= ksub)
        throw new IllegalArgumentException(
          s"pq_adc_score: code $c out of range [0, $ksub) at subspace $sub")
      s += lut(sub * ksub + c)
      sub += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, codes => {
      val lutRef = ctx.addReferenceObj("pqLut", lut, "double[]")
      val s = ctx.freshName("s")
      val sub = ctx.freshName("sub")
      val c = ctx.freshName("c")
      s"""
         |if ($codes.numElements() != $m) {
         |  throw new IllegalArgumentException(
         |    "pq_adc_score: " + $codes.numElements() + " codes != m ($m)");
         |}
         |double $s = 0.0;
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  int $c = $codes.getInt($sub);
         |  if ($c < 0 || $c >= $ksub) {
         |    throw new IllegalArgumentException(
         |      "pq_adc_score: code " + $c + " out of range [0, $ksub) at subspace " + $sub);
         |  }
         |  $s += $lutRef[$sub * $ksub + $c];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)
}
