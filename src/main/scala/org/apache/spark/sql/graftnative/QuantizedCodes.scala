package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, IntegerType}

/** Native codegen kernel for the portable integer quantizer
  * (graft.operators.PortableQuantizer): quantize a float-array embedding
  * ONCE to `floor(x*1e6 + 0.5)` int64, then emit the position-first
  * argmin codeword per contiguous `subDim`-wide subspace against a
  * plan-embedded integer codebook — `array<int>` of `codebook.length`
  * codes (one subspace ⇒ the IVF bucket, 16 subspaces ⇒ the PQ code row).
  *
  * Why native: the Column formulation is a `transform(transform(
  * aggregate(zip_with(slice(transform(...))))))` tower in which the
  * quantization subtree is REFERENCED BY EVERY per-codeword distance —
  * M·K copies, all interpreted (higher-order functions are
  * CodegenFallback), so a 16×16 PQ encode re-quantized each row 256
  * times (measured: emb_pq_adc 4.2 s steady vs 1.5 s for the float
  * HOF path; this kernel takes encode off the profile entirely). At
  * 100 TB the encode is a map-only pass over the corpus, so the
  * per-row constant matters more than anywhere else in the PQ path.
  *
  * Arithmetic is IDENTICAL to the Column form, value for value: one
  * IEEE multiply + add + floor per component, exact int64 squared
  * distances, strict `<` argmin (ties keep the smaller code). The
  * DuckDB oracle replay is therefore unaffected (asserted equal to the
  * HOF formulation in PortableQuantizerSpec).
  *
  * Lives under org.apache.spark.sql because ExpectsInputTypes and the
  * Column bridge are private[sql] (same rationale as [[DotProduct]]).
  */
object QuantizedCodes {
  /** THE fixed-point quantization scale — the single source for this
    * kernel (eval + codegen), the HOF twin, and the DuckDB oracle SQL
    * (graft.operators.PortableQuantizer interpolates it). Changing it in
    * one place and not the others silently breaks kernel/spec/oracle
    * agreement, so there is only one place. */
  val Scale: Double = 1.0e6
}

case class QuantizedCodes(child: Expression, codebook: Array[Array[Array[Long]]],
    subDim: Int)
  extends UnaryExpression with ExpectsInputTypes {

  // Array fields get reference equals on a case class, which would make
  // structurally identical encodes never compare equal in Catalyst and
  // silently defeat subexpression/subplan reuse — compare content.
  override def equals(other: Any): Boolean = other match {
    case q: QuantizedCodes =>
      q.child == child && q.subDim == subDim &&
        java.util.Arrays.deepEquals(
          q.codebook.asInstanceOf[Array[AnyRef]], codebook.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + subDim) +
      java.util.Arrays.deepHashCode(codebook.asInstanceOf[Array[AnyRef]])

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // Nullable independent of the child: a too-short vector yields null
  // (the guard below), and declaring it also makes nullSafeCodeGen emit
  // `ev.isNull` as an assignable local even when the child is
  // non-nullable — without this the generated `ev.isNull = true` writes
  // to the FalseLiteral and janino rejects the whole stage.
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantized_codes"

  protected override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    // EXACT dimension or null — same as the HOF twin (argminInt's
    // zip_with null-padding yields null for ANY length mismatch). The
    // first draft truncated LONG vectors to the codebook span, silently
    // diverging from the formulation this kernel is asserted equal to.
    if (n != codebook.length * subDim) return null
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      // Null ELEMENT → null result, matching the HOF twin (transform/
      // zip_with/aggregate null-propagate); the embeddings schema declares
      // containsNull=true, so silently reading a null slot as 0.0f would
      // diverge from the formulation this kernel is asserted equal to.
      if (x.isNullAt(i)) return null
      q(i) = math.floor(x.getFloat(i).toDouble * QuantizedCodes.Scale + 0.5).toLong
      i += 1
    }
    val codes = new Array[Int](codebook.length)
    var m = 0
    while (m < codebook.length) {
      val cb = codebook(m)
      val base = m * subDim
      var best = Long.MaxValue
      var bc = 0
      var k = 0
      while (k < cb.length) {
        val cv = cb(k)
        var s = 0L
        var d = 0
        while (d < subDim) {
          val diff = q(base + d) - cv(d)
          s += diff * diff
          d += 1
        }
        if (s < best) { best = s; bc = k }
        k += 1
      }
      codes(m) = bc
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "long[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val codes = ctx.freshName("codes")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bc = ctx.freshName("bc")
      val diff = ctx.freshName("diff")
      val cb = ctx.freshName("cb")
      val cv = ctx.freshName("cv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $cbRef.length * $subDim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $q = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $q[$i] = (long) java.lang.Math.floor((double) $a.getFloat($i) * ${QuantizedCodes.Scale}D + 0.5D);
         |  }
         |  if (!${ev.isNull}) {
         |  int[] $codes = new int[$cbRef.length];
         |  for (int $m = 0; $m < $cbRef.length; $m++) {
         |    long[][] $cb = $cbRef[$m];
         |    long $best = Long.MAX_VALUE;
         |    int $bc = 0;
         |    for (int $k = 0; $k < $cb.length; $k++) {
         |      long[] $cv = $cb[$k];
         |      long $s = 0L;
         |      for (int $d = 0; $d < $subDim; $d++) {
         |        long $diff = $q[$m * $subDim + $d] - $cv[$d];
         |        $s += $diff * $diff;
         |      }
         |      if ($s < $best) { $best = $s; $bc = $k; }
         |    }
         |    $codes[$m] = $bc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizedCodes =
    copy(child = newChild)
}
