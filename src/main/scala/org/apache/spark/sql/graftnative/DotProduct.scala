package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: double-accumulated dot product of two
  * float-array columns. The codegen path reads the unsafe ArrayData in
  * place — no per-row array materialization, no UDF serialization — and
  * stays inside whole-stage codegen, which matters in the O(n²) similarity
  * join where this sits in the innermost loop.
  *
  * Math is identical to the UDF kernel (sequential double accumulation in
  * index order), so results are bit-identical and the DuckDB oracle
  * comparison is unaffected.
  *
  * Lives under org.apache.spark.sql because ExpectsInputTypes /
  * ExpressionUtils are private[sql] — this package is the engine's single
  * internals bridge; everything else stays on public API.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // Nullable regardless of the children: a null ELEMENT null-propagates
  // (see below), and declaring it keeps nullSafeCodeGen's ev.isNull an
  // assignable local even over non-nullable inputs (the QuantizedCodes
  // FalseLiteral lesson).
  override def nullable: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0
    var i = 0
    while (i < n) {
      // Null element → null result: the declared input type accepts
      // containsNull arrays, and the previous unguarded getFloat was
      // REPRESENTATION-dependent — NPE on GenericArrayData, silent 0.0 on
      // UnsafeArrayData — so the same query could crash or drift with the
      // physical plan. Null-propagation matches the zip_with HOF twin.
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      d += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $d += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column bridge for the native expressions (Column ⇄ Expression helpers
  * are private[sql]). */
object GraftNative {
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def nearestHub(lat: Column, lon: Column,
      keys: Array[Int], lats: Array[Double], lons: Array[Double]): Column =
    ExpressionUtils.column(NearestHub(ExpressionUtils.expression(lat),
      ExpressionUtils.expression(lon), keys, lats, lons))

  def vectorNorm(a: Column): Column =
    ExpressionUtils.column(VectorNorm(ExpressionUtils.expression(a)))

  def hyperplaneBucket(a: Column): Column =
    ExpressionUtils.column(HyperplaneBucket(ExpressionUtils.expression(a)))

  def hyperplaneBands(a: Column): Column =
    ExpressionUtils.column(HyperplaneBands(ExpressionUtils.expression(a)))

  def hyperplaneBands(a: Column, numBands: Int, bandBits: Int): Column =
    ExpressionUtils.column(
      HyperplaneBands(ExpressionUtils.expression(a), numBands, bandBits))

  def ntzMicros(a: Column): Column =
    ExpressionUtils.column(NtzMicros(ExpressionUtils.expression(a)))

  def chunkWindows(ws: Column, size: Int, stride: Int): Column =
    ExpressionUtils.column(ChunkWindows(ExpressionUtils.expression(ws), size, stride))

  def hashedShingles(ws: Column, n: Int): Column =
    ExpressionUtils.column(HashedShingles(ExpressionUtils.expression(ws), n))

  def simhash64(toks: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(toks)))

  def quantizedCodes(vec: Column, codebook: Seq[Seq[Seq[Long]]], subDim: Int): Column =
    ExpressionUtils.column(QuantizedCodes(ExpressionUtils.expression(vec),
      codebook.map(_.map(_.toArray).toArray).toArray, subDim))

  def unigramSegment(w: Column, pieces: Seq[String], scores: Seq[Long],
      maxLen: Int): Column =
    ExpressionUtils.column(UnigramSegment(ExpressionUtils.expression(w),
      pieces.toArray, scores.toArray, maxLen))
}
