package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: double-accumulated L2 norm of a float-array
  * column. Same accumulation order as the Scala-UDF `norm` it replaces
  * (sequential, index order), so sims computed from it are bit-identical —
  * but the projection that prepares the ANN similarity joins now stays
  * inside whole-stage codegen end-to-end instead of breaking at a
  * ScalaUDF node.
  */
case class VectorNorm(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

/** Native Catalyst expression: 16-bit random-hyperplane (SimHash-for-
  * cosine) bucket id. Hyperplane j's component i is the deterministic
  * sin-hash weight `frac(sin(j·374761.393 + i·668265.263)·43758.5453) −
  * 0.5` — identical arithmetic to the Scala-UDF `hyperplaneBucket` it
  * replaces (buckets stay stable across runs and engines), evaluated in
  * generated code so the ANN bucketing projection is UDF-free.
  */
case class HyperplaneBucket(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hyperplane_bucket"

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var bucket = 0
    var j = 0
    while (j < 16) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val h = math.sin(j * 374761.393 + i * 668265.263) * 43758.5453
        dot += x.getFloat(i) * (h - math.floor(h) - 0.5)
        i += 1
      }
      if (dot >= 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $a.numElements();
         |int $bucket = 0;
         |for (int $j = 0; $j < 16; $j++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $h = java.lang.Math.sin($j * 374761.393 + $i * 668265.263) * 43758.5453;
         |    $dot += $a.getFloat($i) * ($h - java.lang.Math.floor($h) - 0.5);
         |  }
         |  if ($dot >= 0) $bucket |= (1 << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}
