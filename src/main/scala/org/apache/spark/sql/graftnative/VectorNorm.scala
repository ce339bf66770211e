package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
  // null ELEMENT → null (same containsNull treatment as DotProduct /
  // QuantizedCodes: the unguarded read was representation-dependent)
  override def nullable: Boolean = true

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i).toDouble; s += v * v; i += 1
    }
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
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = java.lang.Math.sqrt($s);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

/** Native Catalyst expression: 16-bit random-hyperplane (SimHash-for-
  * cosine) bucket id, PORTABLE integer form. Hyperplane j's component i is
  * the md5-derived integer weight `(md5_60bit("j:i") % 2001) − 1000` and
  * the input vector is quantized to fixed-point `floor(v·10⁶ + 0.5)`
  * before the dot product, so the whole bucket computation is exact int64
  * arithmetic — no float summation order, no libm sin — and a DuckDB
  * oracle can reconstruct identical buckets from the identical hash math
  * (same technique as the SimHash64 / CMS promotions). The sign quantizer
  * is scale-invariant up to the 10⁻⁶ quantization step, which is far
  * below the fixture's embedding magnitudes (~0.5), so bucket quality
  * matches the float form it replaces.
  */
case class HyperplaneBucket(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hyperplane_bucket"

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    HyperplaneBucket.requireDim(n)
    val w = HyperplaneBucket.flatWeights
    var bucket = 0
    var j = 0
    while (j < 16) {
      var dot = 0L
      var i = 0
      while (i < n) {
        val q = math.floor(x.getFloat(i).toDouble * 1e6 + 0.5).toLong
        dot += q * w(j * HyperplaneBucket.MaxDim + i)
        i += 1
      }
      if (dot >= 0L) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("hpWeights", HyperplaneBucket.flatWeights, "long[]")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $a.numElements();
         |org.apache.spark.sql.graftnative.HyperplaneBucket.requireDim($n);
         |int $bucket = 0;
         |for (int $j = 0; $j < 16; $j++) {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $q = (long) java.lang.Math.floor((double) $a.getFloat($i) * 1e6 + 0.5);
         |    $dot += $q * $w[$j * ${HyperplaneBucket.MaxDim} + $i];
         |  }
         |  if ($dot >= 0L) $bucket |= (1 << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Static weight table bound: vectors longer than this fail loudly
    * (extend the constant, never silently truncate the hyperplane). */
  val MaxDim = 1024

  def requireDim(n: Int): Unit =
    if (n > MaxDim || n == 0) throw new IllegalArgumentException(
      s"graft_hyperplane_bucket supports vectors of 1 to $MaxDim dims, got $n")
      // n == 0 is rejected (not bucketed): an empty dot product is 0,
      // so every sign test would fire and a zero-length vector would
      // land in the all-bits-set bucket of EVERY band — while the
      // DuckDB oracle's unnest-based chain drops such vectors entirely.
      // Failing loudly keeps the two engines from silently diverging.

  /** w(j, i) = (md5_60bit("j:i") % 2001) − 1000 ∈ [−1000, 1000] — the
    * 60-bit value is the first 15 hex chars of md5, the exact integer
    * Spark's `conv(substring(md5(x),1,15),16,10)` and DuckDB's
    * `CAST('0x'||substring(md5(x),1,15) AS BIGINT)` both produce. */
  private[graftnative] def weight(j: Int, i: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L
  }

  private[graftnative] def flatWeightTable(nj: Int): Array[Long] = {
    val w = new Array[Long](nj * MaxDim)
    var j = 0
    while (j < nj) {
      var i = 0
      while (i < MaxDim) { w(j * MaxDim + i) = weight(j, i); i += 1 }
      j += 1
    }
    w
  }

  /** Row-major [16][MaxDim] flattened; computed once per JVM. */
  lazy val flatWeights: Array[Long] = flatWeightTable(16)
}

/** Native Catalyst expression: band-OR amplified random-hyperplane LSH —
  * an ARRAY of [[HyperplaneBands.NumBands]] independent
  * [[HyperplaneBands.BandBits]]-bit hyperplane bucket ids (band t's bit k
  * is hyperplane j = t·BandBits + k of the SAME portable md5-weight
  * family as [[HyperplaneBucket]]). A pair is an ANN candidate when it
  * collides in ANY band — the classic OR-of-ANDs amplification (the
  * MinHash banding pattern applied to the hyperplane family), which
  * turns the single-table recall p^16 into 1 − (1 − p^BandBits)^NumBands.
  * All integer math (fixed-point components × md5 weights), so a DuckDB
  * oracle reconstructs every band bucket — candidate set and all.
  */
case class HyperplaneBands(child: Expression,
    numBands: Int = HyperplaneBands.NumBands,
    bandBits: Int = HyperplaneBands.BandBits)
  extends UnaryExpression with ExpectsInputTypes {

  require(numBands >= 1 && bandBits >= 1 && bandBits <= 30,
    s"graft_hyperplane_bands needs numBands >= 1 and 1 <= bandBits <= 30, " +
      s"got ($numBands, $bandBits)")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_bands"
  // null ELEMENT → null row result (QuantizedCodes discipline: the
  // unguarded getFloat on a null slot is representation-dependent)
  override def nullable: Boolean = true

  private val NumBands = numBands
  private val BandBits = bandBits

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    HyperplaneBucket.requireDim(n)
    val w = HyperplaneBands.weightsFor(NumBands * BandBits)
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      q(i) = math.floor(x.getFloat(i).toDouble * 1e6 + 0.5).toLong
      i += 1
    }
    val out = new Array[Int](NumBands)
    var t = 0
    while (t < NumBands) {
      var bucket = 0
      var k = 0
      while (k < BandBits) {
        val j = t * BandBits + k
        var dot = 0L
        i = 0
        while (i < n) { dot += q(i) * w(j * HyperplaneBucket.MaxDim + i); i += 1 }
        if (dot >= 0L) bucket |= (1 << k)
        k += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("hpBandWeights",
        HyperplaneBands.weightsFor(NumBands * BandBits), "long[]")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val tb = ctx.freshName("t")
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |org.apache.spark.sql.graftnative.HyperplaneBucket.requireDim($n);
         |long[] $q = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $q[$i] = (long) java.lang.Math.floor((double) $a.getFloat($i) * 1e6 + 0.5);
         |}
         |if (!${ev.isNull}) {
         |  int[] $out = new int[$NumBands];
         |  for (int $tb = 0; $tb < $NumBands; $tb++) {
         |    int $bucket = 0;
         |    for (int $k = 0; $k < $BandBits; $k++) {
         |      int $j = $tb * $BandBits + $k;
         |      long $dot = 0L;
         |      for (int $i = 0; $i < $n; $i++) {
         |        $dot += $q[$i] * $w[$j * ${HyperplaneBucket.MaxDim} + $i];
         |      }
         |      if ($dot >= 0L) $bucket |= (1 << $k);
         |    }
         |    $out[$tb] = $bucket;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

object HyperplaneBands {
  /** DEFAULT operating point, 24 bands × 6 bits — chosen empirically on
    * the fixture corpus (64-dim embeddings whose exact top-20 cosine
    * pairs sit at sim ≈ 0.44–0.60, barely above the random-pair floor):
    * measured recall of the exact top-20 is 0.85 at BOTH sf0.01 and
    * sf0.1 (vs 0.05 for the single 16-bit table), with the candidate set
    * a band-bucket equi-join, never all-pairs. The expression is
    * parameterized (round 10): corpora whose near-dup pairs sit at
    * sim ≥ 0.8 should run MORE bits per band and fewer candidates (the
    * random-pair candidate fraction is ≈ numBands / 2^bandBits, e.g.
    * b=12/L=28 at ~0.7 %) — see docs/SCALE.md for the measured
    * trade-off curve. All operating points share the one md5 hyperplane
    * family (hyperplane j = band·bits + bit), so any (l, b) is
    * oracle-replayable with the same integer math. */
  val NumBands = 24
  val BandBits = 6

  /** Row-major [nj][MaxDim] flattened weight tables, one per requested
    * hyperplane count; built once per JVM per size (operating points
    * share prefixes of the same j-indexed family, not storage). */
  private val weightTables =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  def weightsFor(nj: Int): Array[Long] =
    weightTables.computeIfAbsent(nj, n => HyperplaneBucket.flatWeightTable(n))

  /** The default operating point's table (spec convenience). */
  lazy val flatWeights: Array[Long] = weightsFor(NumBands * BandBits)
}
