package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.udf

/** Vector similarity primitives over ArrayType(FloatType) embedding columns.
  *
  * The cosine kernel is a compiled Scala UDF with double accumulation — the
  * SQL higher-order-function formulation measured 36.7 s at sf0.1 vs well
  * under a second for this UDF (SURVEY.md §6). A codegen'd Catalyst
  * Expression is the next step only if BENCH demands it.
  *
  * 100 TB notes: brute-force pairwise cosine is O(n²) and only for bounded
  * candidate sets; the scale path is LSH/IVF bucketing (see LlmOps ANN ops)
  * so each bucket's pairwise work is small and buckets shard across
  * executors.
  */
object VectorFunctions {
  private def dotNorm(a: Array[Float], b: Array[Float]): (Double, Double, Double) = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    (dot, na, nb)
  }

  /** Plain-Scala cosine (exposed for property tests). */
  def cosineValue(a: Seq[Float], b: Seq[Float]): Double = {
    val (dot, na, nb) = dotNorm(a.toArray, b.toArray)
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Cosine similarity, double-accumulated. Array[Float] signature hits
    * Spark's primitive-array fast path (ArrayData.toFloatArray — one
    * arraycopy, zero boxing); the Seq variant was ~10× slower per call. */
  val cosine = udf { (a: Array[Float], b: Array[Float]) =>
    val (dot, na, nb) = dotNorm(a, b)
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Dot product alone — used with per-vector precomputed norms so the
    * O(n²) pair loop does one pass instead of three. sqrt(Σx²) per vector
    * is computed once per row; dot/(normA*normB) is the exact same IEEE
    * expression as the fused kernel, so results stay bit-identical —
    * PRECONDITION: equal-length vectors. The fused kernel accumulates
    * norms over min(|a|,|b|) while the standalone [[norm]] sums the full
    * array, so the two paths only agree when |a| == |b| (true of the
    * fixtures: all embeddings are 64-dim, SURVEY.md §1.2). */
  val dot = udf { (a: Array[Float], b: Array[Float]) =>
    var d = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { d += a(i).toDouble * b(i).toDouble; i += 1 }
    d
  }

  /** L2 norm (double-accumulated) of a float vector. */
  val norm = udf { (a: Array[Float]) =>
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  def cosineSim(a: Column, b: Column): Column = cosine(a, b)

  /** Cosine from the codegen dot product and precomputed norms, rounded
    * 4 dp — THE sim expression every join-shaped similarity op shares
    * (bit-identical to the fused kernel on equal-length vectors). */
  def cosineSimPrecomputed(aVec: Column, bVec: Column, aNrm: Column, bNrm: Column): Column =
    org.apache.spark.sql.functions.round(
      graft.GraftFunctions.dotProduct(aVec, bVec) / (aNrm * bNrm), 4)

  /** Plain-Scala twins of the [[dot]]/[[norm]] UDF loops — identical
    * accumulation order, so kernel results are bit-identical to the
    * expression path. */
  def dotValue(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { d += a(i).toDouble * b(i).toDouble; i += 1 }
    d
  }

  def normValue(a: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Spark's Round(double, 4) semantics (BigDecimal.valueOf + HALF_UP),
    * replicated so kernel sims match the round() expression bit-for-bit —
    * including the NaN/Infinity pass-through (BigDecimal.valueOf would
    * throw on a zero-norm vector's 0/0). */
  private def round4(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** All-pairs cosine (a_id < b_id, sim rounded 4 dp, filtered to
    * sim >= minSim) via a per-partition kernel. The vector set is
    * collected and broadcast exactly as Spark's own BroadcastExchange
    * would collect a broadcast join side; the difference is the pair loop
    * runs in place over primitive arrays — no joined-row materialization,
    * no per-pair UnsafeArrayData copies. Partitions split the outer side,
    * so the O(n²) work shards across executors.
    *
    * Bounded candidate sets only (the broadcast side must fit in
    * executor memory — ~0.5 MB per 2 k vectors at 64 dims). The 100 TB
    * path is LSH/IVF bucketing (annLshTopk / annIvfTopk), which bounds
    * each bucket to exactly this kernel's scale. */
  def cosinePairsKernel(s: SparkSession, e: DataFrame, minSim: Double): DataFrame = {
    import s.implicits._
    val vecs = e.select("vec_id", "embedding").as[(Long, Array[Float])]
    val entries = vecs.collect().sortBy(_._1)
    val ids = entries.map(_._1)
    val arrs = entries.map(_._2)
    val nrms = arrs.map(normValue)
    val bc = s.sparkContext.broadcast((ids, arrs, nrms))
    vecs.mapPartitions { it =>
      val (bIds, bArrs, bNrms) = bc.value
      it.flatMap { case (aId, aVec) =>
        val aNrm = normValue(aVec)
        val hit = java.util.Arrays.binarySearch(bIds, aId)
        var start = if (hit >= 0) hit + 1 else -hit - 1
        // duplicate ids: a_id < b_id excludes equal-id pairs, so skip ALL
        // broadcast entries sharing this id (binarySearch lands on any one)
        while (start < bIds.length && bIds(start) == aId) start += 1
        (start until bIds.length).iterator.flatMap { i =>
          val sim = round4(dotValue(aVec, bArrs(i)) / (aNrm * bNrms(i)))
          if (sim >= minSim) Iterator.single((aId, bIds(i), sim)) else Iterator.empty
        }
      }
    }.toDF("a_id", "b_id", "sim")
  }

  /** 16-bit random-hyperplane (SimHash-for-cosine) bucket id. Hyperplane
    * j's component i is a deterministic pseudo-random value derived from
    * (j, i) — no RNG state, so buckets are stable across runs and engines.
    * Used by the ANN scale path: candidates only within a bucket. */
  val hyperplaneBucket = udf { (v: Array[Float]) =>
    var bucket = 0
    var j = 0
    while (j < 16) {
      var dot = 0.0
      var i = 0
      while (i < v.length) {
        // Deterministic "random" weight in [-0.5, 0.5): fractional part of
        // sin-based hash of (j, i). Public trick (e.g. GLSL one-liners).
        val h = math.sin(j * 374761.393 + i * 668265.263) * 43758.5453
        val w = h - math.floor(h) - 0.5
        dot += v(i) * w
        i += 1
      }
      if (dot >= 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }
}
