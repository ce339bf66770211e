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

  /** Cosine between a float vector and a double vector (e.g. a computed
    * centroid) — same sequential index-order accumulation as the
    * float/float kernel, mirroring DuckDB's list_cosine_similarity, so
    * rounded sims agree cross-engine. */
  def cosineMixedValue(a: Array[Float], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  val cosineMixed = udf { (a: Array[Float], b: Array[Double]) => cosineMixedValue(a, b) }

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
  /** Hard cap for the collect-and-broadcast kernel: ~100 k × 64-dim floats
    * ≈ 26 MB broadcast and 5×10⁹ pair evaluations — past this, the collect
    * threatens the driver and the O(n²) loop the wall clock. */
  val MaxKernelVectors = 100000L

  def cosinePairsKernel(s: SparkSession, e: DataFrame, minSim: Double): DataFrame = {
    import s.implicits._
    val vecs = e.select("vec_id", "embedding").as[(Long, Array[Float])]
    // take(cap+1) guards AND collects in ONE job (a separate count()
    // would run the upstream plan twice), with driver memory bounded at
    // cap+1 rows either way.
    val taken = vecs.take(MaxKernelVectors.toInt + 1)
    require(taken.length <= MaxKernelVectors,
      s"cosinePairsKernel collects the vector table to the driver and is the BOUNDED exact path " +
        s"(more than $MaxKernelVectors vectors). Use cosinePairsDistributed for exact pairs at scale, " +
        "or the approximate annLshTopk / annIvfTopk bucketed paths.")
    val entries = taken.sortBy(_._1)
    val ids = entries.map(_._1)
    val arrs = entries.map(_._2)
    val nrms = arrs.map(normValue)
    val bc = s.sparkContext.broadcast((ids, arrs, nrms))
    // the streamed (outer) side comes from the SAME taken snapshot, not a
    // second execution of the upstream plan: a nondeterministic source
    // (sample, monotonically_increasing_id, growth between jobs) would
    // otherwise disagree with the broadcast — wrong/missing pairs and a
    // bypassed cap. Bounded by the same cap the broadcast already is.
    val outer = s.createDataset(entries.toSeq)
      .repartition(s.sparkContext.defaultParallelism)
    outer.mapPartitions { it =>
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

  /** Distributed all-pairs cosine — the no-driver-collect twin of
    * [[cosinePairsKernel]], bit-identical output (same dot/norm/round4
    * loops, same a_id < b_id / equal-id-skip semantics). A classic
    * block-nested-loop join:
    *
    *  1. vectors hash into `numChunks` blocks (`vec_id % K`); each block is
    *     assembled by a `groupByKey.mapGroups` that runs in EXECUTORS —
    *     the driver never holds a vector;
    *  2. each block replicates itself K times, keyed by the ordered block
    *     pair (i,j) it participates in;
    *  3. each of the K(K+1)/2 pair-groups runs the primitive-array kernel
    *     over its one or two blocks as an independent task.
    *
    * Scale posture: per-task memory is bounded by TWO blocks, and the
    * block count is DERIVED FROM THE INPUT (K = ceil(n / TargetBlockRows),
    * floor 16) so a block never exceeds ~TargetBlockRows vectors — growing
    * the corpus adds tasks, not per-task memory. Shuffle volume is O(K·n)
    * rows and the inherent O(n²) exact-join work shards over K(K+1)/2
    * tasks with no single process ever holding the full set. The one
    * count() job that sizes K is a narrow columnar scan — noise next to
    * the quadratic pair work it right-sizes. For unbounded n the
    * approximate paths (annLshTopk / annIvfTopk) replace exactness with
    * bucketing. Pair output is invariant to K (property-tested across K
    * values including the derived one). */
  def cosinePairsDistributed(s: SparkSession, e: DataFrame, minSim: Double,
                             numChunks: Int = 0): DataFrame =
    pairGroups(s, e, numChunks)(
      cross = blockCrossPairs(_, _, minSim), self = blockSelfPairs(_, minSim))

  /** The ONE copy of the self-join blocking scaffold (block assembly via
    * [[vecBlocks]], ordered pair-key replication, pair-group dispatch) —
    * [[cosinePairsDistributed]] and [[cosineTopKDistributed]] differ only
    * in the per-group kernel, and the sortBy(_._1) / diagonal-dedup
    * invariants the kernels' a_id < b_id logic depends on must hold for
    * both, so they live exactly once. */
  private def pairGroups(s: SparkSession, e: DataFrame, numChunks: Int)(
      cross: (VecBlock, VecBlock) => Iterator[(Long, Long, Double)],
      self: VecBlock => Iterator[(Long, Long, Double)]): DataFrame = {
    import s.implicits._
    val k = if (numChunks > 0) numChunks else deriveChunks(e.count())
    // pair keys are LONG: Int lo*k+hi wraps past k = 46340 (deriveChunks
    // allows far larger), and a wrapped key both collides groups and
    // breaks the diagonal test — silently dropped pairs at exactly the
    // corpus sizes the scaffold exists for
    vecBlocks(e, k)
      .flatMap(b => (0 until k).iterator.map { o =>
        val lo = math.min(b.chunk, o); val hi = math.max(b.chunk, o)
        (lo.toLong * k + hi, b)
      })
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val bs = it.map(_._2).toArray
        // An off-diagonal pair-group (i,j) with one of its chunks EMPTY
        // receives a single block; its self-pairs already ran under the
        // diagonal key (i,i), so emitting them here would duplicate pairs.
        if (bs.length == 2) cross(bs(0), bs(1))
        else if (key / k == key % k) self(bs(0))
        else Iterator.empty
      }
      .toDF("a_id", "b_id", "sim")
  }

  /** Chunked block assembly shared by the self-join scaffold and the
    * cross-corpus search: vectors land in chunk pmod(vec_id, k), each
    * chunk packs into one id-sorted primitive-array [[VecBlock]]. */
  private def vecBlocks(e: DataFrame, k: Int): org.apache.spark.sql.Dataset[VecBlock] = {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    import e.sparkSession.implicits._
    e.select(pmod(col("vec_id"), lit(k)).cast("int").as("chunk"),
        col("vec_id"), col("embedding"))
      .as[(Int, Long, Array[Float])]
      .groupByKey(_._1)
      .mapGroups { (c, it) =>
        val arr = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
        VecBlock(c, arr.map(_._1), arr.map(_._2))
      }
  }

  /** Global top-k cosine pairs with the k-selection PUSHED INTO the BNL
    * tasks: same blocks / pair-group sharding / kernel loops as
    * [[cosinePairsDistributed]], but each of the K(K+1)/2 tasks keeps only
    * its local top-k under the final total order (sim desc, a_id, b_id) in
    * a bounded heap, so the task emits k rows instead of its full O(block²)
    * pair set. Top-k is distributive over any partition of the pair space,
    * so `global sort-limit(k)` over the K(K+1)/2·k survivors is exactly
    * `allPairs.orderBy(sim desc, a_id, b_id).limit(k)` — property-tested
    * against that spelling. At sf0.1 this turns a 12.5M-row materialize +
    * sort into ~25-row-per-task output (measured 6.8 s → well under the
    * 3 s/key budget); at 100 TB it is the difference between shuffling the
    * quadratic pair set and shuffling K(K+1)/2·k rows. */
  def cosineTopKDistributed(s: SparkSession, e: DataFrame, topK: Int,
                            numChunks: Int = 0): DataFrame =
    pairGroups(s, e, numChunks)(
      cross = crossTopK(_, _, topK), self = selfTopK(_, topK))

  /** Heap order for the pair total order (sim DESC, a_id ASC, b_id ASC):
    * key (-sim, a_id, b_id) makes "largest key" = "worst pair", so a
    * max-heap's head eviction keeps the best k. NaN-free by contract —
    * callers guarantee no zero-norm vectors (tf-idf weights are strictly
    * positive); NaN would sort differently here than in Spark's SortExec. */
  private val pairOrd = Ordering.by[(Long, Long, Double), (Double, Long, Long)](
    p => (-p._3, p._1, p._2))

  /** Bounded k-selection fused INTO the pair loop. The hot-loop trick:
    * track the worst KEPT pair's rounded sim as `thr` and skip any raw sim
    * below `thr - 1e-4` without rounding or allocating — HALF_UP means
    * round4(x) ≥ thr requires x ≥ thr - 5e-5, so the margin is safe with
    * slack. round4 builds a BigDecimal per call; at 12.5M pairs (sf0.1)
    * rounding every pair dominated the whole query (~3.3 s warm), while
    * only the few thousand threshold-crossers actually need it. */
  private final class PairTopK(k: Int) {
    private val pq = scala.collection.mutable.PriorityQueue.empty(pairOrd)
    private var thr = Double.NegativeInfinity
    def offer(a: Long, b: Long, raw: Double): Unit =
      if (pq.size < k) {
        pq.enqueue((a, b, round4(raw)))
        if (pq.size == k) thr = pq.head._3
      } else if (raw >= thr - 1e-4) {
        val cand = (a, b, round4(raw))
        if (pairOrd.lt(cand, pq.head)) {
          pq.dequeue(); pq.enqueue(cand); thr = pq.head._3
        }
      }
    def result: Iterator[(Long, Long, Double)] = pq.iterator
  }

  private def selfTopK(b: VecBlock, k: Int): Iterator[(Long, Long, Double)] = {
    val nrms = b.vecs.map(normValue)
    val acc = new PairTopK(k)
    var u = 0
    while (u < b.ids.length) {
      var v = u + 1
      while (v < b.ids.length) {
        // ids sorted asc: u < v gives a_id < b_id; equal ids skip
        if (b.ids(u) != b.ids(v))
          acc.offer(b.ids(u), b.ids(v),
            dotValue(b.vecs(u), b.vecs(v)) / (nrms(u) * nrms(v)))
        v += 1
      }
      u += 1
    }
    acc.result
  }

  private def crossTopK(x: VecBlock, y: VecBlock, k: Int): Iterator[(Long, Long, Double)] = {
    val nx = x.vecs.map(normValue)
    val ny = y.vecs.map(normValue)
    val acc = new PairTopK(k)
    var u = 0
    while (u < x.ids.length) {
      var v = 0
      while (v < y.ids.length) {
        // equal ids land in the same chunk, so cross pairs are distinct-id
        val raw = dotValue(x.vecs(u), y.vecs(v)) / (nx(u) * ny(v))
        if (x.ids(u) < y.ids(v)) acc.offer(x.ids(u), y.ids(v), raw)
        else acc.offer(y.ids(v), x.ids(u), raw)
        v += 1
      }
      u += 1
    }
    acc.result
  }

  /** Per-block row budget for the BNL: a 65 536 × 64-dim float block is
    * ~17 MB plus ids/norms — two blocks per task stay far under any sane
    * executor heap, and tasks stay small enough for AQE/speculation to
    * balance. */
  val TargetBlockRows = 65536L

  /** Block count for [[cosinePairsDistributed]]: K = ceil(n/TargetBlockRows)
    * with a floor of 16 (below the floor the quadratic work is trivial and
    * extra blocks only buy parallelism, which local[32]/AQE already has).
    * Per-task memory is thus bounded by 2·TargetBlockRows vectors at ANY
    * corpus size — the constant that was previously K is now the block
    * size, which is the one that must not grow with n. */
  def deriveChunks(n: Long): Int = {
    val blocks = (n + TargetBlockRows - 1) / TargetBlockRows
    math.max(16L, blocks).min(Int.MaxValue.toLong).toInt
  }

  /** Cross-corpus exact cosine pairs — the BNL join between TWO vector
    * sets (queries × corpus, new batch × existing corpus): every (left,
    * right) pair with rounded sim ≥ minSim, directional output (a_id from
    * left, b_id from right, no a<b reordering and no same-side pairs).
    * Same kernel loops as [[cosinePairsDistributed]], so sims are
    * bit-identical to the self-join form.
    *
    * Scale posture: each side blocks by `vec_id % K` with its OWN K
    * (derived from that side's cardinality, same TargetBlockRows bound) —
    * a small daily batch against a huge corpus costs K_corpus·K_batch
    * pair-groups, not K_corpus², and per-task memory stays two blocks.
    * Left block i replicates to keys (i, 0..K_r-1), right block j to
    * (0..K_l-1, j), so each pair-group holds exactly one left + one right
    * block; shuffle is O(K_r·|L| + K_l·|R|) rows, and CROSS-side work
    * only (the incremental shape: the same-side pairs a full self-join
    * would recompute are never generated). */
  def cosineCrossDistributed(s: SparkSession, left: DataFrame, right: DataFrame,
                             minSim: Double, numChunks: Int = 0,
                             numChunksRight: Int = 0): DataFrame = {
    import s.implicits._
    val kL = if (numChunks > 0) numChunks else deriveChunks(left.count())
    // the right side derives its OWN K whenever unset — reusing the
    // left's explicit numChunks made a small-batch-vs-huge-corpus call
    // pack |R|/K_left vectors into one block, the unbounded-task-memory
    // shape the per-side contract exists to prevent
    val kR = if (numChunksRight > 0) numChunksRight else deriveChunks(right.count())
    // key = leftChunk * kR + rightChunk (LONG — see pairGroups); each key
    // receives at most one block per side, tagged by side
    val l = vecBlocks(left, kL).flatMap(b => (0 until kR).iterator.map(j => (b.chunk.toLong * kR + j, true, b)))
    val r = vecBlocks(right, kR).flatMap(b => (0 until kL).iterator.map(i => (i.toLong * kR + b.chunk, false, b)))
    l.union(r)
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val bs = it.map(t => (t._2, t._3)).toArray
        if (bs.length == 2) {
          val lb = bs.find(_._1).map(_._2)
          val rb = bs.find(!_._1).map(_._2)
          if (lb.isDefined && rb.isDefined) blockCrossDirectional(lb.get, rb.get, minSim)
          else Iterator.empty // one side's chunk is empty: no cross pairs
        } else Iterator.empty
      }
      .toDF("a_id", "b_id", "sim")
  }

  private def blockCrossDirectional(x: VecBlock, y: VecBlock, minSim: Double): Iterator[(Long, Long, Double)] = {
    val nx = x.vecs.map(normValue)
    val ny = y.vecs.map(normValue)
    for {
      u <- x.ids.indices.iterator
      v <- y.ids.indices.iterator
      sim = round4(dotValue(x.vecs(u), y.vecs(v)) / (nx(u) * ny(v)))
      if sim >= minSim
    } yield (x.ids(u), y.ids(v), sim)
  }

  private def blockSelfPairs(b: VecBlock, minSim: Double): Iterator[(Long, Long, Double)] = {
    val nrms = b.vecs.map(normValue)
    for {
      u <- b.ids.indices.iterator
      v <- (u + 1 until b.ids.length).iterator
      if b.ids(u) != b.ids(v) // ids sorted asc: u<v gives a_id < b_id
      sim = round4(dotValue(b.vecs(u), b.vecs(v)) / (nrms(u) * nrms(v)))
      if sim >= minSim
    } yield (b.ids(u), b.ids(v), sim)
  }

  private def blockCrossPairs(x: VecBlock, y: VecBlock, minSim: Double): Iterator[(Long, Long, Double)] = {
    val nx = x.vecs.map(normValue)
    val ny = y.vecs.map(normValue)
    // equal ids land in the same chunk (chunk = id mod K), so cross-block
    // pairs are always distinct-id; order each pair by id.
    for {
      u <- x.ids.indices.iterator
      v <- y.ids.indices.iterator
      sim = round4(dotValue(x.vecs(u), y.vecs(v)) / (nx(u) * ny(v)))
      if sim >= minSim
    } yield if (x.ids(u) < y.ids(v)) (x.ids(u), y.ids(v), sim)
            else (y.ids(v), x.ids(u), sim)
  }

  /** 16-bit random-hyperplane (SimHash-for-cosine) bucket id — Scala-UDF
    * twin of the native [[org.apache.spark.sql.graftnative.HyperplaneBucket]]
    * expression (bit-for-bit parity asserted in VectorFunctionsSpec).
    * Portable integer form: md5-derived weights, fixed-point dot, exact
    * int64 arithmetic — reconstructable in DuckDB, so ann_lsh_topk is
    * fully oracle-graded. Used by the ANN scale path: candidates only
    * within a bucket. */
  val hyperplaneBucket = udf { (v: Array[Float]) =>
    import org.apache.spark.sql.graftnative.{HyperplaneBucket => HB}
    HB.requireDim(v.length)
    var bucket = 0
    var j = 0
    while (j < 16) {
      var dot = 0L
      var i = 0
      while (i < v.length) {
        val q = math.floor(v(i).toDouble * 1e6 + 0.5).toLong
        dot += q * HB.flatWeights(j * HB.MaxDim + i)
        i += 1
      }
      if (dot >= 0L) bucket |= (1 << j)
      j += 1
    }
    bucket
  }
}
