package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GeoMean, VectorFunctions}

/** Property-style tests with seeded sampling (scalacheck's scalatest bridge
  * isn't on the offline classpath; explicit loops keep the same coverage). */
class VectorFunctionsSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)
  private def randVec(n: Int): Seq[Float] =
    Seq.fill(n)((rnd.nextFloat() - 0.5f) * 20f)

  test("cosine of a vector with itself is 1") {
    (1 to 100).foreach { _ =>
      val v = randVec(1 + rnd.nextInt(64))
      assert(math.abs(VectorFunctions.cosineValue(v, v) - 1.0) < 1e-9)
    }
  }

  test("cosine is symmetric and bounded") {
    (1 to 100).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val (a, b) = (randVec(n), randVec(n))
      val ab = VectorFunctions.cosineValue(a, b)
      assert(ab == VectorFunctions.cosineValue(b, a))
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
    }
  }

  test("cosine known values") {
    assert(VectorFunctions.cosineValue(Seq(1f, 0f), Seq(0f, 1f)) == 0.0)
    assert(math.abs(VectorFunctions.cosineValue(Seq(1f, 0f), Seq(1f, 1f)) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("geomean merge is associative (partial aggregation safe)") {
    (1 to 50).foreach { _ =>
      val xs = Seq.fill(1 + rnd.nextInt(200))(0.1 + rnd.nextDouble() * 100)
      val whole = xs.foldLeft(GeoMean.zero)((b, x) => GeoMean.reduce(b, x))
      val (l, r) = xs.splitAt(xs.length / 2)
      val split = GeoMean.merge(l.foldLeft(GeoMean.zero)((b, x) => GeoMean.reduce(b, x)),
        r.foldLeft(GeoMean.zero)((b, x) => GeoMean.reduce(b, x)))
      assert(whole.n == split.n)
      assert(math.abs(whole.sumLn - split.sumLn) < 1e-9)
      val expected = math.exp(xs.map(math.log).sum / xs.length)
      assert(math.abs(GeoMean.finish(whole) - expected) < 1e-9)
    }
  }

  test("native DotProduct expression matches the scala kernel bit-for-bit") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.col
    val vecs = Seq.tabulate(50)(i => (i.toLong, randVec(64), randVec(64)))
    val out = vecs.toDF("id", "a", "b")
      .select(col("id"), graft.GraftFunctions.dotProduct(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.foreach { case (id, a, b) =>
      val expected = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      assert(out(id) == expected, s"id $id")
    }
  }

  test("distributed block-join pairs match the collect kernel bit-for-bit") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    // duplicate ids, a zero vector, and n chosen so chunk counts both
    // divide and don't divide it; k > n forces EMPTY chunks (the case
    // where a lone off-diagonal block must not re-emit self-pairs)
    val rows = Seq.tabulate(37)(i => (i.toLong, randVec(16).toArray)) ++
      Seq((3L, randVec(16).toArray), (50L, Array.fill(16)(0f)))
    val df = rows.toDF("vec_id", "embedding")
    val expected = VectorFunctions.cosinePairsKernel(spark0, df, -2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    Seq(1, 3, 16, 64).foreach { k =>
      val got = VectorFunctions.cosinePairsDistributed(spark0, df, -2.0, numChunks = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(got == expected, s"numChunks=$k diverged from kernel")
    }
    // the production path: numChunks omitted, K derived from a count of
    // the input — same pairs as every explicit K
    val derived = VectorFunctions.cosinePairsDistributed(spark0, df, -2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(derived == expected, "derived-K path diverged from kernel")
  }

  test("top-k pushdown equals all-pairs + sort-limit under the same total order, any K") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    // tie-heavy input: duplicated vectors produce many equal round4 sims,
    // so the (sim desc, a_id, b_id) tiebreak is actually exercised
    val base = Seq.tabulate(12)(_ => randVec(16).toArray)
    val rows = Seq.tabulate(45)(i => (i.toLong, base(i % 12)))
    val df = rows.toDF("vec_id", "embedding")
    val ordKey = (p: (Long, Long, Double)) => (-p._3, p._1, p._2)
    Seq(5, 25, 2000).foreach { topK =>  // 2000 > pair count: keep-all case
      val expected = VectorFunctions.cosinePairsDistributed(spark0, df, -2.0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(ordKey).take(topK).toSeq
      Seq(1, 4, 64).foreach { k =>
        val got = VectorFunctions.cosineTopKDistributed(spark0, df, topK, numChunks = k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .sortBy(ordKey).take(topK).toSeq
        assert(got == expected, s"topK=$topK numChunks=$k diverged from sort-limit")
      }
    }
  }

  test("cross-corpus block join matches the self-join kernel on the cross-split subset, any K") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq.tabulate(41)(i => (i.toLong, randVec(16).toArray))
    val df = rows.toDF("vec_id", "embedding")
    val left = df.filter(col("vec_id") % 10 < 8)
    val right = df.filter(col("vec_id") % 10 >= 8)
    // ground truth: the self-join kernel restricted to cross-split pairs,
    // re-oriented (left id first) — sims must match bit-for-bit
    val expected = VectorFunctions.cosinePairsKernel(spark0, df, -2.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a % 10 < 8) != (b % 10 < 8) }
      .map { case (a, b, s) => if (a % 10 < 8) (a, b, s) else (b, a, s) }
      .sorted.toSeq
    Seq(1, 3, 16, 0).foreach { k => // 0 = derive each side's K from its own count
      val got = VectorFunctions.cosineCrossDistributed(spark0, left, right, -2.0, numChunks = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(got == expected, s"numChunks=$k diverged from the self-join kernel")
    }
    // asymmetric block counts — the big-corpus × small-batch shape where
    // per-side derivation pays off (K_l·K_r groups, not K_max²)
    val asym = VectorFunctions.cosineCrossDistributed(spark0, left, right, -2.0,
        numChunks = 5, numChunksRight = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(asym == expected, "asymmetric K diverged from the self-join kernel")
  }

  test("cosine kernel guard fails loudly past the vector cap") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.{array, col, lit}
    val big = spark0.range(VectorFunctions.MaxKernelVectors + 1)
      .select(col("id").as("vec_id"),
        array(lit(1f), lit(0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      VectorFunctions.cosinePairsKernel(spark0, big, 0.9)
    }
    assert(e.getMessage.contains("cosinePairsDistributed"))
  }

  test("hyperplane bucketing rejects zero-length vectors (oracle drops them; all-bands bucket would diverge)") {
    // an empty dot product is 0, so every sign test would fire and the
    // vector would land in the all-bits-set bucket of EVERY band — while
    // the DuckDB oracle's unnest chain drops such vectors entirely.
    // requireDim(0) fails loudly instead of silently diverging.
    val e = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graftnative.HyperplaneBucket.requireDim(0)
    }
    assert(e.getMessage.contains("1 to"))
    val spark0 = TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.col
    val err = intercept[Exception] {
      Seq((1L, Array.empty[Float])).toDF("id", "a")
        .select(graft.GraftFunctions.hyperplaneBands(col("a"))).collect()
    }
    assert(err.getMessage != null)
  }

  test("native VectorNorm and HyperplaneBucket match their scala twins bit-for-bit") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.col
    val vecs = Seq.tabulate(50)(i => (i.toLong, randVec(64)))
    val out = vecs.toDF("id", "a")
      .select(col("id"), graft.GraftFunctions.vectorNorm(col("a")).as("n"),
        graft.GraftFunctions.hyperplaneBucket(col("a")).as("b"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    val udfOut = vecs.toDF("id", "a")
      .select(col("id"), VectorFunctions.norm(col("a")).as("n"),
        VectorFunctions.hyperplaneBucket(col("a")).as("b"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    vecs.foreach { case (id, a) =>
      assert(out(id)._1 == VectorFunctions.normValue(a.toArray), s"norm id $id")
      assert(out(id) == udfOut(id), s"native vs udf id $id")
    }
  }

  test("hyperplane BANDS: codegen matches interpreted, band t = hyperplanes 6t..6t+5") {
    import org.apache.spark.sql.graftnative.{HyperplaneBands, HyperplaneBucket}
    val spark0 = TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.col
    val vecs = Seq.tabulate(40)(i => (i.toLong, randVec(64)))
    val df = vecs.toDF("id", "a")
      .select(col("id"), graft.GraftFunctions.hyperplaneBands(col("a")).as("b"))
    def run(): Map[Long, Seq[Int]] =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val gen = run()
    spark0.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = try run() finally
      spark0.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(gen == interp, "codegen vs interpreted band buckets")
    // closed-form twin: band t's bit k is the sign of the exact int64 dot
    // of hyperplane j = t*6 + k (same md5 weight family as the 16-bit op)
    vecs.foreach { case (id, a) =>
      val bands = gen(id)
      assert(bands.length == HyperplaneBands.NumBands)
      val q = a.map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong)
      val w = HyperplaneBands.flatWeights
      (0 until HyperplaneBands.NumBands).foreach { t =>
        var want = 0
        (0 until HyperplaneBands.BandBits).foreach { k =>
          val j = t * HyperplaneBands.BandBits + k
          val dot = q.indices.map(i => q(i) * w(j * HyperplaneBucket.MaxDim + i)).sum
          if (dot >= 0L) want |= (1 << k)
        }
        assert(bands(t) == want, s"id $id band $t")
        assert(bands(t) >= 0 && bands(t) < 64)
      }
    }
    // a NON-default operating point (the scale dial): same md5 family,
    // band t = hyperplanes t*b..t*b+b-1 at (l=8, b=9), range 2^9
    val alt = vecs.toDF("id", "a")
      .select(col("id"), graft.GraftFunctions.hyperplaneBands(col("a"), 8, 9).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val wAlt = HyperplaneBands.weightsFor(8 * 9)
    vecs.foreach { case (id, a) =>
      val bands = alt(id)
      assert(bands.length == 8)
      val q = a.map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong)
      (0 until 8).foreach { t =>
        var want = 0
        (0 until 9).foreach { k =>
          val dot = q.indices.map(i =>
            q(i) * wAlt((t * 9 + k) * HyperplaneBucket.MaxDim + i)).sum
          if (dot >= 0L) want |= (1 << k)
        }
        assert(bands(t) == want && bands(t) >= 0 && bands(t) < 512,
          s"id $id alt band $t")
      }
    }
    // invalid operating points fail at construction, not mid-task
    intercept[IllegalArgumentException] {
      graft.GraftFunctions.hyperplaneBands(col("a"), 0, 6)
    }
    intercept[IllegalArgumentException] {
      graft.GraftFunctions.hyperplaneBands(col("a"), 8, 31)
    }
  }

  test("hyperplane buckets are deterministic and 16-bit") {
    val v = randVec(64)
    val spark0 = TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, v), (2L, v)).toDF("id", "vec")
      .select(col("id"), VectorFunctions.hyperplaneBucket(col("vec")).as("b"))
    val buckets = df.collect().map(_.getAs[Int]("b"))
    assert(buckets(0) == buckets(1))
    assert(buckets(0) >= 0 && buckets(0) < 65536)
  }

  test("dot/norm kernels null-propagate on null ELEMENTS, both eval paths") {
    // containsNull arrays previously read representation-dependently:
    // NPE on generic rows, silent 0.0 on unsafe rows. Through parquet so
    // the codegen branch actually runs (a literal constant-folds).
    val spark0 = TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_nulldot").toString + "/v"
    Seq((1L, Seq[Option[Float]](Some(1f), None, Some(3f))),
        (2L, Seq[Option[Float]](Some(1f), Some(2f), Some(3f))))
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
      .write.parquet(dir)
    val df = spark0.read.parquet(dir).select(col("id"),
      org.apache.spark.sql.graftnative.GraftNative.dotProduct(col("v"), col("v")).as("d"),
      org.apache.spark.sql.graftnative.GraftNative.vectorNorm(col("v")).as("n"))
    def run(): Map[Long, (Boolean, Boolean)] =
      df.collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    val gen = run()
    spark0.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = run()
      assert(gen == Map(1L -> (true, true), 2L -> (false, false)), s"codegen: $gen")
      assert(interp == gen, s"interp $interp != codegen $gen")
    } finally spark0.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("TopK rejects non-positive k at construction, not mid-task") {
    intercept[IllegalArgumentException](graft.functions.TopK(0))
    intercept[IllegalArgumentException](graft.functions.TopK(-3))
  }

  test("GeoMean skips SQL NULLs like its exp(avg(ln(x))) oracle") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.{col, udaf}
    val gm = udaf(GeoMean)
    val df = Seq((1, Some(2.0)), (1, None), (1, Some(8.0)), (2, None))
      .toDF("g", "x")
    val got = df.groupBy("g").agg(gm(col("x")).as("gm")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1) - 4.0) < 1e-12, s"nulls not skipped: ${got(1)}")
    assert(got(2).isNaN, "all-null group must be NaN (empty geomean)")
  }

  test("ChunkWindows skips null tokens with concat_ws semantics") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_nullchunk").toString + "/v"
    Seq((1L, Seq[Option[String]](Some("a"), None, Some("b"))))
      .toDF("id", "ws").write.parquet(dir)
    val rows = spark0.read.parquet(dir)
      .select(org.apache.spark.sql.graftnative.GraftNative
        .chunkWindows(col("ws"), 32, 24)) // generator expands to its element schema
      .collect()
    assert(rows.length == 1)
    // chunk text skips the null AND its separator; n_tokens counts the
    // slice width (the composition's size(slice(...)) does too)
    assert(rows(0).getString(1) == "a b", s"got '${rows(0).getString(1)}'")
    assert(rows(0).getInt(2) == 3)
  }
}
