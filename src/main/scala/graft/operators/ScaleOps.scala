package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale techniques as reusable library code — the pieces that matter at
  * 100 TB but need no oracle (they must be result-equivalent to their
  * naive forms, which the specs assert).
  */
object ScaleOps {

  /** Salted two-phase aggregation for skewed keys: spread each hot key
    * across `buckets` sub-keys, partially aggregate, then combine. The
    * result equals a plain groupBy-sum (up to FP association); the win is
    * that no single reducer owns a hot key's entire volume. AQE's skew
    * handling covers joins; salting is the aggregation-side analogue.
    *
    * The salt must be deterministic for re-runs (hash, never rand()) and
    * must come from a column that actually VARIES within a hot key —
    * `saltSource` is explicit, like [[saltedJoin]]'s, because salting on
    * the aggregated value alone is a silent no-op when the hot key's
    * values are constant or low-cardinality (hash(const) is one bucket:
    * the exact single-reducer straggler this function exists to remove).
    * Pass a row id / event id; defaulting to the value column is only
    * safe when the value is high-cardinality. */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltSource: Column,
                buckets: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_k", key)
      .withColumn("_v", value)
      .withColumn("_salt", pmod(hash(saltSource), lit(buckets)))
    salted
      .groupBy(col("_k"), col("_salt"))
      .agg(sum(col("_v")).as("_partial"))
      .groupBy(col("_k"))
      .agg(sum(col("_partial")).as("sum_v"))
      .withColumnRenamed("_k", "key")
  }

  /** Salted skewed JOIN: when one fact key dominates, the single reducer
    * owning it becomes the stage's straggler. Replicate the (small) build
    * side `buckets` times — one copy per salt — and give each fact row a
    * deterministic salt, so the hot key's rows spread over `buckets`
    * reducers while still meeting a matching build row. Result ≡ the
    * plain equi-join (every (key, salt) pair exists on the build side).
    * AQE's skew-join split handles sort-merge joins after the fact; the
    * salt handles it by construction and also covers the shuffle-hash
    * path. The fact salt must be DETERMINISTIC (hash of stable columns,
    * never rand()) or retried tasks see different data. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                 saltSource: Column, buckets: Int = 8): DataFrame = {
    val saltedDim = dim.crossJoin(
      dim.sparkSession.range(0, buckets).select(col("id").cast("int").as("_salt")))
    val saltedFact = fact.withColumn("_salt", pmod(hash(saltSource), lit(buckets)))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) && saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }

  /** Big-big PURE range self-join (no equi key) via interval binning — the
    * technique that turns an O(n²) nested-loop plan into a hash join. Each
    * row lands in bin floor(ts/W); the probe side is replicated into its
    * bin and both neighbors, so every pair with |t_a − t_b| ≤ W shares
    * exactly one bin key (|bin_a − bin_b| ≤ 1 and the build row appears
    * once per offset). The residual |Δt| ≤ W filter runs post-join. At
    * 100 TB the shuffle is uniform in event-time density — no reducer owns
    * more than ~3 windows of data — where the naive theta join is a
    * cartesian product. Returns (a_id, b_id, dt_us) with a_id < b_id;
    * binning uses integral `div`, so bin edges are exact (no FP floor). */
  def rangePairsBinned(df: DataFrame, idCol: String, tsCol: String, windowUs: Long): DataFrame = {
    // div 0 yields NULL bins and a plausible-looking EMPTY join — fail
    // loudly on the unit mix-up instead (this is a scalar check, not a
    // data scan, so the builder stays declarative)
    require(windowUs > 0, s"rangePairsBinned: windowUs must be positive, got $windowUs")
    val a = df.select(col(idCol).as("a_id"), col(tsCol).as("a_us"))
      .withColumn("bin", expr(s"a_us div ${windowUs}L"))
    val b = df.select(col(idCol).as("b_id"), col(tsCol).as("b_us"))
      .withColumn("bin", explode(array((-1 to 1).map(k =>
        expr(s"b_us div ${windowUs}L") + lit(k.toLong)): _*)))
    a.join(b, "bin")
      .filter(col("a_id") < col("b_id") && abs(col("b_us") - col("a_us")) <= windowUs)
      .select(col("a_id"), col("b_id"), abs(col("b_us") - col("a_us")).as("dt_us"))
  }

  /** Morton (Z-order) key: interleave the low `bits` bits of two
    * non-negative integer columns — bit i of x lands at position 2i, bit i
    * of y at 2i+1. Rows sorted by z cluster BOTH dimensions: any query box
    * over (x, y) touches a bounded run of z-values, so a z-sorted file
    * layout gives multi-column data skipping where a single-column sort
    * helps only its own column. 21+21 bits stay inside a long; the
    * expression is pure integer codegen (no UDF). */
  def zValue(x: Column, y: Column, bits: Int = 21): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** DuckDB twin of [[zValue]] for oracle SQL. */
  def zSql(x: String, y: String, bits: Int = 21): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) * ${1L << (2 * i)})",
      s"((($y >> $i) & 1) * ${1L << (2 * i + 1)})")).mkString(" + ")

  /** Write a frame clustered by the z-order of two columns: range-
    * partition on z (so files own disjoint z-ranges) and sort inside each
    * file. This is the layout step a table format's OPTIMIZE ZORDER BY
    * performs; with per-file min/max stats it turns 2-D predicate boxes
    * into file-level skipping. */
  def writeZOrdered(df: DataFrame, dir: String, x: Column, y: Column, files: Int = 8): DataFrame = {
    df.withColumn("_z", zValue(x, y))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(dir)
    df.sparkSession.read.parquet(dir)
  }

  /** Write a frame as a date-partitioned parquet layout (the on-disk shape
    * a 100 TB table actually has) and return the round-trip reader. Static
    * partition pruning then turns partition predicates into directory
    * pruning — asserted in ScaleOpsSpec. */
  def writePartitioned(df: DataFrame, dir: String, partitionCol: String): DataFrame = {
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(dir)
    df.sparkSession.read.parquet(dir)
  }
}
