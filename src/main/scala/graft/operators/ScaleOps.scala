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
    * The salt must be deterministic for re-runs: hash of the value row,
    * not rand(). */
  def saltedSum(df: DataFrame, key: Column, value: Column, buckets: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_k", key)
      .withColumn("_v", value)
      .withColumn("_salt", pmod(hash(value), lit(buckets)))
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

  /** Write a frame as a date-partitioned parquet layout (the on-disk shape
    * a 100 TB table actually has) and return the round-trip reader. Static
    * partition pruning then turns partition predicates into directory
    * pruning — asserted in ScaleOpsSpec. */
  def writePartitioned(df: DataFrame, dir: String, partitionCol: String): DataFrame = {
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(dir)
    df.sparkSession.read.parquet(dir)
  }
}
