package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Product quantization (PQ) + asymmetric-distance (ADC) search — the
  * third ANN scale path next to the hyperplane-LSH and IVF variants.
  *
  * PQ splits each 64-dim embedding into 16 contiguous 4-dim subvectors
  * and learns a 16-centroid codebook per subspace; a vector is stored as
  * 16 4-bit codes (8 B) instead of 64 floats (256 B) — a 32× compression
  * of the candidate-scan payload. ADC scores a query against the CODES:
  * per query, a 16×16 table of exact subspace distances to every
  * centroid is precomputed, and each database vector's approximate
  * squared L2 distance is the sum of 16 table lookups. The ADC scan
  * SHORTLISTS (top-40 here); the graded answer re-ranks the shortlist
  * at full precision — the two-stage shape every production PQ system
  * uses, because ADC error is a shortlist-recall problem, not a final-
  * ranking problem.
  *
  * 100 TB shape: the codebook is O(M·K·subdim) — constant, broadcast.
  * Encoding is a map-only pass (16 nearest-centroid assignments per
  * vector). The ADC scan is codes ⋈ broadcast(distance table) on
  * (sub_idx, code) — a broadcast hash join, never a shuffle of the
  * corpus — followed by one (query_id, vec_id) hash aggregation with
  * map-side partial sums. The exact re-rank touches only |Q|×40 rows.
  * Queries are processed in bounded batches so the distance table stays
  * broadcast-sized.
  *
  * No DuckDB oracle (KMeans-codebook specific); the graded entry is
  * backed by NoOracleKeysSpec: recall@10 vs the exact brute-force L2
  * top-10, rank/shape invariants, and exactness of the re-ranked
  * distances.
  */
object PqOps {
  type Q = (SparkSession, String) => DataFrame

  val NumSub = 16
  val SubDim = 4
  val K = 16
  val Shortlist = 40

  /** Codebooks are an INDEX — trained once per (session, corpus) like the
    * shingle/IVF memos, queried many times. Models are driver-local
    * objects of constant size (8 × 16 × 8 doubles). */
  private val modelMemo =
    new graft.tools.LruMemo[(String, String), Seq[KMeansModel]](8)
  private val codesMemo =
    new graft.tools.LruMemo[(String, String), DataFrame](8)

  private def sid(s: SparkSession): String =
    org.apache.spark.sql.graftnative.SessionIds.uuid(s)

  private def subFeatures(e: DataFrame, m: Int) =
    e.select(col("vec_id"),
      array_to_vector(slice(col("embedding"), m * SubDim + 1, SubDim)).as("features"))

  private def models(s: SparkSession, d: String): Seq[KMeansModel] =
    modelMemo.get((sid(s), d)) {
      // cache: each of the 8 fits re-scans its input every iteration
      val base = Tables.load(s, d, "embeddings")
        .select("vec_id", "embedding").cache()
      try {
        (0 until NumSub).map { m =>
          // maxIter 4, random init: like the IVF lists, PQ needs stable
          // ASSIGNMENTS, not converged centroids; seed offset per
          // subspace so codebooks are independent
          new KMeans().setK(K).setSeed(graft.ml.MlPipelines.Seed + m)
            .setMaxIter(4).setInitMode("random")
            .setFeaturesCol("features")
            .fit(subFeatures(base, m))
        }
      } finally base.unpersist()
    }

  /** PQ-encoded corpus in the exploded (vec_id, sub_idx, code) layout the
    * ADC join consumes directly — n×8 rows, each code in [0, 16). */
  def pqCodes(s: SparkSession, d: String): DataFrame =
    codesMemo.get((sid(s), d)) {
      val base = Tables.load(s, d, "embeddings")
      models(s, d).zipWithIndex.map { case (m, i) =>
        m.transform(subFeatures(base, i))
          .select(col("vec_id"), lit(i).as("sub_idx"),
            col("prediction").as("code"))
      }.reduce(_ union _).localCheckpoint(true)
    }

  /** The trained codebook as a broadcastable frame (8 × 16 rows). The
    * centers live in the driver-side models — materializing them is
    * O(M·K·subdim), not a scan. */
  def pqCentroids(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    models(s, d).zipWithIndex.flatMap { case (m, i) =>
      m.clusterCenters.zipWithIndex.map { case (c, k) => (i, k, c.toArray) }
    }.toDF("sub_idx", "code", "cvec")
  }

  /** Graded entry: PQ-ADC shortlist (top-[[Shortlist]] by approximate
    * distance) → exact re-rank, top-10 per query for the same bounded
    * query set llm_knn_queries uses (vec_id ≤ 4). Plan: two broadcast
    * hash joins build the shortlist (query subvectors ⋈ codebook on
    * sub_idx; codes ⋈ distance table on (sub_idx, code)) + one hash
    * aggregation; the exact stage joins only the |Q|×40 shortlist rows
    * back to their full vectors — the corpus is never shuffled pairwise
    * and never compared pairwise at full precision. */
  def embPqAdc(s: SparkSession, d: String): DataFrame = {
    val codes = pqCodes(s, d)
    val emb = Tables.load(s, d, "embeddings")
    // query subvectors, widened to double once so the distance arithmetic
    // below is pure double (same discipline as the cosine kernels)
    val qsub = emb
      .filter(col("vec_id") <= 4)
      .select(col("vec_id").as("query_id"),
        posexplode(expr(
          s"transform(sequence(0, ${NumSub - 1}), " +
            s"m -> transform(slice(embedding, m * $SubDim + 1, $SubDim), x -> cast(x as double)))")))
      .withColumnRenamed("pos", "sub_idx")
      .withColumnRenamed("col", "qsub")
    // per-query distance table: |Q| × 16 × 16 rows — broadcast-sized by
    // construction (the query batch is bounded)
    val dist = qsub.join(broadcast(pqCentroids(s, d)), "sub_idx")
      .select(col("query_id"), col("sub_idx"), col("code"),
        expr("aggregate(zip_with(qsub, cvec, (x, y) -> (x - y) * (x - y)), 0D, (a, v) -> a + v)")
          .as("d2"))
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc_d2").asc, col("neighbor_id"))
    val shortlist = codes.join(broadcast(dist), Seq("sub_idx", "code"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum("d2").as("adc_d2"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= Shortlist)
    // exact re-rank of the shortlist only: both vector joins are equi on
    // vec_id; the query side is |Q| rows → broadcast
    val qv = emb.filter(col("vec_id") <= 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val nv = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("n_vec"))
    val wExact = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("l2_d2").asc, col("neighbor_id"))
    shortlist
      .join(broadcast(qv), "query_id")
      .join(nv, "neighbor_id")
      .withColumn("l2_d2", round(expr(
        "aggregate(zip_with(q_vec, n_vec, (x, y) -> (cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), 0D, (a, v) -> a + v)"), 4))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= 10)
      .select("query_id", "rank", "neighbor_id", "l2_d2")
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, Q] = Map(
    "emb_pq_adc" -> (embPqAdc _))

  /** KMeans-codebook specific — no SQL oracle; see NoOracleKeysSpec. */
  val oracles: Map[String, String] = Map.empty
}
