package graft.operators

import org.apache.spark.ml.feature._
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MLlib pipeline surface (SURVEY.md §2.J) — the reference's own category.
  * Deterministic feature transforms carry DuckDB oracles (J1–J4); trained
  * models are seeded and threshold-tested in MlPipelinesSpec (equality
  * across implementations is never promised — SURVEY.md §7.4.3).
  *
  * 100 TB notes: all transformers here are row-local projections (tokenize,
  * stopwords, scale) — embarrassingly parallel, no shuffle beyond the fit
  * statistics (StringIndexer = one count-distinct job; StandardScaler = one
  * treeAggregate). Model coefficients broadcast to executors on transform.
  */
object MlOps {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Shared tokenizer: lowercase, split on non-word runs, empties dropped
    * (minTokenLength=1). The corpus-wide token definition (SURVEY.md §2.J1).
    *
    * LOCALE HAZARD, documented: RegexTokenizer's setToLowercase uses the
    * JVM-default-locale String.toLowerCase while the DuckDB oracle's
    * lower() is locale-free — on a Turkish-locale JVM "I" lowercases to
    * dotless 'ı' and the J1/J2 oracles mismatch. RegexTokenizer offers no
    * Locale.ROOT hook, so EngineSurfaceSpec carries a canary that fails
    * fast with this explanation on such a JVM. */
  def tokenizer(inputCol: String = "text", outputCol: String = "toks"): RegexTokenizer =
    new RegexTokenizer().setInputCol(inputCol).setOutputCol(outputCol)
      .setPattern("\\W+").setGaps(true).setToLowercase(true).setMinTokenLength(1)

  /** J1: regex tokenization, re-joined with spaces for comparability. */
  def mlTokenize(s: SparkSession, d: String): DataFrame =
    tokenizer().transform(t(s, d, "documents"))
      .select(col("doc_id"), concat_ws(" ", col("toks")).as("toks"))
      .orderBy("doc_id")

  /** THE pinned stopword list — one copy for the graded J2 op, its
    * oracle, and the J8 classifier pipeline (MlPipelines), so the
    * corpus-wide stopword definition cannot drift between them. */
  val PinnedStopwords: Array[String] = Array("the", "a", "of")

  /** J2: stopword removal with a pinned custom list (the library default
    * list would make the oracle library-versioned — always pin). */
  def mlStopwords(s: SparkSession, d: String): DataFrame = {
    val remover = new StopWordsRemover().setInputCol("toks").setOutputCol("kept")
      .setStopWords(PinnedStopwords).setCaseSensitive(true)
    remover.transform(tokenizer().transform(t(s, d, "documents")))
      .select(col("doc_id"), concat_ws(" ", col("kept")).as("kept"))
      .orderBy("doc_id")
  }

  /** J3: StringIndexer label mapping (frequencyDesc, ties alphabetical —
    * Spark 3+ semantics). Output is the fitted model's label table. */
  def mlStringIndexer(s: SparkSession, d: String): DataFrame = {
    val model = new StringIndexer().setInputCol("event_type").setOutputCol("idx")
      .setStringOrderType("frequencyDesc")
      .fit(t(s, d, "events"))
    import s.implicits._
    model.labelsArray(0).zipWithIndex.toSeq
      .toDF("event_type", "idx")
      .orderBy("idx")
  }

  /** J4: standard score of c_acctbal via VectorAssembler → StandardScaler
    * (withMean, sample stddev — matches SQL stddev_samp). */
  def mlScaler(s: SparkSession, d: String): DataFrame = {
    val assembled = new VectorAssembler().setInputCols(Array("c_acctbal"))
      .setOutputCol("feat").transform(t(s, d, "customer"))
    val scaler = new StandardScaler().setInputCol("feat").setOutputCol("scaled")
      .setWithMean(true).setWithStd(true).fit(assembled)
    scaler.transform(assembled)
      .select(col("c_custkey"),
        round(element_at(vector_to_array(col("scaled")), 1), 6).as("z"))
      .orderBy("c_custkey")
  }

  /** J4b: min-max scaling of c_acctbal to [0,1] — deterministic math,
    * portable oracle. */
  def mlMinmax(s: SparkSession, d: String): DataFrame = {
    val assembled = new VectorAssembler().setInputCols(Array("c_acctbal"))
      .setOutputCol("feat").transform(t(s, d, "customer"))
    val scaler = new MinMaxScaler().setInputCol("feat").setOutputCol("scaled")
      .fit(assembled)
    scaler.transform(assembled)
      .select(col("c_custkey"),
        round(element_at(vector_to_array(col("scaled")), 1), 6).as("z"))
      .orderBy("c_custkey")
  }

  /** J4c: Bucketizer over pinned split points (left-closed buckets). */
  def mlBucketize(s: SparkSession, d: String): DataFrame = {
    val buck = new Bucketizer().setInputCol("c_acctbal").setOutputCol("bucket")
      .setSplits(Array(Double.NegativeInfinity, 0.0, 1000.0, 5000.0, Double.PositiveInfinity))
    buck.transform(t(s, d, "customer"))
      .select(col("c_custkey"), col("c_acctbal"), col("bucket").cast("int").as("bucket"))
      .orderBy("c_custkey")
  }

  /** J4d: mean imputation — NULLs (manufactured: negative balances) filled
    * with the mean of the surviving values via MLlib Imputer. */
  def mlImputer(s: SparkSession, d: String): DataFrame = {
    val withNulls = t(s, d, "customer")
      .withColumn("bal", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
    val imputer = new org.apache.spark.ml.feature.Imputer()
      .setInputCol("bal").setOutputCol("bal_imp").setStrategy("mean")
      .fit(withNulls)
    imputer.transform(withNulls)
      .select(col("c_custkey"), col("bal").isNull.as("was_null"),
        round(col("bal_imp"), 4).as("bal_imp"))
      .orderBy("c_custkey")
  }

  /** J4e: L2 normalization of the embedding vector via MLlib Normalizer;
    * graded on the first two normalized components. */
  def mlNormalizer(s: SparkSession, d: String): DataFrame = {
    val vecs = t(s, d, "embeddings")
      .withColumn("features", org.apache.spark.ml.functions.array_to_vector(col("embedding")))
    val norm = new org.apache.spark.ml.feature.Normalizer()
      .setInputCol("features").setOutputCol("unit").setP(2.0)
    norm.transform(vecs)
      .select(col("vec_id"),
        round(element_at(vector_to_array(col("unit")), 1), 6).as("u1"),
        round(element_at(vector_to_array(col("unit")), 2), 6).as("u2"))
      .orderBy("vec_id")
  }

  /** J4f: ml.stat Summarizer — elementwise mean of the embedding vectors
    * (one treeAggregate job), emitted one row per dimension. The mean
    * vector is a model-sized driver value (64 doubles), like any fitted
    * transformer's params. */
  def mlSummarizer(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.stat.Summarizer
    val vecs = t(s, d, "embeddings")
      .withColumn("features", org.apache.spark.ml.functions.array_to_vector(col("embedding")))
    val mean = vecs.select(Summarizer.mean(col("features")).as("m")).head()
      .getAs[org.apache.spark.ml.linalg.Vector]("m")
    import s.implicits._
    mean.toArray.zipWithIndex
      .map { case (m, i) => (i + 1, BigDecimal(m).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toSeq.toDF("pos", "mean")
      .orderBy("pos")
  }

  /** Smoothed target encoding of a categorical feature — the standard
    * tabular-ML replacement for one-hot on high-cardinality columns:
    * enc(c) = (Σ_c y + m·prior) / (n_c + m) with prior = the global
    * target mean and m = 20 pseudo-observations. Computed as one exact
    * integer ratio, enc = (Σ_c·N + m·S) / (N·(n_c + m)) with all four
    * moments exact BIGINT cents/counts and the products in
    * DECIMAL(38,0) (Σ·N reaches ~10²⁵ at warehouse scale — the
    * agg_regression_multi overflow discipline); ONE mirrored IEEE
    * division, 6 dp rounding. The oracle rides HUGEINT with the
    * VARCHAR→DOUBLE bridge (DuckDB's HUGEINT→DOUBLE cast is not
    * correctly rounded; VARCHAR→DOUBLE is).
    *
    * Scale: one hash aggregation to the category grain plus a 1-row
    * global-moments branch broadcast into the arithmetic — the same
    * shape fitted encoders ship as "fit statistics"; transform is then
    * a broadcast map-side join of this table. */
  def mlTargetEncode(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders").select(col("o_orderpriority").as("cat"),
      floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"))
    val per = o.groupBy("cat").agg(count(lit(1)).as("n"), sum("c").as("sum_c"))
    val gl = o.agg(count(lit(1)).as("gn"), sum("c").as("gs"))
    val num = (col("sum_c").cast("decimal(19,0)") * col("gn").cast("decimal(19,0)") +
      lit(20).cast("decimal(19,0)") * col("gs").cast("decimal(19,0)")).cast("decimal(38,0)")
    val den = (col("gn").cast("decimal(19,0)") *
      (col("n") + 20).cast("decimal(19,0)")).cast("decimal(38,0)")
    per.crossJoin(broadcast(gl))
      .select(col("cat"), col("n"), col("sum_c"),
        (floor(num.cast("double") / den.cast("double") * 1000000.0 + 0.5) / 1000000.0)
          .as("enc_c"))
      .orderBy("cat")
  }

  val queries: Map[String, Q] = Map(
    "ml_target_encode" -> (mlTargetEncode _),
    "ml_tokenize" -> (mlTokenize _),
    "ml_summarizer" -> (mlSummarizer _),
    "ml_stopwords" -> (mlStopwords _),
    "ml_string_indexer" -> (mlStringIndexer _),
    "ml_scaler" -> (mlScaler _),
    "ml_minmax" -> (mlMinmax _),
    "ml_bucketize" -> (mlBucketize _),
    "ml_imputer" -> (mlImputer _),
    "ml_normalizer" -> (mlNormalizer _),
  )

  val oracles: Map[String, String] = Map(
    // exact integer moments; HUGEINT products with the VARCHAR→DOUBLE
    // bridge on both division operands (HUGEINT→DOUBLE mis-rounds)
    "ml_target_encode" ->
      ("WITH o AS (SELECT o_orderpriority AS cat, " +
        "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c FROM orders), " +
        "per AS (SELECT cat, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sum_c " +
        "FROM o GROUP BY 1), " +
        "gl AS (SELECT CAST(count(*) AS BIGINT) AS gn, CAST(sum(c) AS BIGINT) AS gs FROM o) " +
        "SELECT cat, n, sum_c, " +
        "floor(CAST(CAST(CAST(sum_c AS HUGEINT) * gn + 20 * CAST(gs AS HUGEINT) AS VARCHAR) AS DOUBLE) / " +
        "CAST(CAST(CAST(gn AS HUGEINT) * (n + 20) AS VARCHAR) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS enc_c " +
        "FROM per, gl ORDER BY cat"),
    "ml_tokenize" ->
      "SELECT doc_id, array_to_string(list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> ''), ' ') AS toks FROM documents ORDER BY doc_id",
    "ml_stopwords" ->
      "SELECT doc_id, array_to_string(list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '' AND x NOT IN ('the','a','of')), ' ') AS kept FROM documents ORDER BY doc_id",
    "ml_string_indexer" ->
      "SELECT event_type, CAST(row_number() OVER (ORDER BY cnt DESC, event_type) - 1 AS INTEGER) AS idx FROM (SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type) ORDER BY idx",
    "ml_scaler" ->
      "SELECT c_custkey, round((c_acctbal - avg(c_acctbal) OVER ()) / stddev_samp(c_acctbal) OVER (), 6) AS z FROM customer ORDER BY c_custkey",
    "ml_minmax" ->
      "SELECT c_custkey, round((c_acctbal - min(c_acctbal) OVER ()) / (max(c_acctbal) OVER () - min(c_acctbal) OVER ()), 6) AS z FROM customer ORDER BY c_custkey",
    "ml_bucketize" ->
      "SELECT c_custkey, c_acctbal, CASE WHEN c_acctbal < 0.0 THEN 0 WHEN c_acctbal < 1000.0 THEN 1 WHEN c_acctbal < 5000.0 THEN 2 ELSE 3 END AS bucket FROM customer ORDER BY c_custkey",
    "ml_imputer" ->
      ("WITH w AS (SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal FROM customer) " +
        "SELECT c_custkey, (bal IS NULL) AS was_null, round(coalesce(bal, avg(bal) OVER ()), 4) AS bal_imp FROM w ORDER BY c_custkey"),
    "ml_normalizer" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e) " +
        "SELECT vec_id, round(v[1] / nrm, 6) AS u1, round(v[2] / nrm, 6) AS u2 FROM n ORDER BY vec_id"),
    "ml_summarizer" ->
      ("WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "x AS (SELECT unnest(generate_series(1, 64)) AS pos, v FROM e) " +
        "SELECT CAST(pos AS INTEGER) AS pos, round(avg(v[pos]), 4) AS mean FROM x GROUP BY pos ORDER BY pos"),
  )
}
