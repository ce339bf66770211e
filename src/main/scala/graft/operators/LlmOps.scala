package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{GeoMean, VectorFunctions}
import graft.GraftFunctions

/** LLM-training-data-pipeline operators (SURVEY.md §2.K): dedup, similarity
  * search, multimodal columns, text analysis, plus the UDF/UDAF/UDTF
  * surface.
  *
  * 100 TB notes per op group:
  * - exact dedup: hash-partition on the content hash — one shuffle, no
  *   pairwise work, arbitrarily wide.
  * - near-dup / ANN: brute-force O(n²) is only for bounded candidate sets;
  *   the scale path is banded MinHash-LSH / hyperplane buckets so pairwise
  *   comparison happens within buckets (LlmExtraOps + MlOps).
  * - text stats/filters: embarrassingly parallel projections + one
  *   aggregation; all codegen'd built-ins, no UDFs in those paths.
  */
object LlmOps {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Core exact-dedup: content-hash groups with deterministic survivor. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("survivor_id"), count(lit(1)).as("n_dups"))

  /** K1: exact text dedup — content hash, survivor = min doc_id per hash.
    * Fixtures carry no exact duplicates (verified), so output ≅ input;
    * constructed-duplicate behavior is unit-tested. */
  def llmDedupExact(s: SparkSession, d: String): DataFrame =
    dedupExact(t(s, d, "documents")).orderBy("survivor_id")

  /** K3: global top-20 most-similar embedding pairs, exact brute-force
    * cosine via the distributed block-nested-loop join
    * (VectorFunctions.cosinePairsDistributed — no driver collect; the
    * UDF-join form materialized 2M joined rows and ran ~4 s at sf0.1; the
    * SQL HOF form was 36.7 s, SURVEY.md §6). Similarity rounded to 4 dp
    * before the top-k ordering so selection is deterministic cross-engine.
    * Exact global top-k is inherently O(n²); past ~10⁵ vectors use the
    * bucketed annLshTopk / annIvfTopk instead. */
  def llmCosineTopk(s: SparkSession, d: String): DataFrame =
    // top-k PUSHED INTO the pair tasks (each block-pair group emits only
    // its local best 20 under the final order — property-tested equal to
    // the all-pairs orderBy/limit spelling): the previous form
    // materialized and globally sorted the full O(n²) rounded pair set
    // for the same 20-row answer
    VectorFunctions.cosineTopKDistributed(s, t(s, d, "embeddings"), 20)
      .orderBy(col("sim").desc, col("a_id"), col("b_id"))
      .limit(20)

  /** K4: 3 nearest neighbors (cosine) for query vectors 0–4 — window top-k
    * per query over the brute-force candidate set. */
  def llmKnnQueries(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"),
        GraftFunctions.vectorNorm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") <= 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"), col("nrm").as("q_nrm"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("n_vec"), col("nrm").as("n_nrm"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosineSimPrecomputed(col("q_vec"), col("n_vec"),
          col("q_nrm"), col("n_nrm")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("query_id", "rank", "neighbor_id", "sim")
      .orderBy("query_id", "rank")
  }

  /** K5: corpus stats per (lang, source) + n_chars==length(text) sanity. */
  def llmTextStats(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("n_chars"), 4).as("avg_chars"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"),
        bool_and(col("n_chars") === length(col("text")).cast("long")).as("len_ok"))
      .orderBy("lang", "source")

  /** K6: quality filter — length band, language whitelist, word count. */
  /** THE K6 quality-gate predicate — one copy for the graded filter, the
    * e2e pipeline's filter stage, and the observed-metrics twin
    * (LlmCorpusOps), so the corpus-wide definition of "passes the gate"
    * cannot drift between them again (round 8 repaired exactly that:
    * two inline copies had lost the language whitelist). */
  def qualityGate: org.apache.spark.sql.Column =
    col("n_chars").between(100, 500) &&
      col("lang").isin("en", "fr", "de") &&
      size(split(col("text"), " ")) >= 20

  def llmQualityFilter(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .filter(qualityGate)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(split(col("text"), " ")).as("word_cnt"))
      .orderBy("doc_id")

  /** K7: multimodal join — text metadata + embedding vector as one nested
    * struct column in the engine API; graded flat (nested parquet vs DuckDB
    * struct equality is avoidable — SURVEY.md §2.K7). */
  def llmMultimodalJoin(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .join(t(s, d, "embeddings"), col("doc_id") === col("vec_id"))
      .withColumn("media", struct(col("lang"), col("n_chars"), col("embedding")))
      .select(col("doc_id"), col("media.lang").as("lang"),
        col("media.n_chars").as("n_chars"),
        size(col("media.embedding")).as("dim"),
        round(element_at(col("media.embedding"), 1).cast("double"), 6).as("e1"))
      .orderBy("doc_id")

  /** K8: UDTF/generator surface — explode tokens, top-25 by count. */
  def udtfTopTokens(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(explode(split(lower(col("text")), "\\W+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(25)

  /** K9: typed UDAF surface — geometric mean of l_quantity per returnflag
    * via Aggregator[Double,(ΣlnX,n),Double] (portable oracle exp(avg(ln)))). */
  def udafGeomean(s: SparkSession, d: String): DataFrame = {
    val geomean = udaf(GeoMean)
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(geomean(col("l_quantity")), 6).as("geo_qty"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, Q] = Map(
    "llm_dedup_exact" -> (llmDedupExact _),
    "llm_cosine_topk" -> (llmCosineTopk _),
    "llm_knn_queries" -> (llmKnnQueries _),
    "llm_text_stats" -> (llmTextStats _),
    "llm_quality_filter" -> (llmQualityFilter _),
    "llm_multimodal_join" -> (llmMultimodalJoin _),
    "udtf_top_tokens" -> (udtfTopTokens _),
    "udaf_geomean" -> (udafGeomean _),
  )

  val oracles: Map[String, String] = Map(
    "llm_dedup_exact" ->
      "SELECT md5(text) AS h, min(doc_id) AS survivor_id, count(*) AS n_dups FROM documents GROUP BY md5(text) ORDER BY survivor_id",
    "llm_cosine_topk" ->
      "SELECT a.vec_id AS a_id, b.vec_id AS b_id, round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS sim FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id ORDER BY sim DESC, a_id, b_id LIMIT 20",
    "llm_knn_queries" ->
      "SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) AS sim, row_number() OVER (PARTITION BY q.vec_id ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) DESC, c.vec_id) AS rank FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id WHERE q.vec_id <= 4) WHERE rank <= 3 ORDER BY query_id, rank",
    "llm_text_stats" ->
      "SELECT lang, source, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars, min(n_chars) AS min_chars, max(n_chars) AS max_chars, bool_and(n_chars = length(text)) AS len_ok FROM documents GROUP BY lang, source ORDER BY lang, source",
    "llm_quality_filter" ->
      "SELECT doc_id, lang, n_chars, CAST(len(string_split(text, ' ')) AS INTEGER) AS word_cnt FROM documents WHERE n_chars BETWEEN 100 AND 500 AND lang IN ('en','fr','de') AND len(string_split(text, ' ')) >= 20 ORDER BY doc_id",
    "llm_multimodal_join" ->
      "SELECT doc_id, lang, n_chars, CAST(len(embedding) AS INTEGER) AS dim, round(CAST(embedding[1] AS DOUBLE), 6) AS e1 FROM documents JOIN embeddings ON doc_id = vec_id ORDER BY doc_id",
    "udtf_top_tokens" ->
      "SELECT tok, count(*) AS cnt FROM (SELECT unnest(string_split_regex(lower(text), '\\W+')) AS tok FROM documents) WHERE tok <> '' GROUP BY tok ORDER BY cnt DESC, tok LIMIT 25",
    "udaf_geomean" ->
      "SELECT l_returnflag, round(exp(avg(ln(l_quantity))), 6) AS geo_qty FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
  )
}
