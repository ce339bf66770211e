package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-preparation operators rounding out the LLM training-data
  * pipeline: context-window packing, text normalization, n-gram vocab
  * statistics, and prefix-based dedup (the cheap URL/boilerplate family
  * complementing exact / MinHash / SimHash / embedding dedup).
  *
  * Every op here is a row-local projection or a single 2-phase
  * aggregation — the embarrassingly-parallel end of the pipeline; all
  * carry DuckDB oracles.
  */
object LlmCorpusOps {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Stage memo for this family's checkpointed derived tables (the
    * TF/postings table). Registered with MemoRegistry so Bench's
    * family-boundary release frees the checkpoint blocks eagerly —
    * before this, each llm_tfidf_cosine run pinned its TF blocks until
    * the ContextCleaner happened to notice the GC'd RDD (the same
    * pattern CheckpointRelease was written to fix). */
  private val stageMemo =
    graft.tools.LruMemo.checkpointed[(String, String, String)](64, "corpus_stage")

  private def memo(s: SparkSession, d: String, tag: String)(build: => DataFrame): DataFrame = {
    val sid = org.apache.spark.sql.graftnative.SessionIds.uuid(s)
    stageMemo.getAs(tag, (sid, d, tag))(build.localCheckpoint(true))
  }

  /** THE canonical normalization expression — one definition shared by
    * llm_normalize_text and the e2e pipeline so their semantics cannot
    * drift apart: lowercase, strip non-alphanumeric (keeping spaces),
    * collapse runs of spaces, trim. */
  private[operators] val normExpr =
    trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))

  /** 512-token contiguous-fill packing over any (doc_id, source, text)
    * frame — shared by llm_pack_sequences and the e2e pipeline.
    *
    * The per-source token prefix sum rides
    * [[ScalePrimitives.distRunningBy]] (parallel range sort in (source,
    * doc_id) order; per-source carry-in offsets recovered from bounded
    * per-partition suffix partials) instead of a window partitioned by
    * `source` — the window form put each source's ENTIRE stream into one
    * task, so a corpus dominated by a few big sources serialized at any
    * scale. Token counts are exact longs, so bins are bit-identical. */
  def packBins(docs: DataFrame): DataFrame = {
    val toks = docs
      .withColumn("tok", size(split(col("text"), " ")).cast("long"))
      .select(col("doc_id"), col("source"), col("tok"))
    ScalePrimitives.distRunningBy(toks, "source", Seq(col("doc_id")), "__rnk",
        sumCols = Seq("tok"), sumOuts = Seq("cum"))
      .select(col("doc_id"), col("source"), col("tok"),
        floor((col("cum") - col("tok")) / lit(512.0)).cast("int").as("bin"))
  }

  /** Context packing: documents fill 512-token training windows per
    * source, in doc_id order — bin = floor(tokens-before-this-doc / 512),
    * the contiguous-fill packing a sequence-packing pre-step uses. */
  def llmPackSequences(s: SparkSession, d: String): DataFrame =
    packBins(t(s, d, "documents")).orderBy("doc_id")

  /** Canonical text normalization ([[normExpr]]) plus the md5 the
    * normalized-dedup pass keys on. Row-local, no shuffle. */
  def llmNormalizeText(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), length(normExpr).as("norm_len"),
        md5(normExpr.cast("binary")).as("norm_md5"))
      .orderBy("doc_id")

  /** Vocabulary statistics one level above unigrams: top-25 word bigrams
    * by count (tie-break alphabetical). Same explode→count shape as
    * udtf_top_tokens — 2-phase agg, map-side partials. */
  def llmBigramTop(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("ws", split(col("text"), " "))
      // shared shingle builder (n = 2): the short-document count-down
      // guard lives in ONE place, not a hand-copied twin
      .select(explode(expr(LlmTextOps.shinglesSql(2))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(25)

  /** Prefix dedup: documents sharing the same normalized 40-char prefix
    * (the cheap boilerplate/mirror-page catch used before the expensive
    * near-dup passes). Groups with one member are not duplicates and are
    * filtered out; survivor = min doc_id. Single hash aggregation. */
  def llmDedupPrefix(s: SparkSession, d: String): DataFrame =
    prefixDedup(t(s, d, "documents")).orderBy("survivor_id")

  /** Core prefix-dedup over any (doc_id, text) frame — exposed so
    * planted-duplicate tests exercise THIS code. */
  def prefixDedup(docs: DataFrame): DataFrame =
    docs
      .withColumn("prefix", substring(lower(col("text")), 1, 40))
      .groupBy("prefix")
      .agg(min("doc_id").as("survivor_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)

  /** Embedding-quality check: cosine of every vector to its label's
    * centroid (position-wise mean). The centroid table is label-sized
    * (10 rows) — a broadcast; the per-vector cosine is row-local. At
    * 100 TB this is one treeAggregate-shaped pass + a map stage. */
  def llmCentroidSim(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings")
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("centroid"))
    e.join(broadcast(cent), "label")
      .select(col("vec_id"), col("label"),
        round(graft.functions.VectorFunctions.cosineMixed(col("embedding"), col("centroid")), 4).as("sim"))
      .orderBy("vec_id")
  }

  /** Data-mixing stratified sample: per-source keep rates (high-quality
    * sources oversampled) applied via a content-hash threshold — the
    * reproducible form of weighted corpus mixing (a seeded random sample
    * changes with partitioning; the hash sample is a pure projection).
    * Row-local filter, no shuffle; the grade includes per-source kept
    * counts so rate application is checked end-to-end. */
  def llmStratifiedSample(s: SparkSession, d: String): DataFrame = {
    // even-numbered sources are "high quality": keep 80%; others 20%
    val rate = when(regexp_extract(col("source"), "(\\d+)", 1).cast("int") % 2 === 0, 80)
      .otherwise(20)
    t(s, d, "documents")
      .withColumn("bucket",
        (conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10).cast("long") % 100).cast("int"))
      .filter(col("bucket") < rate)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"))
      .orderBy("source")
  }

  /** Deterministic training-shard shuffle: every document routes to one of
    * 16 shards by key hash and is ordered within its shard by the hash —
    * the reproducible global shuffle a training run needs before packing.
    * A seeded rand() permutation changes with partitioning/retries; the
    * hash permutation is a pure function of the key. One shuffle on shard;
    * the position window is per-shard. At 100 TB shard count scales with
    * target file size and the window becomes the shard file's row order. */
  def llmShuffleShards(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("hkey", "doc_id")
    t(s, d, "documents")
      .select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 12), 16, 10)
          .cast("long").as("hkey"))
      .withColumn("shard", (col("hkey") % 16).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select("doc_id", "shard", "pos")
      .orderBy("doc_id")
  }

  /** PII pre-scan: per-document counts of the cheap pattern families a
    * redaction pass routes on — long digit runs (id/phone-like), email-ish
    * tokens, dashed number groups — plus the any-hit flag. Pure
    * regexp_count projections, row-local, no shuffle. */
  def llmPiiScan(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        regexp_count(col("text"), lit("\\d{4,}")).cast("int").as("n_longnum"),
        regexp_count(col("text"), lit("[a-z0-9.]+@[a-z0-9.]+")).cast("int").as("n_emailish"),
        regexp_count(col("text"), lit("\\d{2,3}-\\d{3,4}-\\d{3,4}")).cast("int").as("n_dashed"))
      .withColumn("pii_flag",
        (col("n_longnum") + col("n_emailish") + col("n_dashed")) > 0)
      .orderBy("doc_id")

  /** Repetition quality signal (the Gopher-style top-token share): the
    * most frequent token's share of the document plus the distinct-token
    * count. Explode → two-phase aggregation; partial counts combine
    * map-side, so the shuffle carries (doc, token) partials, not tokens. */
  def llmTopTokenShare(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(round(max("c") / sum("c"), 4).as("top_share"),
        count(lit(1)).as("n_unique"))
      .orderBy("doc_id")

  /** Tokenizer-vocabulary OOV rate: rank the corpus vocabulary by
    * frequency (ties alphabetical), cap it at the top 1000 types, and
    * score each document by the fraction of its tokens falling outside
    * the cap — the coverage check run before committing to a tokenizer
    * vocab size. The global rank runs on the AGGREGATED vocab (metadata-
    * sized: one row per distinct type, like ml_string_indexer), never on
    * the token stream; the capped vocab then broadcasts back onto the
    * stream, so the only fact-sized shuffles are the two keyed aggs. */
  def llmOovRate(s: SparkSession, d: String): DataFrame = {
    val toks = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    // top-1000 via orderBy+limit = TakeOrderedAndProject (per-partition
    // heap, driver merges 1000 rows) — NOT row_number over an empty
    // window, which would sort the whole vocab on one partition; a web
    // corpus's distinct-token count grows with the corpus, so that
    // single-partition sort is a real 100 TB bottleneck. Total order
    // (cnt desc, tok) makes the kept set deterministic.
    val kept = vocab
      .orderBy(col("cnt").desc, col("tok"))
      .limit(1000)
      .select(col("tok"), lit(1).as("iv"))
    toks.join(broadcast(kept), Seq("tok"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", round(col("n_oov") / col("n_toks"), 4))
      .orderBy("doc_id")
  }

  /** Per-document top-3 keywords by TF-IDF — the relational, oracle-graded
    * twin of the MLlib HashingTF→IDF pipeline (J5), with exact term counts
    * instead of hashed buckets. Smoothed idf = ln((N+1)/(df+1)), the MLlib
    * formula, computed identically in the DuckDB oracle; ranking is on the
    * ROUNDED score (6 dp) with an alphabetical tie-break, so both engines
    * compare the same doubles (SURVEY.md §5.3 float discipline).
    *
    * Shuffle budget: two keyed aggregations (doc×term counts, then df per
    * term) + one equi-join of tf against the term-keyed df table + one
    * window per doc_id. The df table is vocabulary-sized (metadata, not
    * corpus) and the global N is a 1-row aggregate joined broadcast-style
    * — the same allowlisted pattern as llm_unigram_logprob. */
  def llmTfidfTopk(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = t(s, d, "documents").agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    tf.join(df, "tok").crossJoin(broadcast(n))
      // floor(x*1e6+0.5)/1e6, NOT round(,6): the score feeds a RANK, and
      // the engines' round() split on representation-boundary doubles
      // (the rolling-slope lesson); scores are >= 0 so the plain form is
      // exact half-up on both engines
      .withColumn("score",
        floor(col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) * 1e6 + 0.5) / 1e6)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("doc_id", "rank", "tok", "tf", "df", "score")
      .orderBy("doc_id", "rank")
  }

  /** BM25 retrieval: score the corpus against a deterministic query set
    * (documents with doc_id % 97 == 0 act as queries; standard
    * query-by-document, the retrieval shape behind RAG corpus curation
    * and hard-negative mining). Okapi BM25 with k1 = 1.2, b = 0.75 and
    * the Lucene idf ln(1 + (N - df + 0.5)/(df + 0.5)) — strictly
    * positive, so scores never cancel. Top-3 hits per query, the query
    * document itself excluded.
    *
    * PLAN, sized for 100 TB: the query-term set is |queries|·|vocab|
    * bounded (metadata scale) and BROADCAST to the postings table — the
    * candidate generation is one broadcast hash join on term, never a
    * shuffle of the corpus; candidates fan out as Σ_{t∈queries} df_t,
    * the same df-governed envelope as the Jaccard posting join. On an
    * open web-scale vocabulary a stop-term df cap (drop terms with
    * df > cap before the join — they contribute ~0 idf anyway, BM25's
    * own justification) bounds the worst term's fan-out; it is NOT
    * active in the graded path because the fixture's closed 31-word
    * vocabulary makes every term common — a cap would gut the corpus
    * rather than trim its boilerplate tail. The df/dl side tables are
    * vocabulary- and corpus-keyed aggregates with map-side partials; the
    * two global scalars (N, avgdl) ride a broadcast 1-row cross join.
    * Ranking windows partition by q_id — |queries| independent heaps.
    *
    * Cross-engine determinism: per-term contributions are pure IEEE
    * arithmetic mirrored token-for-token in the oracle; the per-pair sum
    * is rounded to 4 dp BEFORE ranking so rank order is decided on
    * identical doubles (same discipline as llm_tfidf_cosine). */
  def llmBm25Topk(s: SparkSession, d: String): DataFrame =
    // r15: rank lists nest — the graded top-3 is a rank-prefix filter of
    // the memoized depth-10 fixture rank list the hybrid fusion already
    // builds (the denseBruteTopK pattern applied to the lexical stack),
    // so the |queries|·df candidate expansion + scoring is priced ONCE
    // per (session, corpus) across llm_bm25_topk AND llm_hybrid_rrf.
    // Same scores, same tiebreak, same prefix => bit-identical rows.
    lexFixtureList(s, d).filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("doc_id"), col("score"))
      .orderBy("q_id", "rank")

  /** Parameterized BM25 kernel over any (doc_id, text) frame — the
    * graded key fixes the query predicate; StressCheck drives the same
    * plan at 40× corpus scale with planted exact-duplicate queries.
    * `pin` lets the caller cache the multiply-read TF table. */
  def bm25TopK(docsIn: DataFrame, isQuery: org.apache.spark.sql.Column,
      k: Int, pin: DataFrame => DataFrame = identity): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = pin(docsIn
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf")))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg("dl").as("avgdl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val qterms = tf.filter(isQuery)
      .select(col("doc_id").as("q_id"), col("term")).distinct()
    val contrib =
      log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
        col("tf") * 2.2 /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    // JOIN ORDER IS THE PLAN: df/dl/stats attach to the CORPUS-sized tf
    // table (one row per doc-term) BEFORE the query fan-out, so the
    // |queries|·df candidate expansion is a broadcast hash join feeding
    // straight into map-side partial aggregation in the SAME stage. The
    // first draft fanned out first and joined after — two full shuffles
    // of the expanded candidate set (measured 3.1-3.8 s at sf0.1; this
    // shape ~1 s). At 100 TB the pre-fan-out joins stay linear in the
    // postings table; nothing corpus-scale ever shuffles post-expansion.
    val enriched = tf.join(dfreq, "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
    // floor(x*1e4+0.5)/1e4, not round(,4): Spark's round and DuckDB's
    // split on decimal-boundary doubles (the rolling-slope lesson —
    // AdvancedOps), while the floor form is pure IEEE on both engines.
    // Scores are strictly positive (log(1+x) with x>0), so the unsigned
    // form is safe. Rank is then decided on identical doubles.
    val scored = enriched.join(broadcast(qterms), Seq("term"))
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy("q_id", "doc_id")
      .agg((floor(sum(contrib) * 10000.0 + 0.5) / 10000.0).as("score"))
    // r15 note: a bounded-heap TopK tail (the agg_topk_heap Aggregator)
    // was tried here and MEASURED SLOWER (2.04 vs 1.37 s floor at sf0.1):
    // the ObjectHashAggregate's typed boundary breaks whole-stage codegen
    // around the candidate stage, costing more than the ~|queries|·|docs|
    // row_number exchange saves at this scale. The window stays; the heap
    // posture lives in agg_topk_heap where k ≪ group size actually bites.
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("doc_id"), col("score"))
      .orderBy("q_id", "rank")
  }

  /** Hybrid retrieval fusion — reciprocal-rank fusion (RRF, the
    * Cormack/Clarke k=60 form every RAG curation stack runs) of the
    * engine's two graded retrieval stacks over the SAME query set
    * (documents with doc_id % 97 == 0): lexical BM25 top-10 (the
    * [[bm25TopK]] kernel, sharing the memoized TF table with the graded
    * llm_bm25_topk) and dense cosine top-10 over the aligned embeddings
    * (doc_id ↔ vec_id, the llm_multimodal_join contract). rrf =
    * Σ_stacks 1/(60 + rank) with an absent stack contributing 0 — a doc
    * only one stack surfaces still fuses (the fixture's embeddings cover
    * a subset of the corpus, so partial-stack docs are REAL here, not a
    * theoretical case). Final cut: top-5 per query by (rrf, doc_id).
    *
    * Determinism: ranks are integers; 1/(60+r) is one IEEE division and
    * the two-stack sum is pinned lexical-first, rounded floor-half-up
    * 6 dp BEFORE the final ranking — both mirrored token-for-token in
    * the oracle.
    *
    * Scale: the BM25 side is the graded broadcast-postings plan; the
    * dense side broadcasts the |queries|-sized vector set against the
    * embeddings scan (at 100 TB the dense candidates come from the
    * banded-LSH/IVF index instead of the brute scan — same fusion);
    * fusion itself joins two ≤ |queries|·10 rank lists. */
  /** Per-stack candidate depth of the hybrid fusion — ONE constant for
    * the brute dense list, the BM25 lexical list, the index-served dense
    * list, AND the oracle CTE (interpolated into [[lexTop10Cte]]); a
    * depth change cannot silently fuse asymmetric stacks. */
  private val FusionDepth = 10

  def llmHybridRrf(s: SparkSession, d: String): DataFrame =
    rrfFuse(lexTop10(s, d), denseBruteTopK(s, d, FusionDepth))

  /** The brute-force dense rank list over the fixture query set — the
    * exact per-query cosine ranking both [[llmHybridRrf]]'s dense stack
    * and [[llmRerankRecall]]'s truth frame use (ONE definition, two
    * depths). At 100 TB this is the frame the index replaces; here it
    * doubles as the ground truth the index-served pipeline is graded
    * against. */
  private def denseBruteTopK(s: SparkSession, d: String, k: Int): DataFrame = {
    require(k <= FusionDepth,
      s"denseBruteTopK memoizes the depth-$FusionDepth list; got k=$k")
    // ONE memoized brute pass at the deepest depth used; a shallower k
    // is a rank-prefix filter of the same list (rank lists nest), so the
    // O(|queries|·n) scan is priced once per (session, corpus)
    memo(s, d, "dense_brute")({
      import org.apache.spark.sql.expressions.Window
      val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"),
        graft.GraftFunctions.vectorNorm(col("embedding")).as("nrm"))
      val q = e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("nrm").as("q_nrm"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("doc_id"))
      broadcast(q)
        .join(e.select(col("vec_id").as("doc_id"), col("embedding").as("n_vec"),
          col("nrm").as("n_nrm")), col("q_id") =!= col("doc_id"))
        .select(col("q_id"), col("doc_id"),
          graft.functions.VectorFunctions.cosineSimPrecomputed(
            col("q_vec"), col("n_vec"), col("q_nrm"), col("n_nrm")).as("sim"))
        .withColumn("r_dense", row_number().over(w))
        .filter(col("r_dense") <= FusionDepth)
        .select("q_id", "doc_id", "r_dense")
    }).filter(col("r_dense") <= k)
  }

  /** The BM25 top-[[FusionDepth]] rank list every fusion variant shares —
    * ONE definition of the lexical stack (kernel call, TF memo, r_lex
    * shape), parameterized by the query predicate: the graded keys pass
    * the fixture predicate, the streaming sinks their batch's id set. */
  private def lexTopOn(s: SparkSession, d: String, lexQ: Column): DataFrame =
    bm25TopK(t(s, d, "documents"), lexQ, FusionDepth,
        tf => memo(s, d, "bm25_tf")(tf))
      .select(col("q_id"), col("doc_id"), col("rank").as("r_lex"))

  /** The memoized depth-[[FusionDepth]] BM25 rank list for the FIXTURE
    * query set (doc_id % 97 == 0) — the shared first stage of
    * llm_bm25_topk (rank-prefix 3) and llm_hybrid_rrf's lexical leg,
    * priced once per (session, corpus) like its dense twin
    * [[denseBruteTopK]]. The TF memo stays: the streaming sink's
    * per-batch query sets reuse it through [[lexTopOn]]. */
  private def lexFixtureList(s: SparkSession, d: String): DataFrame =
    memo(s, d, "bm25_lex10")(
      bm25TopK(t(s, d, "documents"), col("doc_id") % 97 === 0, FusionDepth,
        tf => memo(s, d, "bm25_tf")(tf)))

  private def lexTop10(s: SparkSession, d: String): DataFrame =
    lexFixtureList(s, d)
      .select(col("q_id"), col("doc_id"), col("rank").as("r_lex"))

  /** The RRF fusion tail — ONE definition shared by the brute-force and
    * index-served fusion keys (and mirrored by the shared oracle tail):
    * full-outer on (q_id, doc_id), rrf = 1/(60+r_lex) + 1/(60+r_dense)
    * with an absent stack's NULL rank propagating to a 0 contribution,
    * lexical-first addition, floor-half-up 6 dp, top-5 per query. */
  private def rrfFuse(lex: DataFrame, dense: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rrf = floor(
      (coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60) + col("r_dense")), lit(0.0))) * 1000000.0 + 0.5
    ) / 1000000.0
    val fw = Window.partitionBy("q_id").orderBy(col("rrf").desc, col("doc_id"))
    lex.join(dense, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"), col("r_lex"), col("r_dense"),
        rrf.as("rrf"))
      .withColumn("rank", row_number().over(fw))
      .filter(col("rank") <= 5)
      .select("q_id", "rank", "doc_id", "r_lex", "r_dense", "rrf")
      .orderBy("q_id", "rank")
  }

  /** [[llmHybridRrf]] with the dense stack SERVED FROM THE ANN INDEX
    * (the 3-probe IVF lists via [[LlmTextOps.servedTopK]]) instead of
    * the brute-force scan — the fusion a 100 TB RAG stack actually runs,
    * graded end-to-end: BM25 candidates from the broadcast postings
    * join, dense candidates from the probed inverted lists, identical
    * fusion arithmetic. Where the index's bounded candidate set misses a
    * brute-force dense hit, the fusion degrades exactly as RRF
    * prescribes (the rank is absent, the lexical stack still votes) —
    * the quality delta vs [[llmHybridRrf]] is itself queryable by
    * diffing the two graded keys. */
  def llmHybridRrfIndexed(s: SparkSession, d: String): DataFrame =
    // the fused frame is memoized per (session, corpus): it is the
    // shared first stage of three graded keys (this one, llm_rerank_topk,
    // llm_rerank_recall) — fuse once, re-rank on top, exactly the serving
    // posture
    memo(s, d, "rrf_fused")(hybridRrfIndexedOn(s, d,
      col("doc_id") % 97 === 0, col("vec_id") % 97 === 0))

  /** The query-set-parameterized body of [[llmHybridRrfIndexed]] — ONE
    * kernel shared by the graded batch key (fixture predicate
    * doc_id % 97 == 0) and the streaming per-micro-batch fusion sink
    * ([[graft.streaming.StreamingOps.hybridRrfSink]], which passes the
    * batch's bounded query-id set), so the streaming and batch fused
    * rankings cannot drift: RRF is computed per query independently, so
    * fusing any query subset yields exactly the batch answer's rows for
    * those queries. `lexQ` filters the BM25 TF table (doc_id), `denseQ`
    * the IVF assignment (vec_id) — two spellings of the same query set
    * over differently-keyed frames. */
  private[graft] def hybridRrfIndexedOn(s: SparkSession, d: String,
      lexQ: Column, denseQ: Column): DataFrame =
    rrfFuse(
      lexTopOn(s, d, lexQ),
      LlmTextOps.servedTopK(s, d, denseQ, FusionDepth)
        .select(col("q_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("r_dense")))

  /** Two-stage serving, stage two graded end-to-end: the fused RRF
    * candidates ([[llmHybridRrfIndexed]]'s top-5 per query — BM25 +
    * index-served dense, already graded) re-ranked by EXACT cosine and
    * cut to top-3 — the standard candidate-generation → exact-re-rank
    * shape every production retrieval stack runs (cheap index recall
    * first, precise scoring only on the shortlist). The re-rank body is
    * the shared [[graft.operators.LlmTextOps.exactRerank]] kernel (the
    * same tail `servedTopKFrames` uses), so the serving stages cannot
    * drift from their graded parts. Lexical-only candidates (no
    * embedding) drop out of the re-rank — there is nothing exact to
    * score them with; RRF already gave them their fused chance.
    * Scale: the re-rank joins the ≤ 5·|queries| candidate list against
    * the vector table twice by id — bounded by the fusion cut, never
    * corpus-quadratic. */
  def llmRerankTopk(s: SparkSession, d: String): DataFrame =
    LlmTextOps.exactRerank(
        llmHybridRrfIndexed(s, d)
          .select(col("q_id"), col("doc_id").as("neighbor_id")),
        t(s, d, "embeddings"), 3)
      .select(col("q_id"), col("rank"), col("neighbor_id").as("doc_id"),
        col("sim"))
      .orderBy("q_id", "rank")

  /** The re-rank stage's self-evaluation (the ann_*_recall discipline
    * applied to the END of the serving pipeline): recall of the exact
    * brute-force dense top-3 per query among [[llmRerankTopk]]'s rows.
    * Truth and candidate sides share their kernels with already-graded
    * keys ([[denseBruteTopK]] / the fusion+re-rank tower), so this key
    * measures the pipeline, not a reimplementation of it. One broadcast
    * join of two ≤ 3·|queries| rank lists. */
  def llmRerankRecall(s: SparkSession, d: String): DataFrame =
    denseBruteTopK(s, d, 3).select("q_id", "doc_id")
      .join(llmRerankTopk(s, d)
        .select(col("q_id"), col("doc_id"), lit(1L).as("hit")),
        Seq("q_id", "doc_id"), "left")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("n_truth"), col("n_hit"),
        (floor(col("n_hit").cast("double") / col("n_truth").cast("double") *
          1000000.0 + 0.5) / 1000000.0).as("recall"))

  /** Temperature-scaled language mixture (the multilingual-training
    * resampling rule): per-language share s_l, resampling weight
    * w_l ∝ sqrt(s_l) normalized, and the boost factor w_l / s_l each
    * language's documents get when the corpus is re-sampled at
    * temperature α = 0.5 — low-resource languages are up-weighted, the
    * head is tamed. Computed entirely on the per-language aggregate
    * (5 rows); the two scalar totals broadcast. sqrt, not pow(·, 0.5):
    * sqrt is correctly rounded by IEEE 754 on both engines, so the
    * weights are cross-engine deterministic. */
  def llmLangTemperature(s: SparkSession, d: String): DataFrame = {
    val byLang = t(s, d, "documents").groupBy("lang").agg(count(lit(1)).as("n"))
    val tot = byLang.agg(sum("n").as("ntot"))
    val p = byLang.crossJoin(broadcast(tot))
      .withColumn("share", col("n") / col("ntot"))
      .withColumn("pw", sqrt(col("share")))
    val z = p.agg(sum("pw").as("z"))
    p.crossJoin(broadcast(z))
      .select(col("lang"), col("n"),
        round(col("share"), 6).as("share"),
        round(col("pw") / col("z"), 6).as("w"),
        round(col("pw") / col("z") / col("share"), 4).as("boost"))
      .orderBy("lang")
  }

  /** The WHOLE training-data prep pipeline as one declarative plan:
    * normalize → quality-filter → normalized-exact-dedup (deterministic
    * min-doc_id survivor) → pack survivors into 512-token windows per
    * source. What a user actually runs nightly; Catalyst sees all four
    * stages at once, so filters reach the scan and the dedup window and
    * the packing window share nothing but one exchange each. Stage
    * semantics match the individually-graded ops (llm_normalize_text,
    * llm_quality_filter's bounds, llm_dedup_exact's survivor rule,
    * llm_pack_sequences' bins). */
  def llmPipelineE2e(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val filtered = t(s, d, "documents")
      .filter(LlmOps.qualityGate) // the ONE K6 gate definition
      .withColumn("norm_md5", md5(normExpr.cast("binary")))
    val survivors = filtered
      .withColumn("rn", row_number().over(
        Window.partitionBy("norm_md5").orderBy("doc_id")))
      .filter(col("rn") === 1)
    packBins(survivors.select("doc_id", "source", "text")).orderBy("doc_id")
  }

  /** The FULL curation funnel as ONE graded key (round 10) — the closest
    * thing to "the 100 TB nightly job" the grading harness can express:
    * quality gate → normalized exact dedup → shingle/Jaccard NEAR-dup
    * survivors (computed on the exact survivors only, the funnel order a
    * real job uses: exact dedup shrinks the pair workload first) →
    * per-source domain-mix report with tokenizer economics. Every stage
    * reuses the SAME shared definition its individually-graded key runs
    * ([[graft.operators.LlmOps.qualityGate]], [[normExpr]] + min-doc_id
    * survivor, [[graft.operators.LlmTextOps.shingleIndex]]/
    * [[graft.operators.LlmTextOps.jaccardPairs]] at 0.8 with the
    * stop-shingle cap, the llm_token_count ceil(len/4) BPE-ish cost) and
    * the oracle is the CTE-tower composition of those stages' verified
    * oracles.
    *
    * Output grain: one row per source — raw/gated/exact-surviving/kept
    * doc counts, kept word + BPE-ish token totals, and each source's
    * share of the final token budget (the domain-mix statistic). All
    * exact integers except the one mirrored share (floor half-up, 6 dp).
    *
    * Scale: ONE corpus scan carries the gate flag, the (gate, norm_md5)
    * dedup window, and the final per-source aggregation; the quadratic
    * near-dup machinery runs only on the gated+deduped survivor subset.
    * The loser set is corpus-PROPORTIONAL (it grows with the duplicate
    * rate), so it joins back UNHINTED — a shuffled left join on doc_id
    * that AQE demotes to broadcast only when the runtime size permits;
    * an unconditional broadcast hint here would OOM the driver at
    * 100 TB. The share is a window over the per-source grid
    * (≤ |sources| rows). */
  def llmCurationE2e(s: SparkSession, d: String): DataFrame =
    curationFunnel(t(s, d, "documents"),
      losers => memo(s, d, "curation_losers")(losers))

  /** The frame-parameterized funnel body — ONE kernel shared by the
    * graded fixture key and the StressCheck 40× planted-corpus row, so
    * the scale evidence exercises exactly the graded plan. `docs` needs
    * (doc_id, text, source, lang, n_chars); `pinLosers` lets the graded
    * key memoize the near-dup loser frame per (session, corpus). */
  def curationFunnel(docs: DataFrame,
      pinLosers: DataFrame => DataFrame = identity): DataFrame = {
    // r15: the word/BPE-token metrics are computed map-side inside
    // [[curationFlags]]' scan projection (and text dropped there), so this
    // aggregation sums precomputed integers instead of re-splitting every
    // kept document's text.
    val perSrc = curationFlags(docs, pinLosers)
      .groupBy("source")
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("gate"), 1L).otherwise(0L)).as("n_gated"),
        sum(when(col("is_exact"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("is_kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("is_kept"), col("__n_words")).otherwise(0L)).as("n_words"),
        sum(when(col("is_kept"), col("__n_bpe")).otherwise(0L)).as("n_bpe_tokens"))
    perSrc
      .withColumn("token_share",
        floor(col("n_bpe_tokens").cast("double") /
          sum("n_bpe_tokens").over(
            org.apache.spark.sql.expressions.Window.partitionBy()).cast("double") *
          1000000.0 + 0.5) / 1000000.0)
      .orderBy("source")
  }

  /** The funnel's DOC-GRAIN stage flags — every input row annotated with
    * gate / is_exact / is_kept (kept = survived the quality gate, the
    * normalized exact dedup, AND the near-dup closure). Shared by
    * [[curationFunnel]] (which aggregates it per source) and
    * llm_gate_agreement (which grades the cheap gates against it), so
    * "survivor truth" has exactly one definition. */
  private[graft] def curationFlags(docs: DataFrame,
      pinLosers: DataFrame => DataFrame = identity): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r15: text DIES IN THE SCAN PROJECTION. The funnel's dedup window and
    // the loser join previously carried the full document text through two
    // exchanges and a window sort just so the final aggregation could
    // re-split it — the guide-§2.3/§8 anti-pattern (shuffling the payload
    // to move a decision). The gate, the norm-md5, and the word/BPE
    // metrics the funnel sums are all row-local, so they are computed
    // map-side here and only ~40 B/row of flags+integers ever shuffles;
    // the near-dup loser build (memoized) re-reads text for the exact
    // survivors via a doc_id join instead.
    val ws = split(col("text"), " ")
    val flagged = docs
      .withColumn("gate", LlmOps.qualityGate)
      .withColumn("norm_md5", md5(normExpr.cast("binary")))
      .withColumn("__n_words", size(ws).cast("long"))
      .withColumn("__n_bpe", aggregate(ws, lit(0L),
        (acc, x) => acc + ceil(length(x) / lit(4.0))))
      .drop("text")
      .withColumn("rn", row_number().over(
        Window.partitionBy("gate", "norm_md5").orderBy("doc_id")))
      .withColumn("is_exact", col("gate") && col("rn") === 1)
    val exact = flagged.filter(col("is_exact")).select("doc_id")
      .join(docs.select("doc_id", "text"), "doc_id")
    val losers = pinLosers(
      LlmTextOps.connectedComponents(
          LlmTextOps.jaccardPairs(LlmTextOps.shingleIndex(exact), 0.8,
            maxPosting = LlmTextOps.StopShingleCap).select("a_id", "b_id"))
        .filter(col("id") =!= col("comp"))
        .select(col("id").as("doc_id"), lit(true).as("is_loser")))
    flagged
      .join(losers, Seq("doc_id"), "left")
      .withColumn("is_kept", col("is_exact") && col("is_loser").isNull)
  }

  /** llm_gate_agreement: the ann_pair_recall honesty discipline applied
    * to CURATION — how well do the two cheap per-doc gates (the Gopher
    * rule pack, the 0-1 quality score at τ = 0.55 — the fixture-median
    * operating point; [[llmGatePrCurve]] sweeps the full τ grid) predict the FULL
    * funnel's survivor set (quality gate → exact dedup → near-dup
    * closure, [[curationFlags]]' is_kept — the expensive truth)? One
    * confusion row per gate: TP/FP/FN/TN counts plus floor-6dp precision
    * and recall. This is the measurement a curation owner uses to decide
    * whether a cheap gate can PRE-FILTER the corpus before the expensive
    * dedup tower at 100 TB — a high-recall gate can cut the near-dup
    * input safely, a low-precision one cannot replace it.
    *
    * Scale: the gates are row-local projections over the same corpus
    * scan; the truth side is the funnel the e2e key already prices
    * (loser frame memoized per (session, corpus) under the SAME tag, so
    * Bench's sorted order builds it once at llm_curation_e2e and this
    * key reuses it); the confusion matrix is a 2-row aggregate. */
  /** The memoized doc-grain survivor truth (doc_id, is_kept) — built
    * once per (session, corpus) and shared by both gate-evaluation keys
    * (the flags pass re-runs the funnel's norm-md5 window + loser join,
    * ~2 s at sf0.1, so the second key serves from the checkpoint). Text
    * is dropped BEFORE the checkpoint: the truth frame is two columns,
    * never a corpus copy. */
  private def keptFlags(s: SparkSession, d: String): DataFrame =
    memo(s, d, "curation_kept")(
      curationFlags(t(s, d, "documents"),
          losers => memo(s, d, "curation_losers")(losers))
        .select(col("doc_id"), col("is_kept")))

  def llmGateAgreement(s: SparkSession, d: String): DataFrame = {
    val kept = keptFlags(s, d)
    val gopher = llmGopherRules(s, d).select(col("doc_id"), col("pass").as("g_pass"))
    val qscore = LlmTextOps.llmQualityScore(s, d)
      .select(col("doc_id"), (col("score") >= 0.55).as("q_pass"))
    val conf = kept
      .join(gopher, Seq("doc_id"))
      .join(qscore, Seq("doc_id"))
      .select(col("is_kept"), explode(array(
        struct(lit("gopher").as("gate"), col("g_pass").as("pass")),
        struct(lit("quality_score").as("gate"), col("q_pass").as("pass")))).as("e"))
      .select(col("is_kept"), col("e").getField("gate").as("gate"),
        col("e").getField("pass").as("pass"))
      .groupBy("gate")
      .agg(
        sum(when(col("pass") && col("is_kept"), 1L).otherwise(0L)).as("n_tp"),
        sum(when(col("pass") && !col("is_kept"), 1L).otherwise(0L)).as("n_fp"),
        sum(when(!col("pass") && col("is_kept"), 1L).otherwise(0L)).as("n_fn"),
        sum(when(!col("pass") && !col("is_kept"), 1L).otherwise(0L)).as("n_tn"))
    conf
      .select(col("gate"), col("n_tp"), col("n_fp"), col("n_fn"), col("n_tn"),
        when(col("n_tp") + col("n_fp") > 0,
          floor(col("n_tp").cast("double") / (col("n_tp") + col("n_fp")).cast("double") *
            1000000.0 + 0.5) / 1000000.0).as("precision"),
        when(col("n_tp") + col("n_fn") > 0,
          floor(col("n_tp").cast("double") / (col("n_tp") + col("n_fn")).cast("double") *
            1000000.0 + 0.5) / 1000000.0).as("recall"))
      .orderBy("gate")
  }

  /** llm_gate_pr_curve: [[llmGateAgreement]]'s quality-score gate swept
    * over a τ grid (0.1 … 0.9) — the precision/recall CURVE against the
    * funnel survivor truth, i.e. the data a curation owner reads to PICK
    * the single τ the agreement key grades. One corpus scan joined to
    * the memoized survivor truth, each row exploded over the 9 bounded
    * thresholds (never a join), one 9-group aggregate. */
  def llmGatePrCurve(s: SparkSession, d: String): DataFrame = {
    val kept = keptFlags(s, d)
    val qs = LlmTextOps.llmQualityScore(s, d).select(col("doc_id"), col("score"))
    val taus = (1 to 9).map(i => lit(i / 10.0))
    kept.join(qs, Seq("doc_id"))
      .select(col("is_kept"), col("score"), explode(array(taus: _*)).as("tau"))
      .withColumn("pass", col("score") >= col("tau"))
      .groupBy("tau")
      .agg(
        sum(when(col("pass") && col("is_kept"), 1L).otherwise(0L)).as("n_tp"),
        sum(when(col("pass") && !col("is_kept"), 1L).otherwise(0L)).as("n_fp"),
        sum(when(!col("pass") && col("is_kept"), 1L).otherwise(0L)).as("n_fn"),
        sum(when(!col("pass") && !col("is_kept"), 1L).otherwise(0L)).as("n_tn"))
      .select(col("tau"), col("n_tp"), col("n_fp"), col("n_fn"), col("n_tn"),
        when(col("n_tp") + col("n_fp") > 0,
          floor(col("n_tp").cast("double") / (col("n_tp") + col("n_fp")).cast("double") *
            1000000.0 + 0.5) / 1000000.0).as("precision"),
        when(col("n_tp") + col("n_fn") > 0,
          floor(col("n_tp").cast("double") / (col("n_tp") + col("n_fn")).cast("double") *
            1000000.0 + 0.5) / 1000000.0).as("recall"))
      .orderBy("tau")
  }

  /** llm_gate_tau_adaptive: [[llmGateAgreement]]'s quality-score gate at
    * a τ DERIVED FROM THE CORPUS AT HAND instead of the fixture-median
    * literal 0.55 — the ccnet cutoffs-by-quantile pattern applied to the
    * gate, which is the 100 TB form: a fixed literal tuned on one
    * fixture drifts the moment the corpus mix shifts, while "keep the
    * top-40 % band" (τ = the score at ascending rank ⌈0.6·n⌉, an exact
    * order statistic — no interpolation, so no cross-engine float
    * hazard) re-derives itself on every corpus. Output: one confusion
    * row (τ, TP/FP/FN/TN, floor-6dp precision/recall) against the same
    * memoized funnel-survivor truth the fixed-τ key grades.
    *
    * Scale: the τ derivation is ONE [[ScalePrimitives.distRunning]]
    * parallel range sort in (score, doc_id) order — the same cost as
    * any global orderBy — and τ comes back to the driver as a single
    * scalar (O(1) driver state, the hub-centroid/codebook posture), so
    * the gate itself stays a row-local projection joined to the
    * doc-grain truth; the confusion matrix is a 1-row aggregate. Ties
    * at the rank are deterministic (doc_id tiebreak) and `score ≥ τ`
    * admits equal-score docs below the rank identically on both
    * engines. */
  def llmGateTauAdaptive(s: SparkSession, d: String): DataFrame = {
    val qs = LlmTextOps.llmQualityScore(s, d).select(col("doc_id"), col("score"))
    val (ranked, n) = ScalePrimitives.distRunningWithCount(
      qs.select("score", "doc_id"), Seq(col("score"), col("doc_id")), "__rnk")
    val tauV = ranked.filter(col("__rnk") === lit((6L * n + 9L) / 10L))
      .head().getDouble(0)
    keptFlags(s, d)
      .join(qs, Seq("doc_id"))
      .withColumn("pass", col("score") >= lit(tauV))
      .agg(
        sum(when(col("pass") && col("is_kept"), 1L).otherwise(0L)).as("n_tp"),
        sum(when(col("pass") && !col("is_kept"), 1L).otherwise(0L)).as("n_fp"),
        sum(when(!col("pass") && col("is_kept"), 1L).otherwise(0L)).as("n_fn"),
        sum(when(!col("pass") && !col("is_kept"), 1L).otherwise(0L)).as("n_tn"))
      .select(lit(tauV).as("tau"), col("n_tp"), col("n_fp"), col("n_fn"), col("n_tn"),
        when(col("n_tp") + col("n_fp") > 0,
          floor(col("n_tp").cast("double") / (col("n_tp") + col("n_fp")).cast("double") *
            1000000.0 + 0.5) / 1000000.0).as("precision"),
        when(col("n_tp") + col("n_fn") > 0,
          floor(col("n_tp").cast("double") / (col("n_tp") + col("n_fn")).cast("double") *
            1000000.0 + 0.5) / 1000000.0).as("recall"))
      .orderBy("tau")
  }

  /** The e2e pipeline with DATA-QUALITY OBSERVABILITY: the same plan as
    * [[llmPipelineE2e]] plus an `observe` node on the raw scan capturing
    * the gate's audit counters (rows seen, rows the quality filter will
    * reject, mean document length). `CollectMetricsExec` accumulates
    * these ON the existing pass — task-side accumulators merged at the
    * driver, no second scan, no extra shuffle — which is how a 100 TB
    * nightly job reports "what did the gate drop" for free; a separate
    * auditing query would double the scan cost. The one price: the
    * quality filter can no longer push past the metrics node (observe
    * must see every raw row — that IS the audit), so this variant trades
    * the scan-level row-group pruning of [[llmPipelineE2e]] for the
    * counters; pick per job. The caller blocks on `Observation.get`
    * AFTER an action on the returned frame. Caveat (observed in this
    * repo's tests): `Observation.get` initializes the session's lazy,
    * non-serializable ObservationManager, and Spark ML training
    * summaries capture their SparkSession into model-transform closures
    * — mixing observed queries and summary-bearing ML models in ONE
    * session makes those closures unserializable. Run observed
    * pipelines in their own `spark.newSession()` when the session also
    * trains models. */
  def llmPipelineObserved(s: SparkSession, d: String):
      (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = new org.apache.spark.sql.Observation("quality_gate")
    val keep = LlmOps.qualityGate // the ONE K6 gate definition
    val observed = t(s, d, "documents").observe(obs,
      count(lit(1)).as("rows_seen"),
      sum(when(!keep, 1L).otherwise(0L)).as("rows_rejected"),
      avg("n_chars").as("mean_chars"))
    import org.apache.spark.sql.expressions.Window
    val survivors = observed.filter(keep)
      .withColumn("norm_md5", md5(normExpr.cast("binary")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("norm_md5").orderBy("doc_id")))
      .filter(col("rn") === 1)
    (packBins(survivors.select("doc_id", "source", "text")).orderBy("doc_id"),
      obs)
  }

  /** Pairwise document similarity on tf-idf term vectors — the lexical
    * twin of the dense-embedding cosine family. Weights use the smoothed
    * idf ln((N+1)/(df+1)) + 1 (sklearn's convention): strictly positive,
    * so no document has a zero norm and the division is total. Weights
    * are float32 BY CONTRACT (mirrored in the oracle), matching the
    * embedding pipeline's storage type.
    *
    * PLAN CHOICE, learned the hard way: the textbook sparse plan — an
    * inverted postings index joined on term, a·b = Σ_shared w_a·w_b —
    * costs Σ_t df_t² candidate ROWS. That wins on an open zipfian
    * vocabulary where most terms are rare; on THIS fixture's closed
    * ~31-term vocabulary every posting list is corpus-length, so the
    * postings join materializes 31·n² rows through a shuffle (measured:
    * 116 s at sf0.1 — worse than the plain n² dense join by the factor
    * of vocabulary density). With a bounded dimension the right plan is
    * the one the repo already ships for embeddings: pack each document
    * into a dense vocab-indexed float vector (dimension = dictionary
    * size; at an open 100 TB vocabulary you'd fix the dimension with the
    * hashing trick) and run the block-nested-loop kernel — per-task
    * memory two blocks, block count derived from n, zero per-candidate
    * row materialization. Pairs sharing no term score sim 0 here (the
    * postings form never generates them); irrelevant to a top-k while
    * ≥ k positive-sim pairs exist, which a shared-vocab corpus always
    * has. The df-capped postings variant remains the open-vocab scale
    * path (same guard family as llm_ngram_jaccard's stop-shingle cap). */
  def llmTfidfCosine(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = t(s, d, "documents")
    // The term-frequency table is read by THREE downstream consumers
    // (dictionary collect, weight join, and — transitively — the vector
    // build). One eager checkpoint prices the explode+aggregate once;
    // without it every action re-ran the full upstream (measured: the
    // dominant cost once the pair materialization below was fixed).
    // Size: one row per (doc, distinct term) — strictly smaller than the
    // tokenized corpus, the same artifact a 100 TB pipeline would
    // materialize as its postings/TF table.
    // memoized (not a bare localCheckpoint): the blocks release at the
    // next family boundary instead of pinning until ContextCleaner luck
    val tf = memo(s, d, "tfidf_tf")(docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf")))
    // dense feature index: alphabetical rank over the bounded dictionary.
    // The dictionary is METADATA SCALE (closed ~31-term vocabulary; the
    // open-vocab path is the hashing trick, fixing dim up front), so it is
    // collected once and indexed driver-side — replacing a global window
    // plus a separate dim-sizing count(), each of which was a full extra
    // pass over tf's upstream before the checkpoint existed.
    val dictRows = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    val dim = dictRows.length
    val nd = docs.count().toDouble
    val dict = dictRows.zipWithIndex
      .map { case ((term, df), tid) => (term, df, tid) }.toSeq
      .toDF("term", "df", "tid")
    val w = tf.join(broadcast(dict), "term")
      .select(col("doc_id"), col("tid"),
        (col("tf") * (log((lit(nd) + 1.0) / (col("df") + 1.0)) + 1.0))
          .cast("float").as("w"))
    val vecs = w.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("tid"), col("w")))).as("m"))
      .select(col("doc_id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0.0f))).as("embedding"))
    // top-25 pushed into the BNL tasks: each pair-group emits its local
    // best 25 under the final order, so the quadratic pair set is never
    // materialized as rows (12.5M rows at sf0.1 → ~K(K+1)/2 · 25).
    // K is sized from the already-known document count — vecs.count()
    // inside the BNL would re-run the vector build as a fourth action.
    graft.functions.VectorFunctions.cosineTopKDistributed(s, vecs, 25,
        numChunks = graft.functions.VectorFunctions.deriveChunks(nd.toLong))
      .orderBy(col("sim").desc, col("a_id"), col("b_id"))
      .limit(25)
  }

  /** Bigram-LM perplexity per document — THE standard statistical
    * quality-filter signal (heuristic scores flag boilerplate; perplexity
    * flags text the corpus's own language model finds improbable). The
    * model is add-one-smoothed bigram MLE trained on the corpus itself:
    * p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V). Cross-engine determinism uses
    * the unigram tokenizer's fixed-point discipline: the ONE ln() per
    * model bigram rounds to millionth-nats (BIGINT) before anything
    * sums, the per-doc negative-log-likelihood is then an EXACT integer
    * total (immune to float summation order), and only the final
    * exp(nll/1e6/n) drops to a rounded double.
    *
    * Scale posture (100 TB): one shuffle on doc_id for the lag bigrams,
    * one on (w1,w2) for the model build, and a model join whose right
    * side is bounded by the OBSERVED bigram vocabulary (broadcast when
    * small, shuffle otherwise — Catalyst/AQE decides from stats); scored
    * docs never re-shuffle except the final per-doc aggregation. Scoring
    * the training corpus means every bigram hits the model (inner join
    * is total); scoring FRESH text against a frozen model would add the
    * unseen-bigram fallback p = 1/(c(w1)+V) as a left-join coalesce. */
  /** ONE word/bigram tower for both perplexity keys (the eventSessionize
    * lesson: a second hand-rolled copy of the tokenization diverges
    * silently from any future fix). Returns (per-doc word stream with
    * positions, in-doc bigrams). */
  private def bigramTower(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // r15: bigrams are formed ARRAY-SIDE (zip_with over the filtered word
    // array) instead of posexplode + lag over a per-doc Window. The window
    // form shuffled and sorted the exploded corpus on doc_id — and because
    // the bigram subtree appears 2-3× in one perplexity plan (model branch,
    // score join-back, vocab scalar), every evaluation paid that Exchange+Sort
    // again (llm_perplexity's before-plan carries three Generate→Window
    // towers, plans/r15/llm_perplexity_before.txt). Adjacency in the
    // filtered array is exactly the lag-over-position adjacency (empty
    // words are dropped BEFORE pairing in both forms), so the pairs are
    // bit-identical; the zip_with form is map-side, shuffle-free, and
    // whole-stage-codegen'd. At 100 TB this removes a corpus-grain
    // shuffle×3 from every perplexity-family run.
    // The frame is additionally MEMOIZED per (session, corpus): one
    // perplexity plan evaluates the bigram subtree 2-3 times (model
    // branch, score join-back), and four graded keys (llm_perplexity,
    // _holdout, _kn, llm_ccnet_buckets) all start from it — the memo
    // turns ~10 corpus tokenization passes into one build plus cheap
    // checkpoint scans, the same shared-stage pattern as the TF and
    // kn_model memos (attributed in BENCH_FULL's memo_builds as
    // "bigrams").
    val docs = t(s, d, "documents")
    val wsF = filter(split(col("text"), " "), x => length(x) >= 1)
    val w = docs.select(col("doc_id"), explode(wsF).as("word"))
    val nb = greatest(size(col("ws")) - 1, lit(0))
    val bg = memo(s, d, "bigrams")(docs
      .select(col("doc_id"), wsF.as("ws"))
      .select(col("doc_id"), explode(zip_with(
        slice(col("ws"), lit(1), nb), slice(col("ws"), lit(2), nb),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2")))
    (w, bg)
  }

  def llmPerplexity(s: SparkSession, d: String): DataFrame = {
    val (w, bg) = bigramTower(s, d)
    val model = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val lc = model.groupBy("w1").agg(sum("c12").as("c1"))
    // V rides into the plan as a LITERAL (one bounded single-row collect,
    // the tfidf-dictionary model-state pattern) — a crossJoin(broadcast)
    // of the 1-row frame planned a BroadcastNestedLoopJoin, which the
    // plan-invariants gate rightly flags as a scale anti-pattern
    val nv = w.agg(countDistinct("word")).collect()(0).getLong(0)
    val scores = model.join(lc, "w1")
      .select(col("w1"), col("w2"),
        floor(lit(1e6) * log((col("c12") + 1).cast("double") / (col("c1") + lit(nv))) + 0.5)
          .cast("long").as("s"))
    bg.join(scores, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), (-sum("s")).cast("long").as("nll6"))
      .withColumn("perplexity",
        floor(exp(col("nll6").cast("double") / 1e6 / col("n_bigrams")) * 1e4 + 0.5) / 1e4)
      .orderBy("doc_id")
  }

  /** Frozen-model perplexity — the production shape of [[llmPerplexity]]:
    * the bigram model trains on the EXISTING corpus split (doc_id%10<8,
    * the incremental-dedup convention) and scores the HELD-OUT split,
    * where unseen transitions are the point. The add-one smoothing
    * collapses all three cases into one formula with left-join defaults:
    * p = (c12+1)/(c1+V) with c12=0 for an unseen bigram and c1=0 for an
    * unseen left word (→ 1/V). The per-occurrence score still rounds to
    * integer millionth-nats BEFORE summation, so the doc NLL stays an
    * exact integer; `oov_bigrams` (transitions the model never saw)
    * rides along as the contamination-adjacent signal reviewers actually
    * threshold on. Scale posture matches [[llmPerplexity]] — the extra
    * cost is two left joins against model-bounded tables. */
  def llmPerplexityHoldout(s: SparkSession, d: String): DataFrame = {
    val (w, bg) = bigramTower(s, d)
    val train = bg.filter(col("doc_id") % 10 < 8)
    val model = train.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val lc = model.groupBy("w1").agg(sum("c12").as("c1"))
    // V as a literal (see llmPerplexity) — no single-row BNL in the plan
    val nv = w.filter(col("doc_id") % 10 < 8)
      .agg(countDistinct("word")).collect()(0).getLong(0)
    // An EMPTY train split means there is no model: without the guard
    // every score computed ln(1/0) = +Infinity, whose Long cast SATURATES
    // on the Spark side (plausible-looking garbage rows) while DuckDB's
    // cast throws — fail loudly and identically instead.
    require(nv > 0,
      "llm_perplexity_holdout: the train split (doc_id % 10 < 8) is empty — " +
        "no model exists to score the holdout against")
    bg.filter(col("doc_id") % 10 >= 8)
      .join(model, Seq("w1", "w2"), "left")
      .join(lc, Seq("w1"), "left")
      .withColumn("s", floor(lit(1e6) *
        log((coalesce(col("c12"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + lit(nv))) + 0.5).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c12").isNull, 1L).otherwise(0L)).as("oov_bigrams"),
        (-sum("s")).cast("long").as("nll6"))
      .withColumn("perplexity",
        floor(exp(col("nll6").cast("double") / 1e6 / col("n_bigrams")) * 1e4 + 0.5) / 1e4)
      .orderBy("doc_id")
  }

  /** CCNet-style corpus partition: per language, rank documents by their
    * own-corpus perplexity ([[llmPerplexity]]) and cut into equal-count
    * head / middle / tail thirds — the quality tiers the CCNet pipeline
    * (Wenzek et al. 2020) trains on (head = lowest perplexity = most
    * model-like text). Output is the tier report a corpus owner reads:
    * per (lang, bucket) document and char volume plus the tier's
    * perplexity range. Documents with no bigram (single-word) carry no
    * perplexity and are out of scope, as in CCNet's paragraph filter.
    *
    * Determinism: the ntile runs over the ALREADY-rounded 4dp perplexity
    * with doc_id as the total tie-break, and min/max of identical value
    * sets are identical — no fresh float op is introduced.
    *
    * Scale: a window `PARTITION BY lang` would sort each language's
    * documents in ONE task — a 5-value partition key over near-unique
    * perplexities is the hidden data-grain window (the
    * agg_weighted_median lesson), catastrophic at 100 TB. The exact
    * per-lang ntile instead rides [[ScalePrimitives.distNtileBy]]:
    * range-partitioned parallel prefix ranks in (lang, perplexity,
    * doc_id) order with each language's size/offset recovered on the
    * |langs|-row grain — bit-identical buckets, no window anywhere.
    * The heavy lifting either way is llmPerplexity's own
    * (already-audited) plan. */
  def llmCcnetBuckets(s: SparkSession, d: String): DataFrame = {
    val scored = llmPerplexity(s, d).select("doc_id", "perplexity")
      .join(t(s, d, "documents").select("doc_id", "lang", "n_chars"), "doc_id")
    ScalePrimitives.distNtileBy(scored, "lang", 3, "b",
        col("perplexity"), col("doc_id"))
      .withColumn("bucket",
        when(col("b") === 1, "head").when(col("b") === 2, "middle")
          .otherwise("tail"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("n_chars"),
        min("perplexity").as("ppl_min"),
        max("perplexity").as("ppl_max"))
      .orderBy("lang", "bucket")
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much more probable its unigram features are under a
    * TARGET distribution than under the raw-corpus distribution, then
    * select the documents the target model prefers. The target here is
    * the English slice (the fixture's stand-in for a curated domain);
    * both distributions are add-one-smoothed over the SHARED corpus
    * vocabulary so the log-ratio is finite for every word.
    *
    * Determinism: per-word log-ratio rounds to millionth-nats (BIGINT)
    * BEFORE summation — the per-doc weight is an exact integer sum,
    * immune to float ordering (the perplexity discipline). `selected`
    * is the sign test (target-likelier than corpus), the deterministic
    * stand-in for DSIR's Gumbel resampling draw.
    *
    * Scale posture (100 TB): two vocabulary-sized aggregations (target
    * and corpus word histograms — map-side partials, one shuffle each),
    * two scalar totals collected as literals (bounded model state), and
    * ONE broadcast join of the per-word score table onto the corpus word
    * stream followed by a hash aggregation on doc_id. The corpus
    * shuffles once. */
  def llmDsirWeight(s: SparkSession, d: String): DataFrame = {
    val words = t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
    // BOTH histograms from ONE vocabulary-keyed aggregation (target
    // occurrences ride as a conditional sum), memoized: the vocab-sized
    // table feeds the scalar collect below AND the score join without
    // re-scanning the corpus per action
    val cnt = memo(s, d, "dsir_cnt")(words.groupBy("word")
      .agg(count(lit(1)).as("cc"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tc")))
    // smoothing denominators as literals: ONE bounded vocab-sized
    // aggregation collect (the llmPerplexity V pattern — a 1-row
    // crossJoin would plan a BNL)
    val (nv, totC, totT) = {
      val r = cnt.agg(count(lit(1)), sum("cc"), sum("tc")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    require(totT > 0, "llm_dsir_weight: the target slice (lang='en') is empty")
    val scores = cnt.select(col("word"),
      (floor(lit(1e6) * log((col("tc") + 1).cast("double") /
          lit((totT + nv).toDouble)) + 0.5).cast("long") -
        floor(lit(1e6) * log((col("cc") + 1).cast("double") /
          lit((totC + nv).toDouble)) + 0.5).cast("long")).as("s"))
    words.join(broadcast(scores), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("s").cast("long").as("logratio6"))
      .withColumn("selected", col("logratio6") > 0L)
      .orderBy("doc_id")
  }

  /** Interpolated Kneser–Ney bigram perplexity — the canonical n-gram
    * smoothing (Kneser & Ney 1995; Chen & Goodman 1999's interpolated
    * form), next to [[llmPerplexity]]'s add-one baseline: instead of
    * pretending unseen mass is uniform, the backoff weight redistributes
    * it by CONTINUATION probability (how many distinct left-contexts a
    * word completes), with absolute discount d = 0.75 — exactly
    * representable in binary, so the discount introduces no rounding of
    * its own. Scoring the training corpus means every bigram is
    * observed: p(w2|w1) = (c12−d)/c1 + d·N1+(w1·)/c1 · N1+(·w2)/NT.
    * The ONE ln() per model bigram rounds to millionth-nats (BIGINT)
    * before anything sums — the per-doc NLL is an exact integer, the
    * family's standard determinism treatment. The arithmetic is written
    * with explicit parenthesization mirrored character-for-character in
    * the oracle so both engines execute the identical IEEE op sequence.
    *
    * Scale posture: identical to llmPerplexity plus one more
    * model-bounded aggregation (continuation counts) and join — all
    * keyed on the OBSERVED bigram/unigram vocabulary, never the corpus;
    * NT is a bounded scalar collected as a literal. */
  def llmPerplexityKn(s: SparkSession, d: String): DataFrame = {
    val (_, bg) = bigramTower(s, d)
    // memoized (the dsir_cnt pattern): the model feeds three
    // re-aggregations, the scalar count, and the score join — without
    // the memo each action re-ran the corpus-wide bigram aggregation
    val model = memo(s, d, "kn_model")(
      bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
    val lc = model.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1p_w1"))
    val cont = model.groupBy("w2").agg(count(lit(1)).as("n1p_w2"))
    val nt = model.count() // distinct bigram types: model-bounded scalar
    // nt == 0 (bigram-free corpus) needs NO guard: with zero model rows
    // the score expression never evaluates, and the key returns the
    // same empty frame as llm_perplexity and the oracle
    val disc = 0.75
    val scores = model.join(lc, "w1").join(cont, "w2")
      .select(col("w1"), col("w2"),
        floor(lit(1e6) * log(
          (col("c12").cast("double") - lit(disc)) / col("c1").cast("double") +
            (lit(disc) * col("n1p_w1").cast("double") / col("c1").cast("double")) *
              (col("n1p_w2").cast("double") / lit(nt.toDouble))) + 0.5)
          .cast("long").as("s"))
    bg.join(scores, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), (-sum("s")).cast("long").as("nll6"))
      .withColumn("perplexity",
        floor(exp(col("nll6").cast("double") / 1e6 / col("n_bigrams")) * 1e4 + 0.5) / 1e4)
      .orderBy("doc_id")
  }

  /** Gopher-style rule-based quality filter (Rae et al. 2021, Appendix A
    * — the named heuristic rule set most corpus pipelines start from),
    * with the bounds adapted to the fixture's text ranges (the paper's
    * own values, e.g. 50..100k words, are degenerate on 10-99-word
    * fixtures; the STRUCTURE is what's graded). Four rules, each a
    * graded boolean plus the composite:
    *   R1 word count within [30, 90]
    *   R2 mean word length within [3.9, 4.7]
    *   R3 at least 2 stopword occurrences (the pinned MlOps list)
    *   R4 most-frequent-token share <= 1/8 (repetition gate)
    *
    * Every rule is decided in EXACT integer arithmetic (10·Σlen vs
    * 39·wc, 8·max_cnt vs wc — never a float ratio), so no rounding
    * convention is even needed. The whole op is ONE map-side projection:
    * word metrics come from array HOFs and the repetition count from a
    * run-length fold over the sorted word array — zero shuffles, zero
    * joins; at 100 TB it scales like the parquet scan itself. */
  def llmGopherRules(s: SparkSession, d: String): DataFrame = {
    val ws = filter(split(col("text"), " "), w => length(w) >= 1)
    val wc = size(ws).cast("long")
    val sumLen = aggregate(ws, lit(0L), (a, w) => a + length(w))
    val stopw = size(filter(ws, w => w.isin(MlOps.PinnedStopwords.toIndexedSeq: _*)))
    // longest run in the sorted array = the max per-word count; "" can
    // never match a real word (all kept words have length >= 1)
    val maxCnt = aggregate(array_sort(ws),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, w) => {
        val run = when(w === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(w.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    // r15: sort the raw (doc_id, text) rows FIRST — with the HOF towers
    // below the global sort, the range exchange's sampling pass evaluated
    // every fold twice per run (the llmRepetition sort-lift). Rows and
    // order identical; the projection is row-wise over the sorted stream.
    t(s, d, "documents")
      .select("doc_id", "text")
      .orderBy("doc_id")
      .select(col("doc_id"), wc.as("n_words"), sumLen.as("sum_len"),
        stopw.as("n_stop"), maxCnt.as("max_cnt"))
      .select(col("doc_id"), col("n_words"),
        col("n_words").between(30L, 90L).as("r_word_count"),
        (col("sum_len") * 10L >= col("n_words") * 39L &&
          col("sum_len") * 10L <= col("n_words") * 47L).as("r_mean_word_len"),
        (col("n_stop") >= 2).as("r_stopwords"),
        (col("max_cnt") * 8L <= col("n_words")).as("r_top_token"))
      .withColumn("pass",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_stopwords") && col("r_top_token"))
  }

  /** Zipf's-law fit over the corpus word-frequency distribution: OLS of
    * ln(freq) on ln(rank) — slope ≈ −1 is the signature of natural
    * language, and deviation from it is a cheap corpus-health gauge
    * (template/boilerplate floods flatten the head; OCR noise fattens
    * the tail). Reported: vocab size, token count, slope, intercept, R².
    *
    * Determinism: both logs round to millionth-nats (BIGINT) per VOCAB
    * ROW before any moment sum (the perplexity discipline), so the five
    * OLS moments are exact integers and the closed-form slope/intercept/
    * R² is one mirrored IEEE expression tree over exact doubles.
    *
    * On THIS fixture the gauge fires: the synthetic corpus draws words
    * near-uniformly from a 31-word vocab, so it reports slope ≈ −0.18,
    * R² ≈ 0.06 — a flat-head, no-power-law reading (natural text gives
    * slope ≈ −1, R² > 0.9), which is exactly the "not natural language"
    * alarm the spec pins.
    *
    * Scale: ONE vocabulary-sized aggregation over the corpus word
    * stream (map-side partials); the rank window and the moment fold
    * run on the vocab table, which is bounded (Heaps' law) — the same
    * posture as llm_dsir_weight's score table. */
  def llmZipfFit(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freqs = t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    def ln6(c: Column) = floor(lit(1e6) * log(c.cast("double")) + 0.5).cast("long")
    val xy = freqs
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("word"))))
      .select(col("freq"), ln6(col("rank")).as("x"), ln6(col("freq")).as("y"))
    // squared-log sums in DECIMAL(38,0)/HUGEINT: per-term x·y ≤ ~8e14
    // fits int64, but a web-scale vocabulary overflows their SUM (the
    // agg_regression_multi Σy² discipline)
    val m = xy.agg(count(lit(1)).as("nv"), sum("freq").as("n_tokens"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
      sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
    def db(c: String) = col(c).cast("double")
    val (n, sx, sy) = (db("nv"), db("sx"), db("sy"))
    val (sxx, sxy, syy) = (db("sxx"), db("sxy"), db("syy"))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    val r2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    def r6(c: Column) = signum(c) * (floor(abs(c) * 1000000.0 + 0.5) / 1000000.0) + lit(0.0)
    m.select(col("nv").as("n_vocab"), col("n_tokens"),
      r6(slope).as("slope"), r6(icept).as("intercept"), r6(r2).as("r2"))
  }

  /** Heaps'-law vocabulary-growth curve: cumulative distinct-word count
    * as the corpus accumulates in doc_id order, reported at power-of-two
    * document checkpoints (plus the final total) — the companion gauge
    * to [[llmZipfFit]] (natural text grows V ≈ K·n^β, β ≈ 0.5; a
    * closed-vocabulary corpus saturates flat, which is what THIS fixture
    * does — V hits all 31 words almost immediately). Pure integer
    * counts end to end; no float exists in the key.
    *
    * The idiom is first-occurrence attribution: each word contributes
    * +1 to the doc where min(doc_id) saw it — one vocab-sized
    * aggregation, never a per-doc distinct scan. Scale: the cumulative
    * sums run on the DOC grain, which is the data grain — so they ride
    * [[ScalePrimitives.distRunning]]'s two-pass range-partitioned scan
    * (parallel sort, per-partition totals, broadcast offsets) instead
    * of an unpartitioned window that would re-sort every document on
    * one task. */
  def llmHeapsGrowth(s: SparkSession, d: String): DataFrame = {
    val words = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
    val perDoc = words.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val firstOcc = words.groupBy("word").agg(min("doc_id").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_new"))
    val joined = perDoc.join(firstOcc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_new"))
    val (cum, nDocs) = ScalePrimitives.distRunningWithCount(joined,
      Seq(col("doc_id")), "rank", Seq("n_tok", "n_new"), Seq("cum_tokens", "cum_vocab"))
    cum
      .filter(col("rank").bitwiseAND(col("rank") - 1) === 0 ||
        col("rank") === nDocs)
      .select(col("rank").as("n_docs_seen"), col("cum_tokens"), col("cum_vocab"))
      .orderBy("n_docs_seen")
  }

  val queries: Map[String, Q] = Map(
    "llm_gate_agreement" -> (llmGateAgreement _),
    "llm_gate_pr_curve" -> (llmGatePrCurve _),
    "llm_gate_tau_adaptive" -> (llmGateTauAdaptive _),
    "llm_zipf_fit" -> (llmZipfFit _),
    "llm_heaps_growth" -> (llmHeapsGrowth _),
    "llm_perplexity" -> (llmPerplexity _),
    "llm_perplexity_holdout" -> (llmPerplexityHoldout _),
    "llm_ccnet_buckets" -> (llmCcnetBuckets _),
    "llm_perplexity_kn" -> (llmPerplexityKn _),
    "llm_dsir_weight" -> (llmDsirWeight _),
    "llm_gopher_rules" -> (llmGopherRules _),
    "llm_tfidf_cosine" -> (llmTfidfCosine _),
    "llm_pipeline_e2e" -> (llmPipelineE2e _),
    "llm_curation_e2e" -> (llmCurationE2e _),
    "llm_stratified_sample" -> (llmStratifiedSample _),
    "llm_pack_sequences" -> (llmPackSequences _),
    "llm_normalize_text" -> (llmNormalizeText _),
    "llm_bigram_top" -> (llmBigramTop _),
    "llm_dedup_prefix" -> (llmDedupPrefix _),
    "llm_centroid_sim" -> (llmCentroidSim _),
    "llm_shuffle_shards" -> (llmShuffleShards _),
    "llm_pii_scan" -> (llmPiiScan _),
    "llm_top_token_share" -> (llmTopTokenShare _),
    "llm_oov_rate" -> (llmOovRate _),
    "llm_tfidf_topk" -> (llmTfidfTopk _),
    "llm_bm25_topk" -> (llmBm25Topk _),
    "llm_hybrid_rrf" -> (llmHybridRrf _),
    "llm_hybrid_rrf_indexed" -> (llmHybridRrfIndexed _),
    "llm_rerank_topk" -> (llmRerankTopk _),
    "llm_rerank_recall" -> (llmRerankRecall _),
    "llm_lang_temperature" -> (llmLangTemperature _),
  )

  /** Shared w/bg oracle CTEs for the two perplexity keys — same
    * one-copy rule as [[bigramTower]] on the Spark side. */
  private val bigramOracleCtes: String =
    """WITH w AS (SELECT doc_id, pos, word FROM (SELECT doc_id, """ +
      "unnest(string_split(text, ' ')) AS word, " +
      "generate_subscripts(string_split(text, ' '), 1) AS pos FROM documents) " +
      "WHERE length(word) >= 1), " +
      "bg AS (SELECT doc_id, lag(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w1, word AS w2 " +
      "FROM w QUALIFY w1 IS NOT NULL), "

  // same integer-score discipline as the Spark side: one rounded ln()
  // per MODEL bigram, exact BIGINT nll sums, rounded exp at the end.
  // A def (not inlined in the map) because llm_ccnet_buckets nests it.
  private def perplexityOracle: String =
    bigramOracleCtes +
      "model AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2), " +
      "lc AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM model GROUP BY 1), " +
      "v AS (SELECT count(DISTINCT word) AS nv FROM w), " +
      "scores AS (SELECT m.w1, m.w2, CAST(floor(1e6 * ln(CAST(m.c12 + 1 AS DOUBLE) / (lc.c1 + v.nv)) + 0.5) AS BIGINT) AS s " +
      "FROM model m JOIN lc USING (w1), v) " +
      "SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
      "CAST(-sum(s.s) AS BIGINT) AS nll6, " +
      "floor(exp(CAST(-sum(s.s) AS DOUBLE) / 1e6 / count(*)) * 1e4 + 0.5) / 1e4 AS perplexity " +
      "FROM bg b JOIN scores s ON b.w1 = s.w1 AND b.w2 = s.w2 " +
      "GROUP BY b.doc_id ORDER BY b.doc_id"

  /** The BM25 scoring tower (toks → tf → dl/stats/dfreq → q → cand →
    * sc → ranked r) — ONE definition shared by the llm_bm25_topk and
    * llm_hybrid_rrf oracles, mirroring the shared Spark-side
    * [[bm25TopK]] kernel. */
  private val bm25OracleTower: String =
    "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents), " +
      "tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM toks " +
      "WHERE length(term) > 0 GROUP BY 1, 2), " +
      "dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1), " +
      "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl), " +
      "dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1), " +
      "q AS (SELECT DISTINCT doc_id AS q_id, term FROM tf WHERE doc_id % 97 = 0), " +
      "cand AS (SELECT q.q_id, tf.doc_id, tf.term, tf.tf FROM tf JOIN q ON tf.term = q.term " +
      "WHERE tf.doc_id <> q.q_id), " +
      "sc AS (SELECT q_id, cand.doc_id, " +
      "floor(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2 / " +
      "(tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) * 10000.0 + 0.5) / 10000.0 AS score " +
      "FROM cand JOIN dfreq USING (term) JOIN dl ON cand.doc_id = dl.doc_id CROSS JOIN stats " +
      "GROUP BY 1, 2), " +
      "r AS (SELECT q_id, doc_id, score, " +
      "row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank FROM sc) "

  /** The BM25 top-10 lexical rank-list CTE and the RRF fusion tail —
    * shared by the two hybrid-fusion oracles, mirroring the Spark-side
    * lexTop10/rrfFuse factoring. */
  private val lexTop10Cte: String =
    s"lex AS (SELECT q_id, doc_id, CAST(rank AS INTEGER) AS r_lex FROM r WHERE rank <= $FusionDepth)"

  private val rrfFusionCtes: String =
    "f AS (SELECT COALESCE(lex.q_id, dense.q_id) AS q_id, COALESCE(lex.doc_id, dense.doc_id) AS doc_id, r_lex, r_dense " +
      "FROM lex FULL OUTER JOIN dense ON lex.q_id = dense.q_id AND lex.doc_id = dense.doc_id), " +
      "sc2 AS (SELECT q_id, doc_id, r_lex, r_dense, " +
      "floor((COALESCE(1.0 / (60 + r_lex), 0.0) + COALESCE(1.0 / (60 + r_dense), 0.0)) * 1000000 + 0.5) / 1000000 AS rrf FROM f), " +
      "rr AS (SELECT sc2.*, CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS INTEGER) AS rank FROM sc2)"

  private val rrfFusionTailSql: String = rrfFusionCtes +
    " SELECT q_id, rank, doc_id, r_lex, r_dense, rrf FROM rr WHERE rank <= 5 ORDER BY q_id, rank"

  /** The full indexed-fusion oracle tower ENDING IN CTEs (bm25 tower +
    * 3-probe IVF chain + dense list + fusion `rr`) — shared by the
    * llm_hybrid_rrf_indexed key (adds the final select) and the two
    * re-rank keys (add the exact-re-rank tail on `rr`). */
  private val indexedFusionCtes: String =
    bm25OracleTower + ", " + lexTop10Cte + ", " +
      PortableQuantizer.ivfAssignChain(3) + ", " +
      "qa AS (SELECT id AS q_id, code FROM fin WHERE id % 97 = 0), " +
      "dcand AS (SELECT DISTINCT qa.q_id, f2.id AS doc_id " +
      "FROM qa JOIN fin f2 ON f2.code = qa.code AND f2.id <> qa.q_id), " +
      "dsc AS (SELECT c.q_id, c.doc_id, " +
      "round(list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]), CAST(en.embedding AS DOUBLE[])), 4) AS sim " +
      "FROM dcand c JOIN embeddings eq ON eq.vec_id = c.q_id " +
      "JOIN embeddings en ON en.vec_id = c.doc_id), " +
      "dense AS (SELECT q_id, doc_id, r_dense FROM " +
      "(SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, doc_id) AS INTEGER) AS r_dense FROM dsc) " +
      s"WHERE r_dense <= $FusionDepth), " +
      rrfFusionCtes

  /** The exact-re-rank chain over the fused candidates (`rr` rank ≤ 5 →
    * exact cosine → `rrk`) — mirrors the Spark-side exactRerank kernel;
    * shared by llm_rerank_topk and llm_rerank_recall. */
  private val rerankCtes: String =
    "cand5 AS (SELECT q_id, doc_id FROM rr WHERE rank <= 5), " +
      "rsc AS (SELECT c.q_id, c.doc_id, " +
      "round(list_cosine_similarity(CAST(eq2.embedding AS DOUBLE[]), CAST(en2.embedding AS DOUBLE[])), 4) AS sim " +
      "FROM cand5 c JOIN embeddings eq2 ON eq2.vec_id = c.q_id " +
      "JOIN embeddings en2 ON en2.vec_id = c.doc_id), " +
      "rrk AS (SELECT q_id, doc_id, sim, " +
      "CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, doc_id) AS INTEGER) AS rank FROM rsc)"

  /** The funnel's survivor tower as a reusable WITH-prefix ending in a
    * `kept(doc_id, source, text)` CTE — each stage is the verified oracle
    * of its graded key (gate = llm_quality_filter's WHERE, norm-md5
    * window = llm_pipeline_e2e's dedup, cluster chain =
    * llm_dedup_survivors' closure). Shared by llm_curation_e2e and
    * llm_gate_agreement so "survivor truth" has one SQL spelling too. */
  private def curationKeptSql: String =
    "WITH RECURSIVE g AS (SELECT doc_id, source, text FROM documents " +
      "WHERE n_chars BETWEEN 100 AND 500 AND lang IN ('en', 'fr', 'de') AND len(string_split(text, ' ')) >= 20), " +
      "ex AS (SELECT doc_id, source, text FROM " +
      "(SELECT *, row_number() OVER (PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) ORDER BY doc_id) AS rn FROM g) WHERE rn = 1), " +
      LlmTextOps.dedupClusterChain("ex") + ", " +
      "comps AS (SELECT id, min(comp) AS cluster_id FROM reach GROUP BY id), " +
      "kept AS (SELECT doc_id, source, text FROM ex WHERE doc_id NOT IN (SELECT id FROM comps WHERE id <> cluster_id))"

  val oracles: Map[String, String] = Map(
    // the truth side is the shared survivor tower; the gate sides are
    // the llm_gopher_rules oracle's rule arithmetic and the
    // llm_quality_score oracle's 6-dp score at the same tau = 0.55
    "llm_gate_agreement" ->
      (curationKeptSql + ", " +
        "gws AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> length(w) >= 1) AS ws FROM documents), " +
        "gm AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, " +
        "CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT) AS sum_len, " +
        s"len(list_filter(ws, w -> w IN (${MlOps.PinnedStopwords.map(w => s"'$w'").mkString(", ")}))) AS n_stop, " +
        "coalesce((SELECT max(c) FROM (SELECT count(*) AS c FROM unnest(ws) AS t(w) GROUP BY w)), 0) AS max_cnt " +
        "FROM gws), " +
        "gop AS (SELECT doc_id, (n_words BETWEEN 30 AND 90) AND (sum_len * 10 >= n_words * 39 AND sum_len * 10 <= n_words * 47) " +
        "AND n_stop >= 2 AND max_cnt * 8 <= n_words AS g_pass FROM gm), " +
        "qs AS (SELECT doc_id, round(0.6 * least(n_chars / 500.0, 1.0) + 0.4 * least(((n_chars - (len(string_split(text, ' ')) - 1)) / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 10.0, 1.0), 6) >= 0.55 AS q_pass FROM documents), " +
        "flags AS (SELECT d.doc_id, (k.doc_id IS NOT NULL) AS is_kept, gop.g_pass, qs.q_pass " +
        "FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id " +
        "JOIN gop ON d.doc_id = gop.doc_id JOIN qs ON d.doc_id = qs.doc_id), " +
        "c AS (SELECT 'gopher' AS gate, g_pass AS pass, is_kept FROM flags " +
        "UNION ALL SELECT 'quality_score' AS gate, q_pass AS pass, is_kept FROM flags), " +
        "agg AS (SELECT gate, " +
        "CAST(sum(CASE WHEN pass AND is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_tp, " +
        "CAST(sum(CASE WHEN pass AND NOT is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_fp, " +
        "CAST(sum(CASE WHEN NOT pass AND is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_fn, " +
        "CAST(sum(CASE WHEN NOT pass AND NOT is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_tn " +
        "FROM c GROUP BY gate) " +
        "SELECT gate, n_tp, n_fp, n_fn, n_tn, " +
        "CASE WHEN n_tp + n_fp > 0 THEN floor(CAST(n_tp AS DOUBLE) / CAST(n_tp + n_fp AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 END AS precision, " +
        "CASE WHEN n_tp + n_fn > 0 THEN floor(CAST(n_tp AS DOUBLE) / CAST(n_tp + n_fn AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 END AS recall " +
        "FROM agg ORDER BY gate"),
    // the same survivor tower and score expression as llm_gate_agreement,
    // swept over the 9-value unnest grid; identical floor-6dp arithmetic
    "llm_gate_pr_curve" ->
      (curationKeptSql + ", " +
        "qs AS (SELECT doc_id, round(0.6 * least(n_chars / 500.0, 1.0) + 0.4 * least(((n_chars - (len(string_split(text, ' ')) - 1)) / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 10.0, 1.0), 6) AS score FROM documents), " +
        "flags AS (SELECT d.doc_id, (k.doc_id IS NOT NULL) AS is_kept, qs.score " +
        "FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id " +
        "JOIN qs ON d.doc_id = qs.doc_id), " +
        // CAST: DuckDB parses the list literals as DECIMAL(2,1); the
        // output column (and the >= comparison) must be DOUBLE like Spark
        "t AS (SELECT CAST(unnest([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE) AS tau), " +
        "c AS (SELECT t.tau, f.is_kept, f.score >= t.tau AS pass FROM flags f CROSS JOIN t), " +
        "agg AS (SELECT tau, " +
        "CAST(sum(CASE WHEN pass AND is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_tp, " +
        "CAST(sum(CASE WHEN pass AND NOT is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_fp, " +
        "CAST(sum(CASE WHEN NOT pass AND is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_fn, " +
        "CAST(sum(CASE WHEN NOT pass AND NOT is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_tn " +
        "FROM c GROUP BY tau) " +
        "SELECT tau, n_tp, n_fp, n_fn, n_tn, " +
        "CASE WHEN n_tp + n_fp > 0 THEN floor(CAST(n_tp AS DOUBLE) / CAST(n_tp + n_fp AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 END AS precision, " +
        "CASE WHEN n_tp + n_fn > 0 THEN floor(CAST(n_tp AS DOUBLE) / CAST(n_tp + n_fn AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 END AS recall " +
        "FROM agg ORDER BY tau"),
    // the same survivor tower and score expression; tau is the exact
    // order statistic at ascending rank ceil(0.6 n) — integer rank
    // arithmetic ((6n + 9) // 10) and a stored score value on both
    // engines, no interpolation
    "llm_gate_tau_adaptive" ->
      (curationKeptSql + ", " +
        "qs AS (SELECT doc_id, round(0.6 * least(n_chars / 500.0, 1.0) + 0.4 * least(((n_chars - (len(string_split(text, ' ')) - 1)) / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 10.0, 1.0), 6) AS score FROM documents), " +
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qs), " +
        "rk AS (SELECT score, row_number() OVER (ORDER BY score, doc_id) AS r FROM qs), " +
        "tv AS (SELECT score AS tau FROM rk, nn WHERE r = (6 * nn.n + 9) // 10), " +
        "flags AS (SELECT d.doc_id, (k.doc_id IS NOT NULL) AS is_kept, qs.score " +
        "FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id " +
        "JOIN qs ON d.doc_id = qs.doc_id), " +
        "agg AS (SELECT tv.tau, " +
        "CAST(sum(CASE WHEN score >= tv.tau AND is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_tp, " +
        "CAST(sum(CASE WHEN score >= tv.tau AND NOT is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_fp, " +
        "CAST(sum(CASE WHEN score < tv.tau AND is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_fn, " +
        "CAST(sum(CASE WHEN score < tv.tau AND NOT is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_tn " +
        "FROM flags CROSS JOIN tv GROUP BY tv.tau) " +
        "SELECT tau, n_tp, n_fp, n_fn, n_tn, " +
        "CASE WHEN n_tp + n_fp > 0 THEN floor(CAST(n_tp AS DOUBLE) / CAST(n_tp + n_fp AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 END AS precision, " +
        "CASE WHEN n_tp + n_fn > 0 THEN floor(CAST(n_tp AS DOUBLE) / CAST(n_tp + n_fn AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 END AS recall " +
        "FROM agg ORDER BY tau"),
    // pure integer counts; first-occurrence attribution mirrored, the
    // power-of-two checkpoint test is the same rank & (rank-1) trick
    "llm_heaps_growth" ->
      ("WITH words AS (SELECT doc_id, word FROM " +
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) " +
        "WHERE length(word) >= 1), " +
        "perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok FROM words GROUP BY 1), " +
        "fo AS (SELECT min(doc_id) AS doc_id FROM words GROUP BY word), " +
        "nn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_new FROM fo GROUP BY 1), " +
        "j AS (SELECT p.doc_id, n_tok, coalesce(n_new, 0) AS n_new FROM perdoc p LEFT JOIN nn USING (doc_id)), " +
        "c AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rank, " +
        "CAST(sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens, " +
        "CAST(sum(n_new) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab, " +
        "CAST(count(*) OVER () AS BIGINT) AS n_total FROM j) " +
        "SELECT CAST(rank AS BIGINT) AS n_docs_seen, cum_tokens, cum_vocab FROM c " +
        "WHERE (rank & (rank - 1)) = 0 OR rank = n_total ORDER BY n_docs_seen"),
    // per-vocab-row millionth-nat logs (BIGINT) before any moment sum;
    // the closed-form OLS mirrors the Spark expression tree exactly
    "llm_zipf_fit" ->
      ("WITH freqs AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS word FROM documents) " +
        "WHERE length(word) >= 1 GROUP BY 1), " +
        "xy AS (SELECT freq, " +
        "CAST(floor(1e6 * ln(CAST(row_number() OVER (ORDER BY freq DESC, word) AS DOUBLE)) + 0.5) AS BIGINT) AS x, " +
        "CAST(floor(1e6 * ln(CAST(freq AS DOUBLE)) + 0.5) AS BIGINT) AS y FROM freqs), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS nv, CAST(sum(freq) AS BIGINT) AS n_tokens, " +
        "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
        "sum(x * x) AS sxx, sum(x * y) AS sxy, " +
        "sum(y * y) AS syy FROM xy), " +
        "c AS (SELECT nv, n_tokens, CAST(nv AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS dx, " +
        "CAST(sy AS DOUBLE) AS dy, CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS dxx, " +
        "CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS dxy, " +
        "CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS dyy FROM m), " +
        "f AS (SELECT nv, n_tokens, (n * dxy - dx * dy) / (n * dxx - dx * dx) AS slope, " +
        "((n * dxy - dx * dy) * (n * dxy - dx * dy)) / ((n * dxx - dx * dx) * (n * dyy - dy * dy)) AS r2, " +
        "n, dx, dy FROM c), " +
        "g AS (SELECT nv, n_tokens, slope, (dy - slope * dx) / n AS intercept, r2 FROM f) " +
        "SELECT nv AS n_vocab, n_tokens, " +
        "sign(slope) * (floor(abs(slope) * 1000000.0 + 0.5) / 1000000.0) + 0.0 AS slope, " +
        "sign(intercept) * (floor(abs(intercept) * 1000000.0 + 0.5) / 1000000.0) + 0.0 AS intercept, " +
        "sign(r2) * (floor(abs(r2) * 1000000.0 + 0.5) / 1000000.0) + 0.0 AS r2 FROM g"),
    "llm_perplexity" -> perplexityOracle,
    // KN: same tower, the score formula parenthesized exactly as the
    // Spark side (identical IEEE op sequence); d = 0.75 is binary-exact
    "llm_perplexity_kn" ->
      (bigramOracleCtes +
        "model AS MATERIALIZED (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2), " +
        "lc AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, count(*) AS n1p_w1 FROM model GROUP BY 1), " +
        "cont AS (SELECT w2, count(*) AS n1p_w2 FROM model GROUP BY 1), " +
        "nt AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM model), " +
        "scores AS (SELECT m.w1, m.w2, CAST(floor(1e6 * ln(" +
        "(CAST(m.c12 AS DOUBLE) - 0.75) / CAST(lc.c1 AS DOUBLE) + " +
        "(0.75 * CAST(lc.n1p_w1 AS DOUBLE) / CAST(lc.c1 AS DOUBLE)) * " +
        "(CAST(cont.n1p_w2 AS DOUBLE) / nt.nt)) + 0.5) AS BIGINT) AS s " +
        "FROM model m JOIN lc USING (w1) JOIN cont USING (w2), nt) " +
        "SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
        "CAST(-sum(s.s) AS BIGINT) AS nll6, " +
        "floor(exp(CAST(-sum(s.s) AS DOUBLE) / 1e6 / count(*)) * 1e4 + 0.5) / 1e4 AS perplexity " +
        "FROM bg b JOIN scores s ON b.w1 = s.w1 AND b.w2 = s.w2 " +
        "GROUP BY b.doc_id ORDER BY b.doc_id"),
    // the perplexity oracle nested as a subquery (it carries its own
    // WITH tower), joined to documents for lang/chars, then the same
    // ntile cut — Spark and DuckDB share SQL-standard ntile semantics
    // (larger groups first when the partition doesn't divide by 3)
    "llm_ccnet_buckets" ->
      (s"WITH j AS (SELECT p.doc_id, d.lang, d.n_chars, p.perplexity, " +
        "ntile(3) OVER (PARTITION BY d.lang ORDER BY p.perplexity, p.doc_id) AS b " +
        s"FROM ($perplexityOracle) p JOIN documents d ON p.doc_id = d.doc_id) " +
        "SELECT lang, CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket, " +
        "CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars, " +
        "min(perplexity) AS ppl_min, max(perplexity) AS ppl_max " +
        "FROM j GROUP BY 1, 2 ORDER BY lang, bucket"),
    // every rule decided in exact integer arithmetic on both engines —
    // the per-doc word-count table replaces the Spark side's run-length
    // fold (same max-count value, different mechanics)
    "llm_gopher_rules" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> length(w) >= 1) AS ws FROM documents), " +
        "m AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, " +
        "CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT) AS sum_len, " +
        s"len(list_filter(ws, w -> w IN (${MlOps.PinnedStopwords.map(w => s"'$w'").mkString(", ")}))) AS n_stop, " +
        "coalesce((SELECT max(c) FROM (SELECT count(*) AS c FROM unnest(ws) AS t(w) GROUP BY w)), 0) AS max_cnt " +
        "FROM d) " +
        "SELECT doc_id, n_words, " +
        "n_words BETWEEN 30 AND 90 AS r_word_count, " +
        "(sum_len * 10 >= n_words * 39 AND sum_len * 10 <= n_words * 47) AS r_mean_word_len, " +
        "n_stop >= 2 AS r_stopwords, " +
        "max_cnt * 8 <= n_words AS r_top_token, " +
        "(n_words BETWEEN 30 AND 90) AND (sum_len * 10 >= n_words * 39 AND sum_len * 10 <= n_words * 47) " +
        "AND n_stop >= 2 AND max_cnt * 8 <= n_words AS pass " +
        "FROM m ORDER BY doc_id"),
    // per-word log-ratios round to millionth-nats BEFORE the doc sum
    // (exact BIGINT, same as nll6); smoothing totals are plain scalars
    "llm_dsir_weight" ->
      ("WITH words AS (SELECT doc_id, lang, word FROM " +
        "(SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents) " +
        "WHERE length(word) >= 1), " +
        "cc AS (SELECT word, CAST(count(*) AS BIGINT) AS cc FROM words GROUP BY 1), " +
        "tc AS (SELECT word, CAST(count(*) AS BIGINT) AS tc FROM words WHERE lang = 'en' GROUP BY 1), " +
        "tot AS (SELECT count(*) AS totc, sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tott, " +
        "(SELECT count(*) FROM cc) AS nv FROM words), " +
        "scores AS (SELECT cc.word, " +
        "CAST(floor(1e6 * ln(CAST(coalesce(tc.tc, 0) + 1 AS DOUBLE) / (tot.tott + tot.nv)) + 0.5) AS BIGINT) - " +
        "CAST(floor(1e6 * ln(CAST(cc.cc + 1 AS DOUBLE) / (tot.totc + tot.nv)) + 0.5) AS BIGINT) AS s " +
        "FROM cc LEFT JOIN tc USING (word), tot) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, " +
        "CAST(sum(s) AS BIGINT) AS logratio6, sum(s) > 0 AS selected " +
        "FROM words JOIN scores USING (word) GROUP BY doc_id ORDER BY doc_id"),
    // frozen-model variant: model CTEs filter to the train split, the
    // holdout scores through left-join coalesce defaults (c12=0, c1=0)
    "llm_perplexity_holdout" ->
      (bigramOracleCtes +
        "model AS (SELECT w1, w2, count(*) AS c12 FROM bg WHERE doc_id % 10 < 8 GROUP BY 1, 2), " +
        "lc AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM model GROUP BY 1), " +
        "v AS (SELECT count(DISTINCT word) AS nv FROM w WHERE doc_id % 10 < 8), " +
        "scored AS (SELECT b.doc_id, m.c12, " +
        "CAST(floor(1e6 * ln(CAST(coalesce(m.c12, 0) + 1 AS DOUBLE) / (coalesce(lc.c1, 0) + v.nv)) + 0.5) AS BIGINT) AS s " +
        "FROM bg b LEFT JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2 " +
        "LEFT JOIN lc ON b.w1 = lc.w1 CROSS JOIN v WHERE b.doc_id % 10 >= 8) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
        "CAST(sum(CASE WHEN c12 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_bigrams, " +
        "CAST(-sum(s) AS BIGINT) AS nll6, " +
        "floor(exp(CAST(-sum(s) AS DOUBLE) / 1e6 / count(*)) * 1e4 + 0.5) / 1e4 AS perplexity " +
        "FROM scored GROUP BY doc_id ORDER BY doc_id"),
    // w is quantized to FLOAT (the Spark side's storage contract), then
    // widened back to DOUBLE before the norm/dot sums — exactly the
    // float->double widening the Scala kernel does per element.
    "llm_tfidf_cosine" ->
      ("WITH tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM " +
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) " +
        "WHERE length(term) > 0 GROUP BY 1, 2), " +
        "dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1), " +
        "nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents), " +
        "wf AS (SELECT doc_id, tf.term, CAST(tf.tf * (ln((nd.nd + 1.0) / (dfreq.df + 1.0)) + 1.0) AS FLOAT) AS w " +
        "FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN nd), " +
        "w AS (SELECT doc_id, term, CAST(w AS DOUBLE) AS w FROM wf), " +
        "nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1), " +
        "dots AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, sum(a.w * b.w) AS dot " +
        "FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT a_id, b_id, round(dot / (na.nrm * nb.nrm), 4) AS sim " +
        "FROM dots JOIN nrm na ON dots.a_id = na.doc_id JOIN nrm nb ON dots.b_id = nb.doc_id " +
        "ORDER BY sim DESC, a_id, b_id LIMIT 25"),
    "llm_pipeline_e2e" ->
      ("WITH f AS (SELECT doc_id, source, text, " +
        "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_md5 " +
        "FROM documents WHERE n_chars BETWEEN 100 AND 500 AND lang IN ('en', 'fr', 'de') AND len(string_split(text, ' ')) >= 20), " +
        "s AS (SELECT doc_id, source, text FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY norm_md5 ORDER BY doc_id) AS rn FROM f) WHERE rn = 1), " +
        "p AS (SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM s) " +
        "SELECT doc_id, source, tok, CAST(floor((sum(tok) OVER " +
        "(PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok) / 512.0) AS INTEGER) AS bin " +
        "FROM p ORDER BY doc_id"),
    // the funnel tower: each CTE is the verified oracle of its stage key
    // (gate = llm_quality_filter's WHERE, norm-md5 window = the
    // llm_pipeline_e2e dedup CTE, cluster chain = the llm_dedup_survivors
    // closure via LlmTextOps.dedupClusterChain over the funnel's `ex`,
    // token cost = llm_token_count's ceil(len/4)); the one float is the
    // mirrored 6 dp share. DuckDB sums of BIGINT go HUGEINT, hence the
    // CASTs back.
    "llm_curation_e2e" ->
      (curationKeptSql + ", " +
        "ktok AS (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words, " +
        "CAST(list_sum(list_transform(string_split(text, ' '), x -> ceil(length(x) / 4.0))) AS BIGINT) AS bpe FROM kept), " +
        "ragg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_raw FROM documents GROUP BY 1), " +
        "gagg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_gated FROM g GROUP BY 1), " +
        "eagg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact FROM ex GROUP BY 1), " +
        "kagg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept, " +
        "CAST(sum(n_words) AS BIGINT) AS n_words, CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens FROM ktok GROUP BY 1), " +
        // NULL-safe joins + NULLS FIRST: Spark's single groupBy keeps a
        // NULL source group and sorts it first — the lang-confusion NULL
        // discipline, applied from day one here
        "j AS (SELECT r.source, n_raw, COALESCE(g2.n_gated, 0) AS n_gated, COALESCE(e2.n_exact, 0) AS n_exact, " +
        "COALESCE(k2.n_kept, 0) AS n_kept, COALESCE(k2.n_words, 0) AS n_words, COALESCE(k2.n_bpe_tokens, 0) AS n_bpe_tokens " +
        "FROM ragg r LEFT JOIN gagg g2 ON r.source IS NOT DISTINCT FROM g2.source " +
        "LEFT JOIN eagg e2 ON r.source IS NOT DISTINCT FROM e2.source " +
        "LEFT JOIN kagg k2 ON r.source IS NOT DISTINCT FROM k2.source) " +
        "SELECT source, n_raw, n_gated, n_exact, n_kept, n_words, n_bpe_tokens, " +
        "floor(CAST(n_bpe_tokens AS DOUBLE) / CAST(sum(n_bpe_tokens) OVER () AS DOUBLE) * 1000000 + 0.5) / 1000000 AS token_share " +
        "FROM j ORDER BY source NULLS FIRST"),
    "llm_stratified_sample" ->
      ("SELECT source, count(*) AS n_kept FROM (SELECT source, " +
        "CAST(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 100 AS INTEGER) AS bucket FROM documents) " +
        // TRY_CAST mirrors Spark's null-tolerant cast: on a digit-less
        // source Spark's ''::int is NULL -> otherwise(20), while a plain
        // DuckDB CAST('' AS INTEGER) would abort the whole oracle query
        "WHERE bucket < (CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INTEGER) % 2 = 0 THEN 80 ELSE 20 END) " +
        "GROUP BY source ORDER BY source"),
    "llm_pack_sequences" ->
      ("SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok, " +
        "CAST(floor((sum(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER " +
        "(PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "- CAST(len(string_split(text, ' ')) AS BIGINT)) / 512.0) AS INTEGER) AS bin " +
        "FROM documents ORDER BY doc_id"),
    "llm_normalize_text" ->
      ("SELECT doc_id, CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS INTEGER) AS norm_len, " +
        "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_md5 " +
        "FROM documents ORDER BY doc_id"),
    "llm_bigram_top" ->
      ("WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents), " +
        "x AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w WHERE len(ws) >= 2) " +
        "SELECT array_to_string(ws[i:i+1], ' ') AS bigram, count(*) AS cnt FROM x " +
        "GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 25"),
    "llm_dedup_prefix" ->
      ("SELECT substr(lower(text), 1, 40) AS prefix, min(doc_id) AS survivor_id, count(*) AS n_docs " +
        "FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY survivor_id"),
    "llm_centroid_sim" ->
      ("WITH p AS (SELECT label, i, CAST(embedding[i] AS DOUBLE) AS v FROM " +
        "(SELECT label, embedding, unnest(generate_series(1, len(embedding))) AS i FROM embeddings)), " +
        "c0 AS (SELECT label, i, avg(v) AS c FROM p GROUP BY label, i), " +
        "cent AS (SELECT label, list(c ORDER BY i) AS centroid FROM c0 GROUP BY label) " +
        "SELECT vec_id, label, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), centroid), 4) AS sim " +
        "FROM embeddings JOIN cent USING (label) ORDER BY vec_id"),
    "llm_shuffle_shards" ->
      ("WITH h AS (SELECT doc_id, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS hkey FROM documents), " +
        "s AS (SELECT doc_id, hkey, CAST(hkey % 16 AS INTEGER) AS shard FROM h) " +
        "SELECT doc_id, shard, CAST(row_number() OVER (PARTITION BY shard ORDER BY hkey, doc_id) AS INTEGER) AS pos " +
        "FROM s ORDER BY doc_id"),
    "llm_oov_rate" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), " +
        "vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1), " +
        "kept AS (SELECT tok FROM (SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rk FROM vocab) WHERE rk <= 1000) " +
        "SELECT doc_id, count(*) AS n_toks, " +
        "CAST(sum(CASE WHEN k.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov, " +
        "round(sum(CASE WHEN k.tok IS NULL THEN 1 ELSE 0 END) / count(*), 4) AS oov_rate " +
        "FROM toks LEFT JOIN kept k ON toks.tok = k.tok GROUP BY doc_id ORDER BY doc_id"),
    // same smoothed-idf formula and rounded-score ranking as the Spark op
    "llm_tfidf_topk" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), " +
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2), " +
        "dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok), " +
        "n AS (SELECT count(*) AS n_docs FROM documents), " +
        "sc AS (SELECT doc_id, tok, tf, df, floor(tf * ln((n_docs + 1.0) / (df + 1.0)) * 1e6 + 0.5) / 1e6 AS score " +
        "FROM tf JOIN dfreq USING (tok) CROSS JOIN n), " +
        "r AS (SELECT doc_id, tok, tf, df, score, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rank FROM sc) " +
        "SELECT doc_id, CAST(rank AS INTEGER) AS rank, tok, tf, df, score FROM r WHERE rank <= 3 ORDER BY doc_id, rank"),
    // idf/tf-saturation arithmetic mirrored token-for-token from the
    // Spark expression; the pair score rounds to 4 dp BEFORE ranking on
    // both engines so rank is decided on identical doubles
    "llm_bm25_topk" ->
      (bm25OracleTower +
        "SELECT q_id, CAST(rank AS INTEGER) AS rank, doc_id, score FROM r " +
        "WHERE rank <= 3 ORDER BY q_id, rank"),
    // the two graded retrieval stacks fused: the bm25 tower (rank <= 10)
    // + a dense cosine rank list (the llm_knn discipline: 4 dp sim, tie
    // by doc_id), full-outer joined and scored 1/(60+r_lex)+1/(60+r_dense)
    // with an absent stack contributing 0 via the NULL-propagating
    // division; lexical-first addition and floor-half-up 6 dp mirror the
    // Spark side exactly (shared fusion tail, like the Spark rrfFuse)
    "llm_hybrid_rrf" ->
      (bm25OracleTower + ", " + lexTop10Cte + ", " +
        "eq AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id % 97 = 0), " +
        "dsim AS (SELECT eq.q_id, e.vec_id AS doc_id, " +
        "round(list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 4) AS sim " +
        "FROM eq JOIN embeddings e ON e.vec_id <> eq.q_id), " +
        "dr AS (SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, doc_id) AS INTEGER) AS r_dense FROM dsim), " +
        s"dense AS (SELECT q_id, doc_id, r_dense FROM dr WHERE r_dense <= $FusionDepth), " +
        rrfFusionTailSql),
    // the same lexical list + fusion tail, dense list from the 3-probe
    // IVF inverted lists (the index-served twin; chain CTE names are
    // disjoint from the bm25 tower's)
    "llm_hybrid_rrf_indexed" ->
      (indexedFusionCtes +
        " SELECT q_id, rank, doc_id, r_lex, r_dense, rrf FROM rr WHERE rank <= 5 ORDER BY q_id, rank"),
    // the two-stage serving tail: fused candidates re-ranked by exact
    // cosine (shared rerank chain), top-3 per query
    "llm_rerank_topk" ->
      (indexedFusionCtes + ", " + rerankCtes +
        " SELECT q_id, rank, doc_id, sim FROM rrk WHERE rank <= 3 ORDER BY q_id, rank"),
    // recall of the brute-force dense top-3 truth among the re-ranked
    // pipeline rows (single-row report, mirrored 6 dp division)
    "llm_rerank_recall" ->
      (indexedFusionCtes + ", " + rerankCtes + ", " +
        "rk AS (SELECT q_id, doc_id FROM rrk WHERE rank <= 3), " +
        "bq AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id % 97 = 0), " +
        "bsim AS (SELECT bq.q_id, e.vec_id AS doc_id, " +
        "round(list_cosine_similarity(CAST(bq.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 4) AS sim " +
        "FROM bq JOIN embeddings e ON e.vec_id <> bq.q_id), " +
        "btr AS (SELECT q_id, doc_id FROM " +
        "(SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, doc_id) AS rn FROM bsim) " +
        "WHERE rn <= 3), " +
        "agg AS (SELECT CAST(count(*) AS BIGINT) AS n_truth, " +
        "CAST(count(rk.doc_id) AS BIGINT) AS n_hit " +
        "FROM btr LEFT JOIN rk ON btr.q_id = rk.q_id AND btr.doc_id = rk.doc_id) " +
        "SELECT n_truth, n_hit, floor(n_hit / CAST(n_truth AS DOUBLE) * 1000000 + 0.5) / 1000000 AS recall FROM agg"),
    "llm_lang_temperature" ->
      ("WITH bl AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1), " +
        "t AS (SELECT CAST(sum(n) AS BIGINT) AS ntot FROM bl), " +
        "p AS (SELECT lang, n, n / ntot AS share, sqrt(n / ntot) AS pw FROM bl CROSS JOIN t), " +
        "z AS (SELECT sum(pw) AS z FROM p) " +
        "SELECT lang, n, round(share, 6) AS share, round(pw / z, 6) AS w, " +
        "round(pw / z / share, 4) AS boost FROM p CROSS JOIN z ORDER BY lang"),
    "llm_pii_scan" ->
      ("SELECT doc_id, CAST(len(regexp_extract_all(text, '\\d{4,}')) AS INTEGER) AS n_longnum, " +
        "CAST(len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+')) AS INTEGER) AS n_emailish, " +
        "CAST(len(regexp_extract_all(text, '\\d{2,3}-\\d{3,4}-\\d{3,4}')) AS INTEGER) AS n_dashed, " +
        "(len(regexp_extract_all(text, '\\d{4,}')) + len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+')) " +
        "+ len(regexp_extract_all(text, '\\d{2,3}-\\d{3,4}-\\d{3,4}'))) > 0 AS pii_flag " +
        "FROM documents ORDER BY doc_id"),
    "llm_top_token_share" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), " +
        "c AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2) " +
        "SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_share, count(*) AS n_unique " +
        "FROM c GROUP BY doc_id ORDER BY doc_id"),
  )
}
