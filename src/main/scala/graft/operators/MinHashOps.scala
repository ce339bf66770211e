package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MinHash + LSH near-duplicate detection with a PORTABLE, fully
  * deterministic hash family — unlike the MLlib MinHashLSH twin
  * (graft.ml.MlPipelines.nearDupMinhash, seeded but implementation-
  * specific), this variant is pure integer arithmetic over md5-derived
  * shingle ids, so it carries a DuckDB oracle and is graded end-to-end.
  *
  * Pipeline: 3-gram word shingles (distinct per doc) → 60-bit shingle id
  * from the md5 hex prefix → 16 universal hashes h_j(x) = (a_j·x + b_j)
  * mod p (p = 2^31−1; products stay under 2^63) → per-doc signature =
  * column-wise min → 4 bands × 4 rows → docs sharing any band key become
  * a candidate pair, scored by how many bands agree.
  *
  * Scale posture (100 TB): the band key IS the shuffle key — candidates
  * are generated per bucket, never all-pairs. Signatures are one
  * shuffle (groupBy doc); banding is a projection; the pair join's
  * fan-out is bounded by bucket size, with hot buckets (boilerplate
  * docs) handled by AQE skew splitting or a bucket-size cap upstream.
  * Probability a pair with Jaccard s becomes a candidate:
  * 1 − (1 − s⁴)⁴ (≈ 1 for s ≥ 0.9, ≈ 0.04 for s = 0.5).
  */
object MinHashOps {
  type Q = (SparkSession, String) => DataFrame

  private val P = 2147483647L // 2^31 - 1 (prime)
  private val NumHashes = 16
  private val BandRows = 4
  private val NumBands = NumHashes / BandRows
  /** Pinned hash-family coefficients — identical literals are emitted
    * into the DuckDB oracle, so both engines run the same arithmetic. */
  private val As: IndexedSeq[Long] = (0 until NumHashes).map(j => 976369L + 104729L * j)
  private val Bs: IndexedSeq[Long] = (0 until NumHashes).map(j => 1234567L + 7919L * j)

  /** Per-doc 16-slot MinHash signature over distinct 3-gram shingles.
    * No explode over hash functions: the 16 mins are 16 aggregate
    * expressions in ONE 2-phase hash aggregation (partial min map-side).
    * Shingle ids come from the native HashedShingles expression (round
    * 6) — the same 60-bit md5-prefix value the previous string-form
    * `conv(substring(md5(sh)))` computed, so h32 and the oracle are
    * unchanged, but the window construction is compiled, not an
    * interpreted transform lambda. */
  def minhashSignatures(docs: DataFrame): DataFrame =
    sigFromH32(docs
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), explode(array_distinct(
        org.apache.spark.sql.graftnative.GraftNative.hashedShingles(col("ws"), 3))).as("sid"))
      .select(col("doc_id"), (col("sid") % P).as("h32")))

  /** The 16-hash min-aggregation over (doc_id, h32) rows — ONE
    * definition of the signature arithmetic for the standalone path and
    * [[signaturesFromIndex]], so the hash family cannot silently diverge
    * between the graded dedup key and the recall key's candidates. */
  private def sigFromH32(h: DataFrame): DataFrame = {
    val mins = (0 until NumHashes).map(j =>
      min((lit(As(j)) * col("h32") + lit(Bs(j))) % P).as(s"s$j"))
    h.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs: explode each signature into 4 band keys, join
    * docs sharing a (band, key), count agreeing bands per pair.
    *
    * `maxBucketSize` is the hot-bucket cap the scale posture requires: a
    * bucket of m docs fans out m(m-1)/2 pairs, so one boilerplate bucket
    * (empty pages, license headers) can dominate the whole join. Buckets
    * past the cap are dropped BEFORE the self-join — the standard LSH
    * treatment: a bucket that hot carries no discriminating signal. The
    * bucket size comes from a window count partitioned by the same
    * (band, key) the join shuffles on, so the exchange is reused, not
    * doubled. `None` (the graded default) means uncapped; real corpora
    * pass something like `Some(1000)`-`Some(10000)`. Option, not an
    * in-band magic Int: with a sentinel value, a caller explicitly
    * requesting a cap of exactly the sentinel silently got no cap. */
  def minhashCandidates(docs: DataFrame,
                        maxBucketSize: Option[Int] = None): DataFrame =
    bandedCandidates(minhashSignatures(docs), maxBucketSize)

  /** Signatures from an already-built shingle POSTING list (the
    * [[LlmTextOps.shingleIndex]] shape: distinct (doc_id, sh) rows with
    * 60-bit md5-prefix ids) — h32 is the same id mod p the standalone
    * path computes, so signatures are identical; this entry point lets
    * [[llmMinhashRecall]] share ONE shingle base between the Jaccard
    * truth and the MinHash candidates, like its oracle does. */
  private def signaturesFromIndex(sh: DataFrame): DataFrame =
    sigFromH32(sh.select(col("doc_id"), (col("sh") % P).as("h32")))

  /** The banding + bucket self-join tail over any signature frame. */
  private def bandedCandidates(sig: DataFrame,
                               maxBucketSize: Option[Int]): DataFrame = {
    val bandCols = (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until BandRows).map(r => col(s"s${BandRows * b + r}")): _*).as("key"))
    }
    val exploded = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    // Uncapped (None, the graded default): skip the window entirely — a
    // filter that cannot fire should not cost a sort. EVERY explicit
    // Some(cap) is applied, however large: an earlier in-band sentinel
    // silently disabled a caller's cap that happened to equal it, leaving
    // the hot-bucket blowup the parameter exists to prevent.
    val banded = maxBucketSize match {
      case None => exploded
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "key")
        exploded.withColumn("bucket_n", count(lit(1)).over(w))
          .filter(col("bucket_n") <= cap)
          .drop("bucket_n")
    }
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_bands"))
  }

  def llmDedupMinhash(s: SparkSession, d: String): DataFrame =
    minhashCandidates(Tables.load(s, d, "documents")).orderBy("a_id", "b_id")

  /** MinHash self-evaluation — the ann_*_recall discipline applied to
    * the TEXT near-dup index, completing the "every index grades itself"
    * story (banded hyperplane LSH, IVF single/multi-probe, the re-rank
    * pipeline end, and now the MinHash bands): recall of the exact
    * capped 3-gram-Jaccard ≥ 0.8 pairs (the llm_ngram_jaccard machinery
    * at the near-dup threshold) among the LSH candidate pairs. The
    * banding curve predicts 1 − (1 − s⁴)⁴ ≈ 0.88 at s = 0.8 and → 1 as
    * s → 1; the measured number makes the curve a queryable fact for
    * THIS corpus. Truth and candidates share ONE shingle base — the
    * MEMOIZED fixture index the whole jaccard/containment/dedup family
    * serves from (per (session, corpus), released at the family
    * boundary; not a bare per-call localCheckpoint) — matching the
    * oracle's shape, whose Jaccard and signature towers read the same
    * 60-bit id CTE; the fusion is one join of two bounded pair lists. */
  def llmMinhashRecall(s: SparkSession, d: String): DataFrame = {
    val sh = graft.operators.LlmTextOps.fixtureShingleIndex(s, d)
    val truth = graft.operators.LlmTextOps.jaccardPairs(sh, 0.8,
        maxPosting = graft.operators.LlmTextOps.StopShingleCap)
      .select("a_id", "b_id")
    val cand = bandedCandidates(signaturesFromIndex(sh), None)
      .select(col("a_id"), col("b_id"), lit(1L).as("hit"))
    truth.join(cand, Seq("a_id", "b_id"), "left")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("n_truth"), col("n_hit"),
        (floor(col("n_hit").cast("double") / col("n_truth").cast("double") *
          1000000.0 + 0.5) / 1000000.0).as("recall"))
  }

  val queries: Map[String, Q] = Map(
    "llm_dedup_minhash" -> (llmDedupMinhash _),
    "llm_minhash_recall" -> (llmMinhashRecall _),
  )

  val oracles: Map[String, String] = {
    val sigCols = (0 until NumHashes)
      .map(j => s"min((${As(j)} * h32 + ${Bs(j)}) % $P) AS s$j").mkString(", ")
    val bandSelects = (0 until NumBands).map { b =>
      val key = (0 until BandRows).map(r => s"s${BandRows * b + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws(',', $key) AS key FROM sig"
    }.mkString(" UNION ALL ")
    Map(
      "llm_dedup_minhash" ->
        (s"WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
          "x AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM w), " +
          "sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS sh FROM x), " +
          s"h AS (SELECT doc_id, CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) % $P AS h32 FROM sh), " +
          s"sig AS (SELECT doc_id, $sigCols FROM h GROUP BY doc_id), " +
          s"bands AS ($bandSelects) " +
          "SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_bands " +
          "FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id " +
          "GROUP BY 1, 2 ORDER BY a_id, b_id"),
      // ONE shared shingle base (the 60-bit md5-prefix ids both graded
      // towers derive from): the capped Jaccard truth reads it directly,
      // the MinHash side takes the same ids mod p — mirroring the Spark
      // plan, where shingleIndex and minhashSignatures share
      // HashedShingles output
      "llm_minhash_recall" ->
        (s"WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
          "x AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM w), " +
          "sh AS (SELECT DISTINCT doc_id, CAST('0x' || substr(md5(array_to_string(ws[i:i+2], ' ')), 1, 15) AS BIGINT) AS sh FROM x), " +
          "sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id), " +
          "shc AS (SELECT doc_id, sh FROM sh QUALIFY count(*) OVER (PARTITION BY sh) <= 500), " +
          "pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter " +
          "FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
          "truth AS (SELECT a_id, b_id FROM pairs JOIN sizes sa ON sa.doc_id = a_id " +
          "JOIN sizes sb ON sb.doc_id = b_id " +
          "WHERE round(inter / (sa.n_sh + sb.n_sh - inter), 4) >= 0.8), " +
          s"mh AS (SELECT doc_id, sh % $P AS h32 FROM sh), " +
          s"sig AS (SELECT doc_id, $sigCols FROM mh GROUP BY doc_id), " +
          s"bands AS ($bandSelects), " +
          "cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id " +
          "FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id " +
          "GROUP BY 1, 2), " +
          "agg AS (SELECT CAST(count(*) AS BIGINT) AS n_truth, CAST(count(c.a_id) AS BIGINT) AS n_hit " +
          "FROM truth t LEFT JOIN cand c ON t.a_id = c.a_id AND t.b_id = c.b_id) " +
          "SELECT n_truth, n_hit, " +
          "floor(n_hit / CAST(n_truth AS DOUBLE) * 1000000 + 0.5) / 1000000 AS recall FROM agg"),
    )
  }
}
