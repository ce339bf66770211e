package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Above-fixture-scale evidence run: drives the SCALE-CRITICAL linear
  * paths on synthetic data 10–100× the sf0.1 fixtures (5 M events, 200 k
  * documents, 50 k vectors), generated EXECUTOR-SIDE from `spark.range`
  * so the driver never materializes a row. The quadratic-exact paths
  * (block BNL) are deliberately excluded — their scale story is the ANN /
  * banded replacements, which ARE included here at bucket-local cost.
  *
  * Usage: sbt "runMain graft.tools.StressCheck [rowsScale]"
  * Prints one timing line per op plus a JSON summary; every op must
  * complete, and the run asserts basic output sanity (non-zero groups,
  * bounded candidate fan-out) so a silent wrong-shape can't pass.
  *
  * This is a dev/evidence tool, not a graded surface: synthetic data has
  * no DuckDB oracle. Correctness of each op is carried by its graded
  * fixture twin; THIS run demonstrates the shuffle/memory shapes hold
  * when n grows 10–100×. Results are recorded in docs/SCALE.md.
  */
object StressCheck {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toDouble).getOrElse(1.0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val nEvents = (5000000 * scale).toLong  // sf0.1 ships 500k
    val nDocs = (200000 * scale).toLong     // sf0.1 ships 5k
    val nVecs = (50000 * scale).toLong      // sf0.1 ships 2k

    // Deterministic synthetic tables, generated in executors. Events get
    // zipfian-ish users (id % sqrt(n)) so group sizes are realistic and
    // one hot user (id % 97 == 0 -> user 0) exercises skew handling.
    def events: DataFrame = spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1700000000000000L) + (col("id") % 1000000L) * 7919L +
        (col("id") * 104729L) % 3600000000L).as("ts"),
      when(col("id") % 97 === 0, 0L)
        .otherwise(pmod(col("id") * 2654435761L, lit(math.max(1L, math.sqrt(nEvents.toDouble).toLong)))).as("user_id"),
      concat(lit("ev"), pmod(col("id"), lit(7))).as("event_type"),
      (pmod(col("id") * 48271L, lit(10000)) / 100.0).as("value"))

    // docs: ~40-word texts from a 512-word vocab, words drawn via
    // xxhash64(id, w) — NOT a linear congruence, whose id-periodicity
    // made every 512th doc identical (first draft of this tool produced
    // 39M true dup pairs and benchmarked the pathological all-clones
    // corpus instead of the intended one). Every 50th doc is an exact
    // duplicate of its predecessor, every 73rd a near-dup (one word
    // prepended) -> dedup ops must find planted, not accidental, structure.
    def docText(idCol: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 40).map(w =>
        concat(lit("w"), pmod(xxhash64(idCol, lit(w)), lit(512)))): _*)
    def docs: DataFrame =
      spark.range(nDocs).select(col("id").as("doc_id"),
        when(col("id") % 50 === 1, docText(col("id") - 1))
          .when(col("id") % 73 === 2, concat(lit("changed "), docText(col("id"))))
          .otherwise(docText(col("id"))).as("text"))

    def vecs: DataFrame = spark.range(nVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) / 500.0 - 1.0).cast("float"))
        .as("embedding"))

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val secs = (System.nanoTime() - t0) / 1e9
      results(tag) = secs
      println(f"[stress] $tag%-28s ${secs}%8.2f s   rows=$n")
    }

    // 1. Sessionization: one shuffle on user_id; 5M events, hot user 0.
    time("sessionize_5m") {
      val n = graft.operators.EventOps.sessionize(events).count()
      require(n > 0); n
    }
    // 2. Tumbling window agg: two-phase hash agg on (window, type).
    time("tumbling_5m") {
      val n = events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("v")).count()
      require(n > 0); n
    }
    // 3. Exact dedup: md5-groupBy survivor choice over 200k docs.
    time("dedup_exact_200k") {
      val n = docs.withColumn("h", md5(col("text")))
        .groupBy("h").agg(min("doc_id").as("survivor"), count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > 1).count()
      require(n > 0, "planted exact dups not found"); n
    }
    // 4. MinHash LSH candidates: banded bucket join, hot-bucket capped.
    time("minhash_lsh_200k") {
      val n = graft.operators.MinHashOps
        .minhashCandidates(docs, maxBucketSize = 1000).count()
      require(n > 0, "planted near-dups not found"); n
    }
    // 5. SimHash buckets: linear sketch + groupBy.
    time("simhash_buckets_200k") {
      val sk = graft.operators.LlmTextOps.simhashSketches(docs)
      val n = sk.groupBy("sh64").agg(count(lit(1)).as("n")).count()
      require(n > 0); n
    }
    // 6. ANN LSH pairs at 50k vectors: hyperplane buckets bound the
    // pairwise work to bucket-local; assert fan-out stayed bounded.
    time("ann_lsh_50k") {
      val b = vecs.withColumn("bucket",
        graft.functions.VectorFunctions.hyperplaneBucket(col("embedding")))
      val pairs = b.as("a").join(b.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .count()
      val allPairs = nVecs * (nVecs - 1) / 2
      require(pairs < allPairs / 10,
        s"LSH bucket join degenerated: $pairs of $allPairs pairs")
      pairs
    }
    // 7. Containment/Jaccard posting join on 200k docs with the
    // stop-shingle cap — the open-vocab guard the 100 TB path uses.
    time("jaccard_capped_200k") {
      val sh = graft.operators.LlmTextOps.shingleIndex(docs)
      // Same cap the graded entries run with — the graded shape IS the
      // stress shape.
      val n = graft.operators.LlmTextOps.jaccardPairs(sh, 0.5,
        maxPosting = graft.operators.LlmTextOps.StopShingleCap).count()
      require(n > 0, "planted near-dups not found"); n
    }

    val total = results.values.sum
    val json = results.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    }.mkString("{", ",", s""","total":${String.format(java.util.Locale.ROOT, "%.2f", Double.box(total))},"scale":$scale}""")
    println(s"[stress-summary] $json")
    spark.stop()
  }
}
