package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-reader paths once so the first timed
    // query doesn't absorb ~5s of startup cost.
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/nation.parquet").count()
    } catch { case _: Throwable => }
    // sorted: Map iteration order is hash-based, which would reorder the
    // timing sequence (and its cache effects) run-to-run
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 3 dp (ms resolution) keeps the JSON line compact — the driver
    // captures a bounded stdout tail, and sub-ms digits are noise.
    // Locale.ROOT: a comma-decimal default locale would emit broken JSON.
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def toJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // The driver keeps only a ~2 KB stdout tail; the full 140+-key map is
    // ~4 KB, so printing it all makes the line UNPARSEABLE (BENCH_r02/r03
    // both captured `parsed: null`). Print the headline subset — the
    // BASELINE.md anchors plus the most expensive ops — which fits the
    // tail, and write the complete per-query map to files for regression
    // diffs (BENCH_FULL.json in the repo cwd is committed with the round).
    val headline = Set(
      "agg_groupby_q1", "join_star_tpch", "win_topk_group", "stream_session",
      "stream_tumbling", "llm_cosine_topk", "llm_dedup_exact",
      "llm_dedup_minhash", "llm_dedup_clusters", "llm_dedup_embedding",
      "llm_contamination", "llm_ngram_jaccard", "scan_partitioned",
      "join_inner_equi", "join_asof", "sort_multicol", "set_intersect",
      "typed_cogroup", "ann_lsh_topk", "stream_dedup", "llm_dedup_survivors",
      "agg_percentile", "vt_history", "mm_frame_sample",
      "join_bucketed", "join_range_binned", "tpch_q18_large", "zorder_key",
      "join_asof_native", "vt_source_read", "fuzzy_join_blocked")
    val json = s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
      s""""queries":${toJson(results.filter(r => headline(r._1)))},""" +
      s""""n_queries":${results.length},"full":"BENCH_FULL.json","sf":"$sfDir"}"""
    val fullJson = s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
      s""""queries":${toJson(results)},"sf":"$sfDir"}"""
    for (p <- Seq("/tmp/bench.json", "BENCH_FULL.json"))
      try java.nio.file.Files.write(java.nio.file.Paths.get(p), fullJson.getBytes("UTF-8"))
      catch { case _: Throwable => }
    println(json)
    spark.stop()
  }
}
