package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession, not a hand-rolled builder: the bench must measure the
    // configuration the engine ships (extensions incl. RedundantRoundRule,
    // AQE, UTC) — a bespoke session here benchmarked an engine subtly
    // different from the one users get.
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // bounded-grain windows (see PlanInvariantsSpec.globalWindowAllowed)
    // would otherwise print ~20 benign single-partition WARNs into the
    // driver's bounded stderr tail
    graft.tools.LogHygiene.suppressBoundedGrainWindowWarn()
    // Warm the JVM/codegen/parquet-reader paths once so the first timed
    // query doesn't absorb ~5s of startup cost.
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/nation.parquet").count()
    } catch { case scala.util.control.NonFatal(_) => }
    // sorted: Map iteration order is hash-based, which would reorder the
    // timing sequence (and its cache effects) run-to-run.
    // A crashed query must NEVER read as a fast success (round 5: 32 broken
    // keys were recorded as 0.06-0.35s "wins"): its time is the -1.0
    // sentinel, it is excluded from the total, and its name lands in an
    // explicit errors list in both JSON artifacts.
    // Memoized per-family indexes (shingle index, edge lists, PQ codebooks)
    // are released at family boundaries: the sorted order means a family's
    // keys run contiguously, so its memo is dead the moment the prefix
    // changes. Without this the 240+-key single-JVM run carries EVERY
    // family's checkpoint blocks to the end and the tail pays 5-20×
    // GC/eviction inflation (round-5 driver-run measurements).
    // (family walk + GC-settle bracket live in FamilyReleaser — ONE copy
    // shared with Verify; the GC bracket keeps dead-block collection out
    // of the next key's timing window, the round-6 jitter adjudication)
    val releaser = new graft.tools.MemoRegistry.FamilyReleaser(gcSettle = true)
    // per-key memo-BUILD attribution (BASELINE.md "memo_builds" scheme):
    // a fresh log so the warmup can't leak a phantom build onto key #1
    graft.tools.MemoRegistry.BuildLog.reset()
    val wall0 = System.nanoTime()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      releaser.onKey(name)
      // min-of-2 reps: rep1 absorbs cold codegen / IO / index-memo build
      // for the key, rep2 is the steady state a regression comparison
      // needs. Reporting the min makes per-key attribution trustworthy
      // (within ~2x of BenchOne steady-state) instead of shipping
      // whichever rep a GC happened to land in.
      // Sink = execute the PHYSICAL PLAN AS PLANNED and drain its rows
      // (toRdd.count iterates every InternalRow). A plain df.count() puts
      // an Aggregate(count(1)) ON TOP and re-optimizes: EliminateSorts
      // deletes a top-level orderBy and ColumnPruning strips projection
      // expressions count never reads — sort- and projection-terminated
      // keys were being timed WITHOUT the operator under measurement.
      def rep(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      // NonFatal ONLY: an OOM must abort the run, not be recorded as a
      // clean -1.0 while every later key times a heap-thrashed JVM
      try { val t1 = rep(); (name, math.min(t1, rep()), true) }
      catch { case scala.util.control.NonFatal(_) => (name, -1.0, false) }
    }
    val wallSec = (System.nanoTime() - wall0) / 1e9
    val errors = results.collect { case (name, _, false) => name }
    // 3 dp (ms resolution) keeps the JSON line compact — the driver
    // captures a bounded stdout tail, and sub-ms digits are noise.
    // Locale.ROOT: a comma-decimal default locale would emit broken JSON.
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // escape string fields — sfDir comes from the environment, and one
    // quote/backslash in it would make BOTH artifacts unparseable (the
    // driver's parse returns null and the run's timings are lost).
    // Shared escaper (graft.tools.Json): Verify writes driver-parsed
    // artifacts through the same one, so the two can't drift.
    def esc(s: String): String = graft.tools.Json.esc(s)
    def toJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + esc(k) + "\":" + f3(v) }.mkString("{", ",", "}")
    def strArr(xs: Seq[String]): String = xs.map("\"" + esc(_) + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, t, true) => t }.sum
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
      "join_asof_native", "vt_source_read", "fuzzy_join_blocked",
      // round 11's geo family: the blocked radius join and the
      // persisted-layout region serve
      "geo_radius_join", "geo_bbox_persisted")
    val timings = results.map { case (k, t, _) => k -> t }
    // "value" is the steady-state total (sum of per-key min-of-2);
    // "wall" is the loop's true elapsed seconds including both reps and
    // the GC-settle brackets — comparable to pre-round-7 totals.
    // which keys paid for shared memoized family builds this run — the
    // per-key steady-state number for regression diffs is
    // t_key − memo_builds[key].sec (scheme recorded in BASELINE.md)
    val builds = graft.tools.MemoRegistry.BuildLog.snapshot()
    val buildSec = builds.flatMap(_._2).map(_._3).sum
    // per-key {n, sec} (the BASELINE.md regression-arithmetic fields,
    // sec now SELF-time so nested builds don't double-count) plus the
    // per-TAG breakdown: two tags at n=1 = two prerequisite indexes,
    // one tag at n=2 = a mid-run LRU eviction rebuild (a sizing bug) —
    // the ambiguity the round-12 verdict flagged.
    val buildsJson = builds.map { case (k, tags) =>
      val n = tags.map(_._2).sum
      val sec = tags.map(_._3).sum
      val tagsJson = tags.map { case (t, tn, ts) =>
        "\"" + esc(t) + "\":{\"n\":" + tn + ",\"sec\":" + f3(ts) + "}"
      }.mkString("{", ",", "}")
      "\"" + esc(k) + "\":{\"n\":" + n + ",\"sec\":" + f3(sec) +
        ",\"tags\":" + tagsJson + "}"
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
      s""""queries":${toJson(timings.filter(r => headline(r._1)))},""" +
      s""""memo_build_sec":${f3(buildSec)},""" +
      s""""n_queries":${results.length},"n_errors":${errors.length},""" +
      // cap the inline list so a mass failure can't blow the ~2KB stdout
      // tail budget; n_errors is the true count, BENCH_FULL.json the full list
      s""""errors":${strArr(errors.take(10))},"reps":2,"agg":"min",""" +
      s""""wall":${f3(wallSec)},"full":"BENCH_FULL.json","sf":"${esc(sfDir)}"}"""
    val fullJson = s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
      s""""queries":${toJson(timings)},"memo_builds":$buildsJson,""" +
      s""""memo_build_sec":${f3(buildSec)},"n_errors":${errors.length},""" +
      s""""errors":${strArr(errors)},"reps":2,"agg":"min","wall":${f3(wallSec)},"sf":"${esc(sfDir)}"}"""
    for (p <- Seq("/tmp/bench.json", "BENCH_FULL.json"))
      try java.nio.file.Files.write(java.nio.file.Paths.get(p), fullJson.getBytes("UTF-8"))
      catch { case _: Throwable => }
    println(json)
    spark.stop()
  }
}
