package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Multi-executor validation on one box: run a cross-family subset of the
  * graded registry under `local-cluster[2,4,2048]` — Spark's standalone
  * scheduler with TWO SEPARATE EXECUTOR JVMs — and assert every result is
  * bit-identical to the same key under the shipped `local[8]` mode.
  *
  * Why this exists: every other artifact in this repo (oracle gate,
  * bench, stress suite) runs in a single-JVM local master, where tasks
  * share the driver's heap. That mode never exercises the boundaries a
  * real cluster has: closures/Encoders/custom Catalyst expressions must
  * SERIALIZE across process lines, broadcasts and shuffle blocks move
  * over a real transport, localCheckpoint blocks live in executor block
  * managers and are fetched remotely, and driver-side state (codebooks,
  * carry arrays, the adaptive τ scalar) must genuinely be O(1) data that
  * ships in task binaries. local-cluster is the standard-cluster
  * scheduler minus only the network between machines, so a pass here
  * narrows "no multi-executor validation" (docs/SCALE.md) to exactly the
  * multi-HOST concerns (locality, stragglers, dynamic allocation) that a
  * single box cannot represent.
  *
  * Determinism across modes is not luck — it is the repo's oracle
  * discipline paying off twice: every graded key is engineered to be
  * partial-order independent (exact integer/cents accumulation, floor-dp
  * rounding, total ORDER BY), so its rows must match across ANY executor
  * placement, bit for bit. Doubles are compared via doubleToLongBits.
  *
  * Environment contract (set by the sbt runner): `SPARK_SCALA_VERSION`
  * must be set (the in-process Worker builds executor commands through
  * the launcher library without `load-spark-env.sh`, which normally
  * derives it), and `SPARK_HOME` should point at a WRITABLE shim of the
  * Spark distribution (symlinked `jars`/`conf` plus an empty `work`
  * dir) because the in-process Worker ignores `SPARK_WORKER_DIR` and
  * drops executor work dirs under `$SPARK_HOME/work`:
  *
  *   mkdir -p /tmp/graft-spark-home/work
  *   ln -sfn /opt/spark/{jars,conf,bin,sbin} /tmp/graft-spark-home/
  *   SPARK_HOME=/tmp/graft-spark-home SPARK_SCALA_VERSION=2.13 \
  *     sbt "runMain graft.tools.ClusterCheck"
  *
  * Usage: sbt "runMain graft.tools.ClusterCheck [sfDir] [key1,key2,...]"
  */
object ClusterCheck {

  /** Cross-family subset: every custom kernel family with a distinct
    * serialization surface — native Catalyst expressions (shingles,
    * vector ops), the distRunning/distRunningBy RDD kernels and their
    * driver-side carry arrays, checkpoint-memoized derived tables,
    * broadcast postings, the literal-codebook IVF assign, the pointer-
    * jumping CC loop, a driver-derived scalar (adaptive τ), file-source
    * roundtrips, and the full curation funnel that composes most of the
    * above. */
  val DefaultKeys: Seq[String] = Seq(
    "scan_pruned", "csv_roundtrip", "scan_json_typed", "join_star_tpch",
    "agg_groupby_q1", "agg_count_distinct", "win_topk_group", "win_median",
    "sort_multicol", "set_except", "stream_tumbling", "llm_dedup_exact",
    "llm_dedup_minhash", "llm_dedup_clusters", "ann_ivf_topk",
    "llm_bm25_topk", "geo_radius_join", "llm_pack_sequences",
    "graph_components", "llm_gate_tau_adaptive", "llm_curation_e2e",
    // round 14: the strip's reassembly (collect_list → array_sort on the
    // carried position) is exactly the shape whose determinism depends
    // on NOT inheriting any partition/arrival order — pulse it
    "llm_dedup_substring_strip",
    // round 14: the incremental pass joins two independently-planned
    // window frames (existing-distinct vs fresh) — the cross-frame hash
    // agreement is exactly what executor-side serialization could break
    "llm_dedup_substring_incremental")

  /** Canonical cell rendering for the parity fingerprint. INJECTIVITY is
    * the load-bearing property (spec'd in ClusterCheckRenderSpec): a
    * renderer that collapsed two distinct values into one string would
    * make the sweep pass on results that actually differ — doubles are
    * rendered by their IEEE bits (so −0.0 ≠ 0.0 and every ulp counts),
    * null by a sentinel no fixture string contains, binary by Base64. */
  private[graft] def render(v: Any): String = v match {
    case null => "␀"
    case d: Double => java.lang.Double.doubleToLongBits(d).toString
    case f: Float => java.lang.Float.floatToIntBits(f).toString
    case r: Row => "{" + joinCells(r.toSeq.map(render)) + "}"
    // Seq/Map elements join through joinCells too (round-14 review): a
    // plain "," / "=" join collapsed Seq("a,b") with Seq("a","b") and
    // Map("a=1"->"x") with Map("a"->"1=x") — string-array/map columns
    // could fingerprint-match across modes on genuinely different data
    case s: scala.collection.Seq[_] => "[" + joinCells(s.map(render).toSeq) + "]"
    case m: scala.collection.Map[_, _] =>
      "<" + joinCells(
        m.map { case (k, x) => joinCells(Seq(render(k), render(x))) }.toSeq.sorted) + ">"
    // prefixed: bare Base64 of an EMPTY byte array is "" — identical to
    // the empty string (the collapse ClusterCheckRenderSpec caught)
    case b: Array[Byte] => "b64:" + java.util.Base64.getEncoder.encodeToString(b)
    case x => x.toString
  }

  /** Unambiguous multi-cell join for row renderings (the Row branch of
    * [[render]] and the top-level row body in fingerprint): each cell is
    * LENGTH-PREFIXED before joining, so boundaries stay injective even
    * when a rendered cell itself contains any would-be separator —
    * ("12","3") vs ("1","23") and ("a\u001eb") vs ("a","b") all differ.
    * (r13 ADVICE: the previous join used a raw \u0001 control byte as
    * separator — correct for fixture data but invisible in source, which
    * is exactly how it got misread as separator-free; and non-injective
    * in principle for strings containing that byte. Length prefixes need
    * neither caveat.) */
  private[graft] def joinCells(cells: Seq[String]): String =
    cells.map(c => c.length.toString + ":" + c).mkString("|")

  /** (row count, md5 over schema + canonically-rendered sorted rows). */
  private def fingerprint(df: DataFrame): (Long, String) = {
    val rows = df.collect()
    val body = rows.map(r => joinCells(r.toSeq.map(render))).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(df.schema.map(f => s"${f.name}:${f.dataType.sql}")
      .mkString("|").getBytes("UTF-8"))
    body.foreach(s => md.update((s + "\n").getBytes("UTF-8")))
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  private def runMode(master: String, sfDir: String, keys: Seq[String],
      extraConf: Map[String, String]): Map[String, (Long, String, Double)] = {
    val b = graft.GraftSession.builder(master = master, shufflePartitions = 8)
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      LogHygiene.suppressBoundedGrainWindowWarn()
      // warm + executor-registration barrier: a real distributed job must
      // complete before the mode claim means anything
      spark.range(0L, 1000000L, 1L, 8).selectExpr("sum(id)").collect()
      if (master.startsWith("local-cluster")) {
        val n = spark.sparkContext.getExecutorMemoryStatus.size
        require(n >= 3, // driver block manager + 2 executors
          s"local-cluster did not register 2 executors (saw ${n - 1})")
      }
      val releaser = new MemoRegistry.FamilyReleaser(gcSettle = false)
      keys.sorted.map { k =>
        releaser.onKey(k)
        val t0 = System.nanoTime()
        val (n, h) = fingerprint(graft.SparkEntry.queries(k)(spark, sfDir))
        k -> ((n, h, (System.nanoTime() - t0) / 1e9))
      }.toMap
    } finally {
      // free checkpoint blocks while their context is still alive, then
      // tear the whole context down so the next mode starts clean
      MemoRegistry.releaseAll()
      spark.stop()
    }
  }

  /** Planted power-law skew-join proof under REAL executors — the one
    * AQE behavior the parity sweep cannot witness (every graded fixture
    * key is far too small to trip the skew thresholds). An 8 M-row fact
    * with 75 % of its rows on ONE key joins a 998-key side with
    * broadcast disabled, so the sort-merge join's hot partition is
    * ~20× the median; the skew thresholds are scaled to the data (2 MB /
    * default factor 5 — at 100 TB the 256 MB defaults engage the same
    * way, this is the same knob at a different scale). Asserts
    * (a) OptimizeSkewedJoin actually FIRED — the executed plan's SMJ
    * carries skew=true — and (b) the skew-split answer equals the truth
    * computed WITHOUT the join: the probe side carries w = k, so
    * sum(w) over the join is sum(k) over the fact, one map-side
    * aggregation no skew machinery touches. The fact rows carry an
    * incompressible-ish payload column so the hot partition's SHUFFLE
    * bytes (what the threshold meters — post-compression) stay well
    * above it; the payload also rides through the join into the
    * aggregate so column pruning cannot drop it from the exchange. */
  private def skewSplitCheck(jar: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.GraftSession
      .builder(master = "local-cluster[2,4,2048]", shufflePartitions = 8)
      .config("spark.executor.extraClassPath", jar)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      spark.range(0L, 1000000L, 1L, 8).selectExpr("sum(id)").collect()
      require(spark.sparkContext.getExecutorMemoryStatus.size >= 3,
        "local-cluster did not register 2 executors")
      val n = 8000000L
      def fact = spark.range(n).select(
        when(col("id") % 4 =!= 0, 0L)
          .otherwise(pmod(col("id"), lit(997L)) + 1).as("k"),
        pmod(org.apache.spark.sql.functions.xxhash64(col("id")), lit(1000000L)).as("p"))
      val dim = spark.range(998).select(col("id").as("k"), col("id").as("w"))
      val t0 = System.nanoTime()
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum("w").as("sw"), sum("p").as("sp"))
      // collect(), not head(): head plans a SEPARATE limit-1 query, so
      // the plan inspected below would still read isFinalPlan=false
      val got = joined.collect()(0)
      val secs = (System.nanoTime() - t0) / 1e9
      val plan = joined.queryExecution.executedPlan.toString
      require(plan.contains("skew=true"),
        s"AQE skew split did not engage — no skew=true in the executed plan:\n$plan")
      val truth = fact.agg(count(lit(1)), sum("k"), sum("p")).head()
      require(got.getLong(0) == truth.getLong(0) &&
        got.getLong(1) == truth.getLong(1) && got.getLong(2) == truth.getLong(2),
        s"skew-split join diverged from the join-free truth: $got vs $truth")
      println(f"""[cluster-skew] {"rows":$n,"skew_split":true,"match":true,""" +
        f""""secs":$secs%.2f}""")
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // "all" sweeps the ENTIRE registry through both modes — the full
    // claim ("every graded key is executor-placement independent") at
    // roughly 2× a Verify dump's cost; the default subset is the
    // per-round pulse.
    val keys = args.lift(1)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultKeys) match {
      case Seq("all") => graft.SparkEntry.queries.keys.toSeq.sorted
      case ks => ks
    }
    // "skew" runs ONLY the planted skew-split proof (fast iteration);
    // a normal run appends it after the parity sweep
    if (keys == Seq("skew")) {
      skewSplitCheck(getClass.getProtectionDomain.getCodeSource.getLocation.getPath)
      return
    }
    val unknown = keys.filterNot(graft.SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown keys: ${unknown.mkString(", ")}")
    val jar = getClass.getProtectionDomain.getCodeSource.getLocation.getPath
    // cluster mode FIRST (fails loudly if executors can't launch), then
    // the reference local mode in a fresh context in the same JVM
    val cluster = runMode("local-cluster[2,4,2048]", sfDir, keys,
      Map("spark.executor.extraClassPath" -> jar))
    val local = runMode("local[8]", sfDir, keys, Map.empty)
    var bad = 0
    keys.sorted.foreach { k =>
      val (cn, ch, ct) = cluster(k)
      val (ln, lh, lt) = local(k)
      val ok = cn == ln && ch == lh
      if (!ok) bad += 1
      println(f"[cluster] $k%-24s ${if (ok) "MATCH" else "MISMATCH"}%-8s " +
        f"rows=$cn%-7d cluster=$ct%6.2fs local=$lt%6.2fs" +
        (if (ok) "" else s"  cluster=($cn,$ch) local=($ln,$lh)"))
    }
    println(s"""[cluster-summary] {"keys":${keys.length},"mismatches":$bad,""" +
      s""""sf":"$sfDir"}""")
    require(bad == 0, s"$bad keys differ between local-cluster and local mode")
    skewSplitCheck(jar)
  }
}
