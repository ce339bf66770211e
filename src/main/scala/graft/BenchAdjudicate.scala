package graft

/** Machine-readable bench adjudication — the BASELINE.md host-band
  * discipline as a tool instead of prose, so the next reviewer can DIFF
  * verdicts instead of reading paragraphs.
  *
  * For each `key:prior:observed` triple it re-measures the key min-of-N
  * (BenchOne's isolation: back-to-back reps, memo builds and GC land in
  * rep 1) and classifies the `observed` full-run reading against the
  * standing `prior` floor using the documented band:
  *
  *   - steady:               min ≤ 1.10 × prior — the floor holds
  *   - host_band:            min ≤ max(2 × prior, prior + 0.15 s) — the
  *                           documented run-to-run envelope on unchanged
  *                           plans (BASELINE.md round-7 addendum)
  *   - regression_confirmed: beyond the band — a real plan change to
  *                           chase, not load noise
  *
  * Output: `BENCH_ADJUDICATIONS.json`, one object per key with the
  * prior, the full-run reading that prompted the adjudication, every rep,
  * the min, the 1-minute load average at measurement (the host-band
  * evidence the prose adjudications always cite), and the verdict.
  * The file is REWRITTEN wholesale each run — adjudications are a
  * snapshot of "this code, this host, now", not an append-only log.
  *
  * Usage: runMain graft.BenchAdjudicate key:prior:observed[,...] [reps] [sfDir]
  */
object BenchAdjudicate {
  final case class Spec(key: String, prior: Double, observed: Double)

  def verdict(prior: Double, min: Double): String =
    if (min <= prior * 1.10) "steady"
    else if (min <= math.max(prior * 2.0, prior + 0.15)) "host_band"
    else "regression_confirmed"

  def main(args: Array[String]): Unit = {
    val specs = args.headOption.getOrElse("").split(",").filter(_.nonEmpty).map { s =>
      val p = s.split(":")
      require(p.length == 3, s"spec must be key:prior:observed, got '$s'")
      Spec(p(0), p(1).toDouble, p(2).toDouble)
    }.toSeq
    require(specs.nonEmpty, "usage: BenchAdjudicate key:prior:observed[,...] [reps] [sfDir]")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val sfDir = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val unknown = specs.map(_.key).filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown keys: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    def load1: Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    def f(d: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val records = specs.map { sp =>
      val times = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        SparkEntry.queries(sp.key)(spark, sfDir).queryExecution.toRdd.count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[adjudicate] ${sp.key} rep$r: $secs%.2f s")
        secs
      }
      val min = times.min
      val v = verdict(sp.prior, min)
      println(f"[adjudicate] ${sp.key}: min-of-$reps ${min}%.2f s vs prior " +
        f"${sp.prior}%.2f s (observed ${sp.observed}%.2f) -> $v")
      s"""${graft.tools.Json.quote(sp.key)}: {"prior_secs":${f(sp.prior)},""" +
        s""""observed_secs":${f(sp.observed)},"reps":${times.map(f).mkString("[", ",", "]")},""" +
        s""""min_secs":${f(min)},"min_of":$reps,"load1":${f(load1)},""" +
        s""""verdict":"$v"}"""
    }
    val json = s"""{"sf":${graft.tools.Json.quote(sfDir)},"cpus":$cpus,""" +
      s""""band":"min <= max(2x prior, prior + 0.15s)",""" +
      s""""adjudications":{${records.mkString(",")}}}""" + "\n"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_ADJUDICATIONS.json"), json)
    println(s"[adjudicate] wrote BENCH_ADJUDICATIONS.json (${specs.length} keys)")
    spark.stop()
  }
}
