package graft

import org.apache.spark.sql.SparkSession

/** Focused micro-bench: time selected queries repeatedly (isolates one
  * query from full-run noise; Bench totals all queries once).
  *
  * Usage: runMain graft.BenchOne key1,key2 [reps] [sfDir]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val keys = args.headOption.map(_.split(",").toSeq).getOrElse(Seq.empty)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    // same env fallback as Bench — the two tools must default to the SAME
    // dataset, or a drill-down silently micro-benches different data than
    // the full run it is explaining
    val sfDir = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    // fail on a typo'd key BEFORE the ~10 s of session + warmup cost
    val unknown = keys.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown keys: ${unknown.mkString(", ")} (see SparkEntry.queries)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession + the toRdd sink: measure the shipped configuration
    // and the plan as planned — same rationale as Bench
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // keys OUTER, reps inner: each key's reps run back-to-back, so another
    // key's memo builds and GC pressure never land inside a "steady-state"
    // rep — the isolation this tool exists for (the interleaved order put
    // a full run of every other key between consecutive reps)
    for (k <- keys; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(k)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[benchone] $k rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
