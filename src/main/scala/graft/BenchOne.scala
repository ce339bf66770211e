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
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession + the toRdd sink: measure the shipped configuration
    // and the plan as planned — same rationale as Bench
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    for (r <- 1 to reps; k <- keys) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(k)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[benchone] $k rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
