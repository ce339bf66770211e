package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual `SparkEntry.queries` keys without running
  * the whole bench. Usage:
  *   sbt "runMain graft.tools.Time <sfDir> <key> [<key> ...]"
  * Each key runs twice — cold (first plan + codegen) and warm — because
  * regression work needs both numbers.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = if (args.length > 1) args.drop(1).toSeq else Seq("agg_groupby_q1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (k <- keys) {
      val fn = graft.SparkEntry.queries(k)
      for (round <- Seq("cold", "warm")) {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"TIME $k $round ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      }
    }
    spark.stop()
  }
}
