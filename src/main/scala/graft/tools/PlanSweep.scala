package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off audit main: prints every graded key whose physical plan
  * contains a scale anti-pattern node (CartesianProduct /
  * BroadcastNestedLoopJoin) plus any key that fails to plan. Used to
  * derive (and re-check) EngineSurfaceSpec's registry-wide allowlist. */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hits = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
        if (hits.nonEmpty) println(s"[plansweep] $name: ${hits.mkString(",")}")
      } catch {
        case e: Throwable => println(s"[plansweep] $name FAILED_TO_PLAN: ${e.getMessage}")
      }
    }
    println("[plansweep] done")
    spark.stop()
  }
}
