package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection harness: prints the formatted physical plan for selected
  * queries (all of them with no args). Used to audit pushdown, pruning,
  * join strategies, and whole-stage codegen coverage — SURVEY.md §4.
  *
  * Usage: runMain graft.Explain [sfDir] [key1,key2,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only: Option[Set[String]] = args.lift(1).map(_.split(",").toSet)
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"[explain] failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
