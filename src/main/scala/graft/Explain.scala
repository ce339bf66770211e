package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection harness: prints the formatted physical plan for selected
  * queries (all of them with no args). Used to audit pushdown, pruning,
  * join strategies, and whole-stage codegen coverage — SURVEY.md §4.
  *
  * Usage: runMain graft.Explain [sfDir] [key1,key2,...] [outDir]
  * With outDir set, each key's formatted plan is also written to
  * outDir/<key>.txt (the sbt shell cannot pipe stdout to a file, and the
  * r15 plan artifacts in plans/r15/ are committed per optimization-round
  * contract).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only: Option[Set[String]] = args.lift(1).map(_.split(",").toSet)
    val outDir = args.lift(2)
    outDir.foreach(d => new java.io.File(d).mkdirs())
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        println(s"\n========== $name ==========")
        try {
          val df = fn(spark, sfDir)
          df.explain("formatted")
          outDir.foreach { d =>
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$d/$name.txt"), txt)
          }
        }
        catch { case e: Throwable => println(s"[explain] failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
