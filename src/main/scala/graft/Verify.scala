package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated key filter for fast local iteration
    // (the driver always calls with exactly two args → full dump)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession: verify the engine in its shipped configuration
    // (extensions, AQE, UTC) — same rationale as Bench
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Failures go to stderr for the driver AND into a durable artifact —
    // round 5 proved a stderr-only record lets a 32-key outage go unnoticed
    // (the failed keys simply vanish from the correctness report).
    val failed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // sorted like Bench: families run contiguously so per-family memos can
    // be released at the prefix boundary (same memory-hygiene rationale)
    var prevFamily = ""
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val fam = name.takeWhile(_ != '_')
      if (prevFamily.nonEmpty && fam != prevFamily)
        graft.tools.MemoRegistry.releaseAll()
      prevFamily = fam
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val failJson = s"""{"n_failed":${failed.length},"failed":""" +
      failed.map { case (k, m) => s"{${q(k)}: ${q(m)}}" }.mkString("[", ",", "]") + "}"
    for (p <- Seq(s"$outDir/VERIFY_FAILURES.json", "VERIFY_FAILURES.json"))
      try Files.writeString(Paths.get(p), failJson)
      catch { case _: Throwable => }
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.length} queries FAILED: " +
        failed.map(_._1).mkString(", "))
    spark.stop()
  }
}
