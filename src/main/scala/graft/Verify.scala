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
    // same bounded-stderr-tail hygiene as Bench (PlanInvariantsSpec's
    // globalWindowAllowed test is the guard that keeps this safe)
    graft.tools.LogHygiene.suppressBoundedGrainWindowWarn()
    new java.io.File(outDir).mkdirs()
    // Failures go to stderr for the driver AND into a durable artifact —
    // round 5 proved a stderr-only record lets a 32-key outage go unnoticed
    // (the failed keys simply vanish from the correctness report).
    val failed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // sorted like Bench: families run contiguously so per-family memos can
    // be released at the prefix boundary (ONE shared walker — see
    // MemoRegistry.FamilyReleaser; no GC bracket here, nothing is timed)
    val releaser = new graft.tools.MemoRegistry.FamilyReleaser(gcSettle = false)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      releaser.onKey(name)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      // NonFatal ONLY (the MemoRegistry discipline): an OOM mid-dump must
      // abort, not corrupt the failure attribution of every later key
      catch { case scala.util.control.NonFatal(e) =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        // same null-guard as the artifact: a bare NPE otherwise printed
        // the useless "failed: null" to the line the driver tails
        System.err.println(s"[verify] $name failed: $msg")
        failed += name -> msg.take(300)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    // Shared with Bench (graft.tools.Json).
    def q(s: String): String = graft.tools.Json.quote(s)
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
