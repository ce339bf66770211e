package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-reader paths once so the first timed
    // query doesn't absorb ~5s of startup cost.
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/nation.parquet").count()
    } catch { case _: Throwable => }
    // sorted: Map iteration order is hash-based, which would reorder the
    // timing sequence (and its cache effects) run-to-run
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 3 dp (ms resolution) keeps the JSON line compact — the driver
    // captures a bounded stdout tail, and sub-ms digits are noise.
    // Locale.ROOT: a comma-decimal default locale would emit broken JSON.
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Durable copy: stdout capture is tail-truncated by the driver, so the
    // full per-query breakdown also lands in a file for regression diffs.
    try java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/bench.json"),
      json.getBytes("UTF-8"))
    catch { case _: Throwable => }
    println(json)
    spark.stop()
  }
}
