package graft

import org.apache.spark.sql.SparkSession

/** User-facing session factory: the configuration this engine is designed
  * for. Local threads default to the machine; on a cluster the same
  * builder settings apply (AQE handles runtime re-planning, UTC pins
  * time semantics, the extension registers the native functions).
  */
object GraftSession {
  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = builder().getOrCreate()
}
