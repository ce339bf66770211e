package org.apache.spark.sql.graftnative

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Eagerly free the executor blocks behind a `localCheckpoint(true)` frame.
  *
  * `Dataset.unpersist` only talks to the CacheManager, which never saw a
  * local checkpoint — its blocks are persisted directly on the underlying
  * RDD inside the [[LogicalRDD]] leaf, and are otherwise released only when
  * the ContextCleaner notices the RDD got garbage-collected. A long
  * single-JVM sweep (Bench over the full registry) can't wait for GC luck:
  * dropping a memoized frame must return its memory NOW so later key
  * families don't inherit the pressure.
  *
  * After release the frame is NOT recomputable (a local checkpoint has no
  * lineage) — callers must drop every reference to it in the same breath,
  * which is exactly what `LruMemo.clear` does.
  */
object CheckpointRelease {
  // Unpersisting a locally-checkpointed RDD logs a WARN ("lineage has been
  // truncated and cannot be recomputed") on every release. Here that is
  // the DOCUMENTED contract, not a hazard — the caller drops all
  // references in the same breath — and ~20 of these per Bench sweep were
  // crowding real signal out of the driver's bounded stderr tail. Deny
  // exactly that MESSAGE with a string-match filter on the RDD's logger —
  // a level override would also hide every unrelated WARN that class
  // emits for the JVM's lifetime. Everything else stays at WARN.
  try {
    import org.apache.logging.log4j.core.{Filter, LoggerContext}
    import org.apache.logging.log4j.core.config.LoggerConfig
    import org.apache.logging.log4j.core.filter.StringMatchFilter
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[LoggerContext]
    val conf = ctx.getConfiguration
    val name = "org.apache.spark.rdd.MapPartitionsRDD"
    val nearest = conf.getLoggerConfig(name)
    val lc =
      if (nearest.getName == name) nearest
      else {
        val fresh = new LoggerConfig(name, nearest.getLevel, /*additive=*/ true)
        conf.addLogger(name, fresh)
        fresh
      }
    lc.addFilter(StringMatchFilter.newBuilder()
      .setMatchString("lineage has been truncated")
      .setOnMatch(Filter.Result.DENY)
      .setOnMismatch(Filter.Result.NEUTRAL)
      .build())
    ctx.updateLoggers()
  } catch { case _: Throwable => () } // logging backend absent/different: cosmetic only

  def release(df: DataFrame): Unit =
    df.queryExecution.logical.collect { case l: LogicalRDD => l.rdd }
      .foreach(rdd => try rdd.unpersist(blocking = false) catch { case _: Throwable => () })

  /** Are ALL of the frame's checkpoint blocks still resident? A local
    * checkpoint has no lineage: when an executor dies (routine at 1000
    * executors), its blocks are simply GONE and any later action on the
    * frame fails unrecoverably with missing-block errors. This is the
    * cheap driver-side probe behind the memo rebuild-on-miss path
    * (LruMemo revalidation): every [[LogicalRDD]] leaf must report its
    * full partition count cached in the block-manager status store —
    * O(#cached RDDs) driver metadata, no job. Errors (e.g. a stopped
    * context) report NOT live: the failure mode of a false negative is
    * one redundant rebuild, of a false positive an unrecoverable query. */
  def isLive(df: DataFrame): Boolean =
    try {
      val rdds = df.queryExecution.logical.collect { case l: LogicalRDD => l.rdd }
      rdds.forall { rdd =>
        rdd.partitions.isEmpty || {
          val info = rdd.sparkContext.getRDDStorageInfo(_.id == rdd.id)
          info.nonEmpty && info.head.numCachedPartitions == rdd.partitions.length
        }
      }
    } catch { case scala.util.control.NonFatal(_) => false }
}
