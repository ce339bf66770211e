package graft.tools

/** Message-targeted log filters for the engine's own mains (Bench,
  * Verify), whose stdout/stderr tails the driver captures BOUNDED — a
  * repeated benign WARN crowds real signal (a genuinely failed key, an
  * OOM) out of the visible window.
  *
  * Same posture as [[org.apache.spark.sql.graftnative.CheckpointRelease]]'s
  * lineage-truncation filter: deny exactly one MESSAGE by string match,
  * never a level override that would hide unrelated warnings for the
  * JVM's lifetime — and only from the mains, so library users keep every
  * warning.
  */
object LogHygiene {

  /** Deny WindowExec's "No Partition Defined for Window operation" WARN.
    *
    * Safe ONLY because PlanInvariantsSpec's `globalWindowAllowed` test
    * proves, registry-wide, that every key planning an unpartitioned
    * window runs it over a provably bounded grain (value bins, digits,
    * calendar days, the vocabulary) — data-grain running totals ride
    * ScalePrimitives instead and plan no such window at all. If a new
    * key regresses, that test fails loudly; the filter never hides the
    * plan, only the repeated WARN line. */
  def suppressBoundedGrainWindowWarn(): Unit =
    try {
      import org.apache.logging.log4j.core.{Filter, LoggerContext}
      import org.apache.logging.log4j.core.config.LoggerConfig
      import org.apache.logging.log4j.core.filter.StringMatchFilter
      val ctx = org.apache.logging.log4j.LogManager.getContext(false)
        .asInstanceOf[LoggerContext]
      val conf = ctx.getConfiguration
      // package-level: the WARN is emitted under the concrete exec-node
      // class loggers (WindowExec, WindowGroupLimitExec, …) which all
      // route through this config
      val name = "org.apache.spark.sql.execution.window"
      val nearest = conf.getLoggerConfig(name)
      val lc =
        if (nearest.getName == name) nearest
        else {
          val fresh = new LoggerConfig(name, nearest.getLevel, /*additive=*/ true)
          conf.addLogger(name, fresh)
          fresh
        }
      lc.addFilter(StringMatchFilter.newBuilder()
        .setMatchString("No Partition Defined for Window operation")
        .setOnMatch(Filter.Result.DENY)
        .setOnMismatch(Filter.Result.NEUTRAL)
        .build())
      ctx.updateLoggers()
    } catch { case _: Throwable => () } // logging backend absent/different: cosmetic only
}
