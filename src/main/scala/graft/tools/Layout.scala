package graft.tools

import org.apache.spark.sql.{Column, DataFrame}

/** Layout-preserving eager checkpoints (optimization-round r15).
  *
  * `Dataset.localCheckpoint(true)` under AQE forgets the frame's physical
  * layout: the captured `LogicalRDD` reports `UnknownPartitioning` because
  * `AdaptiveSparkPlanExec`'s output partitioning is not a plain
  * `HashPartitioning` at the instant the checkpoint snapshots it. Every
  * downstream join/aggregation keyed on the frame's own layout column then
  * re-Exchanges (and re-Sorts, for SMJ) a frame that is ALREADY laid out —
  * measured on graph_pagerank at sf0.1: the static transition frame and the
  * node universe were re-shuffled in all 5 rounds (17 Exchanges / 17 Sorts
  * in one plan, plans/r15/graph_pagerank_before.txt).
  *
  * [[checkpointBy]] shuffles the frame ONCE into an explicit
  * `repartition(n, cols) + sortWithinPartitions(cols)` layout and
  * checkpoints it with AQE disabled for just that build, so the
  * `LogicalRDD` keeps `HashPartitioning(cols, n)` + the sort order.
  * Consumers joining or grouping on `cols` skip both the Exchange and the
  * SMJ Sort — the guide-§2.4 "shuffle the static side once" posture. For a
  * frame that was going to be eagerly checkpointed anyway this moves no
  * extra bytes: the one explicit shuffle here replaces the first
  * downstream shuffle of the un-laid-out copy.
  *
  * `n` defaults to the session's `spark.sql.shuffle.partitions` — the same
  * scale knob every other exchange in the engine uses — so the layout is
  * cluster-adaptive, not a local-mode constant.
  *
  * AQE-off caveat: the build itself (the plan below the repartition) runs
  * non-adaptively. Every current call site checkpoints a frame whose
  * inputs are already materialized leaves or fixture-scale scans, so no
  * skew-split is lost; a caller with a skew-prone build should materialize
  * it under AQE first and layout-checkpoint the leaf.
  */
object Layout {
  def checkpointBy(df: DataFrame, cols: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      df.repartition(n, cols: _*).sortWithinPartitions(cols: _*)
        .localCheckpoint(true)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
