package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed order-statistics primitives — exact global rank, running
  * (prefix) sums, and ntile — WITHOUT the single-partition WindowExec the
  * built-in unpartitioned window functions plan.
  *
  * All three ride one machinery: a global `orderBy` (a range-shuffled,
  * all-task parallel sort) pinned through `Dataset.rdd`, then one bounded
  * per-partition-totals pass and one streaming output pass. The one
  * deliberate RDD hop is load-bearing for determinism, not style: range
  * boundaries come from SAMPLING, and sampling reads shuffle output whose
  * row order is nondeterministic — so any design where separately-planned
  * jobs must agree on partition boundaries (a counts collect + a scoring
  * job, or two in-plan branches relying on best-effort exchange reuse)
  * was observed LIVE at sf0.1 assigning rows to different ranges per job
  * and corrupting rank offsets. `Dataset.rdd` pins ONE physical plan: its
  * RangePartitioner is constructed exactly once and every job below (the
  * totals pass, the output pass, chained downstream calls) reuses that
  * partitioner and its shuffle files.
  *
  * Scale: the only driver-side state is one (count, Σ…) tuple PER
  * PARTITION — bounded by the cluster's partition count, never the data
  * grain — and the sort itself is the same parallel range sort a global
  * `orderBy` costs anywhere else.
  */
object ScalePrimitives {

  /** `df` extended with an exact 1-based global rank over `ord` (named
    * `rankOut`) and, for each `sumCols(i)` (must be LongType), the
    * inclusive running sum in `ord` order (named `sumOuts(i)`).
    * Deterministic when `ord` is a total order. */
  def distRunning(df: DataFrame, ord: Seq[Column], rankOut: String,
                  sumCols: Seq[String] = Nil, sumOuts: Seq[String] = Nil): DataFrame =
    distRunningWithCount(df, ord, rankOut, sumCols, sumOuts)._1

  /** [[distRunning]] plus the total row count — already known from the
    * per-partition totals pass, so callers needing n (the ntile formula,
    * a last-row filter) don't pay a separate count job that would
    * recompute the whole upstream plan. */
  def distRunningWithCount(df: DataFrame, ord: Seq[Column], rankOut: String,
                           sumCols: Seq[String] = Nil,
                           sumOuts: Seq[String] = Nil): (DataFrame, Long) = {
    require(sumCols.length == sumOuts.length, "one output name per running-sum column")
    (rankOut +: sumOuts).foreach { n =>
      require(!df.columns.contains(n),
        s"distRunning output column '$n' collides with an input column; rename one")
    }
    val idx = sumCols.map(df.schema.fieldIndex).toArray
    idx.foreach { i =>
      require(df.schema(i).dataType == LongType,
        s"distRunning sums LongType columns only; ${df.schema(i).name} is ${df.schema(i).dataType}")
    }
    val rowRdd = df.orderBy(ord: _*).rdd // planned ONCE — see object doc
    // pass 1: per-partition (row count, per-column totals); |partitions| rows
    val totals = rowRdd.mapPartitionsWithIndex { case (pid, it) =>
      var cnt = 0L
      val acc = new Array[Long](idx.length)
      it.foreach { r =>
        cnt += 1
        var j = 0
        while (j < idx.length) { acc(j) += r.getLong(idx(j)); j += 1 }
      }
      Iterator((pid, cnt, acc))
    }.collect()
    // exclusive prefix offsets, indexed by the dense pids 0..nParts-1
    // (mapPartitionsWithIndex emits one row per partition — an empty
    // partition still contributes its (pid, 0, zeros) row)
    val nParts = rowRdd.getNumPartitions
    val cntByPid = new Array[Long](nParts)
    val accByPid = Array.ofDim[Long](nParts, idx.length)
    totals.foreach { case (pid, cnt, acc) => cntByPid(pid) = cnt; accByPid(pid) = acc }
    val rankOff = new Array[Long](nParts)
    val sumOff = Array.ofDim[Long](nParts, idx.length)
    var rk = 0L
    val run = new Array[Long](idx.length)
    var p = 0
    while (p < nParts) {
      rankOff(p) = rk
      var j = 0
      while (j < idx.length) { sumOff(p)(j) = run(j); j += 1 }
      rk += cntByPid(p)
      j = 0
      while (j < idx.length) { run(j) += accByPid(p)(j); j += 1 }
      p += 1
    }
    val localIdx = idx // avoid closing over `df`
    // pass 2: stream each partition once, carrying rank + running sums
    val outRdd = rowRdd.mapPartitionsWithIndex { case (pid, it) =>
      var rank = rankOff(pid)
      val acc = sumOff(pid).clone()
      it.map { r =>
        rank += 1
        var j = 0
        while (j < localIdx.length) { acc(j) += r.getLong(localIdx(j)); j += 1 }
        Row.fromSeq((r.toSeq :+ rank) ++ acc)
      }
    }
    val fields = df.schema.fields :+ StructField(rankOut, LongType, nullable = false)
    val sumFields = sumOuts.map(n => StructField(n, LongType, nullable = false))
    (df.sparkSession.createDataFrame(outRdd, StructType(fields ++ sumFields)),
      totals.map(_._2).sum)
  }

  /** Exact distributed `ntile(k) OVER (ORDER BY ord…)`: the global rank
    * from [[distRunning]], then the ntile bucket formula (first n%k
    * buckets take one extra row) in integer arithmetic — bit-identical
    * to the built-in, so DuckDB oracles keep plain ntile. */
  def distNtile(df: DataFrame, k: Int, out: String, ord: Column*): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val (ranked, n) = distRunningWithCount(df, ord, "__rnk")
    val base = n / k; val rem = n % k; val big = base + 1
    val tile =
      if (base == 0L) expr("CAST(__rnk AS INT)") // n < k: occupied buckets hold 1 row each
      else expr(s"CAST(IF(__rnk <= ${rem * big}, (__rnk + ${big - 1}) DIV $big, " +
        s"$rem + ((__rnk - ${rem * big} + ${base - 1}) DIV $base)) AS INT)")
    ranked.withColumn(out, tile).drop("__rnk")
  }

  /** Exact distributed `ntile(k) OVER (PARTITION BY grp ORDER BY ord…)`
    * — the PER-GROUP twin of [[distNtile]] for the hidden-data-grain
    * window case: a low-cardinality partition key over near-unique
    * ordering puts the whole corpus into |groups| window tasks at any
    * size. One [[distRunning]] pass in (grp, ord…) order instead; each
    * group's size and exclusive offset are recovered FROM the ranked
    * frame itself (off = max(rank) − count, a |groups|-row aggregate,
    * broadcast back — no window anywhere), and the ntile bucket formula
    * runs in per-row integer arithmetic with the group's own n —
    * bit-identical to the built-in, so DuckDB oracles keep plain ntile.
    * `ord` must total-order rows WITHIN each group (add a unique id as
    * the last key, same contract as distNtile). */
  def distNtileBy(df: DataFrame, grp: String, k: Int, out: String, ord: Column*): DataFrame = {
    import org.apache.spark.sql.functions._
    require(k >= 1, "ntile bucket count must be positive")
    val internal = Seq("__grnk", "__n", "__off", "__grp")
    internal.foreach { n =>
      require(!df.columns.contains(n),
        s"distNtileBy internal column '$n' collides with an input column; rename one")
    }
    val ranked = distRunning(df, col(grp) +: ord, "__grnk")
    val sizes = ranked.groupBy(col(grp).as("__grp"))
      .agg(count(lit(1)).as("__n"), (max("__grnk") - count(lit(1))).as("__off"))
    // null-SAFE group equality: the built-in window treats a NULL
    // partition key as its own partition (and groupBy gives it its own
    // sizes row), so a plain equi-join would silently DROP those rows
    ranked.join(broadcast(sizes), col(grp) <=> col("__grp"))
      .withColumn(out, expr(
        s"CAST(CASE WHEN __n DIV $k = 0 THEN __grnk - __off " +
          s"WHEN __grnk - __off <= (__n % $k) * (__n DIV $k + 1) " +
          s"THEN (__grnk - __off + __n DIV $k) DIV (__n DIV $k + 1) " +
          s"ELSE (__n % $k) + ((__grnk - __off - (__n % $k) * (__n DIV $k + 1) " +
          s"+ __n DIV $k - 1) DIV (__n DIV $k)) END AS INT)"))
      .drop("__grnk", "__n", "__off", "__grp")
  }
}
