package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window functions (SURVEY.md §2.E). Every window's ORDER BY includes a
  * unique tie-break column, frames are written explicitly where default
  * frames could differ, and range frames are expressed over numeric epoch
  * columns only (Spark range frames are numeric-only).
  *
  * 100 TB notes: window partitions shuffle on partitionBy keys — per-user /
  * per-customer cardinality keeps partitions small (and SCALES with the
  * data); AQE handles skewed users. No unpartitioned global windows, and
  * no data-grain window partitioned by a tiny fixed-NDV key: the four
  * per-status analytics (E7 ntile/first/last, E9 percentiles, E10 running
  * geomean, E11 ratio-to-report) ride ScalePrimitives / per-group
  * aggregates instead — PlanInvariantsSpec's two-scale NDV guard enforces
  * this registry-wide.
  */
object WindowOps {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** E1: top-2 orders per customer by price (row_number ≤ 2). */
  def winTopkGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  /** E2: rank + dense_rank of parts by retail price within type. */
  def winRankDense(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("p_type").orderBy(col("p_retailprice").desc, col("p_partkey"))
    t(s, d, "part")
      .select(col("p_type"), col("p_partkey"), col("p_retailprice"),
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
      .orderBy("p_type", "rnk", "p_partkey")
  }

  /** E3: per-user inter-event gap (µs, exact integers) + next event type. */
  def winLagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(s, d, "events")
      .withColumn("us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"),
        (col("us") - lag("us", 1).over(w)).as("gap_us"),
        lead("event_type", 1).over(w).as("next_type"))
      .orderBy("event_id")
  }

  /** E4: running revenue per customer (rows frame, unique order key). */
  def winRunningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(sum("o_totalprice").over(w), 2).as("cum_rev"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** E5: 3-preceding-rows moving average of order price per customer. */
  def winSlidingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(-3, 0)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(avg("o_totalprice").over(w), 4).as("mov_avg"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** E6: trailing-1h event count per user — RANGE frame over integer epoch
    * seconds (numeric on both engines; peers share the frame). FLOOR
    * division, not cast-truncation: the oracle's `// 1000000` floors, and
    * the two only agree for non-negative micros — a pre-1970 backfill
    * timestamp would silently shift frame membership under truncation. */
  def winRangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("epoch_s").rangeBetween(-3600, 0)
    t(s, d, "events")
      .withColumn("epoch_s", floor(unix_micros(col("ts")) / lit(1000000.0)).cast("long"))
      .select(col("event_id"), col("user_id"), col("epoch_s"),
        count(lit(1)).over(w).as("cnt_1h"))
      .orderBy("event_id")
  }

  /** E7: ntile + first_value/last_value with explicit full frames.
    *
    * Scale-safe formulation: `o_orderstatus` has 3 distinct values, so a
    * data-grain window partitioned by it routes the whole fact table into
    * 3 tasks at any size. The ntile instead rides
    * [[ScalePrimitives.distNtileBy]] (parallel range sort + integer
    * bucket formula, bit-identical to the built-in), and the full-frame
    * first/last values are per-group ARGMIN/ARGMAX aggregates — min_by /
    * max_by over the (−price, key) ordering struct reproduces the
    * (price DESC, key ASC) frame's first and last rows exactly — joined
    * back from a |status|-row broadcast. Oracle unchanged. */
  def winNtileFirstLast(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    val tiled = graft.operators.ScalePrimitives.distNtileBy(
      o, "o_orderstatus", 4, "quartile", col("o_totalprice").desc, col("o_orderkey"))
    val ordKey = struct((-col("o_totalprice")).as("np"), col("o_orderkey").as("k"))
    val ends = o.groupBy(col("o_orderstatus").as("__st")).agg(
      min_by(col("o_orderkey"), ordKey).as("top_key"),
      max_by(col("o_orderkey"), ordKey).as("bottom_key"))
    tiled.join(broadcast(ends), col("o_orderstatus") <=> col("__st"))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("quartile"), col("top_key"), col("bottom_key"))
      .orderBy("o_orderkey")
  }

  /** E8: IGNORE NULLS analytics — forward-fill (last non-null value
    * carried forward per user) and previous-non-null via lag; NULLs are
    * manufactured by voiding 'error' events' values. The classic
    * time-series gap-fill. */
  def winFillForward(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "events")
      .withColumn("v", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      .select(col("event_id"), col("user_id"),
        round(last(col("v"), ignoreNulls = true).over(wRun), 2).as("filled"),
        round(lag(col("v"), 1, null, ignoreNulls = true).over(w), 2).as("prev_v"))
      .orderBy("event_id")
  }

  /** E9: exact percentiles as WINDOW aggregates — every row carries its
    * partition's median and p90.
    *
    * Scale-safe formulation: the previous `percentile(…).over(partitionBy
    * status)` buffered the full fact table in 3 window tasks. The exact
    * quantiles instead come from [[ScalePrimitives.distQuantilesBy]]
    * (value-at-rank over a parallel range sort; |status|·|ps|-row
    * broadcast probes; quantile_cont interpolation on exact bracketing
    * values), pivoted to a |status|-row frame and broadcast back onto
    * orders. Oracle unchanged. */
  def winMedian(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val quants = graft.operators.ScalePrimitives
      .distQuantilesBy(o, "o_orderstatus", "o_totalprice", Seq(0.5, 0.9))
      .groupBy(col("o_orderstatus").as("__qst"))
      .agg(min(when(col("p") === 0.5, col("q"))).as("__med"),
        min(when(col("p") === 0.9, col("q"))).as("__p90"))
    o.join(broadcast(quants), col("o_orderstatus") <=> col("__qst"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("__med"), 4).as("status_median"),
        round(col("__p90"), 4).as("status_p90"))
      .orderBy("o_orderkey")
  }

  /** E10: running geometric mean of order price per status — the window
    * twin of the GeoMean UDAF (still graded as udaf_geomean), re-expressed
    * as a per-group running log-sum on ScalePrimitives. */
  def winUdafGeomean(s: SparkSession, d: String): DataFrame = {
    // Scale-safe formulation: the UDAF-over-window form partitioned the
    // fact table by the 3-value status key (3 window tasks at any size).
    // The running geometric mean is a running log-sum, so it rides
    // [[ScalePrimitives.distRunningBy]]: per-status rank + per-status
    // running ln-sum, accumulated SEQUENTIALLY in (status, o_orderkey)
    // order with each group's prefix starting from 0.0 at its own first
    // row — no global-offset subtraction, so early rows stay bit-exact
    // vs the oracle's sequential exp(avg(ln)). The GeoMean Aggregator
    // itself remains graded via udaf_geomean. Oracle unchanged.
    val o = t(s, d, "orders")
      .filter(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        log(col("o_totalprice")).as("__ln"))
    graft.operators.ScalePrimitives.distRunningBy(
        o, "o_orderstatus", Seq(col("o_orderkey")), "__grnk",
        dblCols = Seq("__ln"), dblOuts = Seq("__lncum"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(exp(col("__lncum") / col("__grnk")), 4).as("run_gm"))
      .orderBy("o_orderkey")
  }

  /** E11: ratio-to-report — each order's share of its status group's FULL
    * total (shares computed before the output filter, so they are
    * relative to the whole group).
    *
    * Scale-safe formulation: the full-partition window totaled the fact
    * table in 3 window tasks; a per-status SUM is just a |status|-row
    * aggregate broadcast back. The total is accumulated in EXACT integer
    * cents (o_totalprice is a 2-dp quantity — geo_nearest_hub's
    * discipline), so the Spark-side value is deterministic under any
    * partial-agg order; vs the oracle's double sum the difference is
    * ~1e-14 relative on the denominator, far inside the 6 dp rounding on
    * a ≤1 ratio. Oracle unchanged. */
  def winShareOfTotal(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val totals = o.groupBy(col("o_orderstatus").as("__st"))
      .agg((sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")) / 100.0).as("__tot"))
    o.join(broadcast(totals), col("o_orderstatus") <=> col("__st"))
      .withColumn("share", round(col("o_totalprice") / col("__tot"), 6))
      .filter(col("o_orderkey") % 10 === 0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "share")
      .orderBy("o_orderkey")
  }

  val queries: Map[String, Q] = Map(
    "win_share_of_total" -> (winShareOfTotal _),
    "win_udaf_geomean" -> (winUdafGeomean _),
    "win_fill_forward" -> (winFillForward _),
    "win_median" -> (winMedian _),
    "win_topk_group" -> (winTopkGroup _),
    "win_rank_dense" -> (winRankDense _),
    "win_lag_lead" -> (winLagLead _),
    "win_running_sum" -> (winRunningSum _),
    "win_sliding_avg" -> (winSlidingAvg _),
    "win_range_frame" -> (winRangeFrame _),
    "win_ntile_first_last" -> (winNtileFirstLast _),
  )

  val oracles: Map[String, String] = Map(
    "win_share_of_total" ->
      ("SELECT o_orderkey, o_orderstatus, o_totalprice, share FROM (" +
        "SELECT o_orderkey, o_orderstatus, o_totalprice, " +
        "round(o_totalprice / sum(o_totalprice) OVER (PARTITION BY o_orderstatus), 6) AS share " +
        "FROM orders) WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey"),
    "win_udaf_geomean" ->
      ("SELECT o_orderkey, o_orderstatus, " +
        "round(exp(avg(ln(o_totalprice)) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 4) AS run_gm " +
        "FROM orders WHERE o_orderkey % 20 = 0 ORDER BY o_orderkey"),
    "win_median" ->
      "SELECT o_orderkey, o_orderstatus, round(quantile_cont(o_totalprice, 0.5) OVER (PARTITION BY o_orderstatus), 4) AS status_median, round(quantile_cont(o_totalprice, 0.9) OVER (PARTITION BY o_orderstatus), 4) AS status_p90 FROM orders ORDER BY o_orderkey",
    "win_fill_forward" ->
      ("WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v FROM events) " +
        "SELECT event_id, user_id, round(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS filled, round(lag(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS prev_v FROM e ORDER BY event_id"),
    "win_topk_group" ->
      "SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) WHERE rn <= 2 ORDER BY o_custkey, rn",
    "win_rank_dense" ->
      "SELECT p_type, p_partkey, p_retailprice, CAST(rank() OVER w AS INTEGER) AS rnk, CAST(dense_rank() OVER w AS INTEGER) AS drnk FROM part WINDOW w AS (PARTITION BY p_type ORDER BY p_retailprice DESC, p_partkey) ORDER BY p_type, rnk, p_partkey",
    "win_lag_lead" ->
      "SELECT event_id, user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us, lead(event_type) OVER w AS next_type FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events) WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) ORDER BY event_id",
    "win_running_sum" ->
      "SELECT o_custkey, o_orderkey, o_orderdate, round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_rev FROM orders ORDER BY o_custkey, o_orderkey",
    "win_sliding_avg" ->
      "SELECT o_custkey, o_orderkey, round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg FROM orders ORDER BY o_custkey, o_orderkey",
    "win_range_frame" ->
      "SELECT event_id, user_id, epoch_s, count(*) OVER (PARTITION BY user_id ORDER BY epoch_s RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS cnt_1h FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS epoch_s FROM events) ORDER BY event_id",
    "win_ntile_first_last" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice, CAST(ntile(4) OVER w AS INTEGER) AS quartile, first_value(o_orderkey) OVER wf AS top_key, last_value(o_orderkey) OVER wf AS bottom_key FROM orders WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey), wf AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) ORDER BY o_orderkey",
  )
}
