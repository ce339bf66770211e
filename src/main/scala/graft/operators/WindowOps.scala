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
  * per-customer cardinality keeps partitions small; AQE handles skewed
  * users. No unpartitioned global windows except the bounded E7 ntile.
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

  /** E7: ntile + first_value/last_value with explicit full frames. */
  def winNtileFirstLast(s: SparkSession, d: String): DataFrame = {
    val wOrder = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wFull = wOrder.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        ntile(4).over(wOrder).as("quartile"),
        first_value(col("o_orderkey")).over(wFull).as("top_key"),
        last_value(col("o_orderkey")).over(wFull).as("bottom_key"))
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
    * partition's median and p90 (no orderBy → frame = whole partition). */
  def winMedian(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(expr("percentile(o_totalprice, 0.5)").over(w), 4).as("status_median"),
        round(expr("percentile(o_totalprice, 0.9)").over(w), 4).as("status_p90"))
      .orderBy("o_orderkey")
  }

  /** E10: the custom typed UDAF ([[graft.functions.GeoMean]]) as a WINDOW
    * aggregate — running geometric mean of quantity per returnflag. The
    * Aggregator's associative merge is what lets one definition serve
    * groupBy (udaf_geomean), window frames (here), and partial map-side
    * combine at 100 TB. Frame order is pinned, so the log-sum
    * accumulation order matches the oracle's exp(avg(ln)). */
  def winUdafGeomean(s: SparkSession, d: String): DataFrame = {
    val geomean = udaf(graft.functions.GeoMean)
    // o_orderkey is the one fixture key that is globally unique, so the
    // frame order (and thus the running log-sum) is cross-engine exact
    val w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "orders")
      .filter(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(geomean(col("o_totalprice")).over(w), 4).as("run_gm"))
      .orderBy("o_orderkey")
  }

  /** E11: ratio-to-report — each order's share of its status partition's
    * FULL total (the classic BI window; the window runs before the output
    * filter, so shares are relative to the whole partition). Whole-
    * partition sums accumulate in engine-specific order; the 1e-15
    * relative noise sits far inside the 6 dp rounding on a ≤1 ratio
    * (same discipline as win_median's full-partition quantile). */
  def winShareOfTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
    t(s, d, "orders")
      .withColumn("share", round(col("o_totalprice") / sum("o_totalprice").over(w), 6))
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
