package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time operators, batch formulations (SURVEY.md §2.I1-I4). Each has
  * a Structured Streaming twin in graft.streaming (watermarks, session
  * windows, stateful dedup) verified by MemoryStream unit tests — batch
  * formulations here are the oracle-checkable semantics.
  *
  * All event-time arithmetic is integer microseconds on both engines
  * (SURVEY.md §5.3.3); `ts` is the µs-normalized column from Tables.
  *
  * 100 TB notes: tumbling/sliding windows are plain hash aggregations over
  * (window, keys) — partial agg + shuffle on the window key. Sessionization
  * shuffles once on user_id then runs two sorted window passes within each
  * partition; streaming twin bounds state via watermark + session_window.
  */
object EventOps {
  type Q = (SparkSession, String) => DataFrame
  private def ev(s: SparkSession, d: String) = Tables.load(s, d, "events")

  /** I1: hourly tumbling counts + value sums per event type. window.start ≡
    * date_trunc('hour') for epoch-aligned origins. */
  def streamTumbling(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_v"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("cnt"), col("sum_v"))
      .orderBy("hour_start", "event_type")

  /** I2: 1-hour windows sliding every 30 min (each event lands in 2). */
  def streamSliding(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("wstart"), col("cnt"))
      .orderBy("wstart")

  /** Core sessionization over any (user_id, ts, event_id) frame — exposed
    * for reuse and testing on constructed inputs. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("sess_id", sum("new_s").over(wRun))
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"))
  }

  /** Core deterministic-survivor dedup — keeps ONE REAL ROW per event_id:
    * the lexicographically smallest on (ts, user_id, event_type, value).
    * (A per-column min would fabricate a row mixing fields from different
    * duplicates.) The streaming twin keeps the first-seen arrival row
    * instead — same "one real row" guarantee, but arrival-order rather
    * than value-order; only the batch form is oracle-checked. */
  def dedupEvents(events: DataFrame): DataFrame = {
    val cols = Seq("ts", "user_id", "event_type", "value")
    // explicit NULLS FIRST: Spark's asc default, but DuckDB's default is
    // NULLS LAST — survivor choice must not depend on engine defaults
    // (SURVEY.md §5.3.4) even though fixtures are null-free today
    val w = Window.partitionBy("event_id").orderBy(cols.map(c => col(c).asc_nulls_first): _*)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id") +: cols.map(col): _*)
  }

  /** I3: 30-min-gap sessionization per user (lag + gap flag + running sum —
    * the portable batch formulation; cross-validated row counts in SURVEY
    * §5.2). Session ids are per-user ordinals, deterministic. */
  def streamSession(s: SparkSession, d: String): DataFrame =
    sessionize(ev(s, d)).orderBy("user_id", "sess_id")

  /** I4: exact dedup on event_id with a deterministic real-row survivor
    * (smallest full row — not dropDuplicates, whose survivor is
    * partition-order dependent). */
  def streamDedup(s: SparkSession, d: String): DataFrame =
    dedupEvents(ev(s, d)).orderBy("event_id")

  /** Conversion funnel signup → view → purchase: per user, the first
    * signup, the first view strictly after it, the first purchase strictly
    * after that view; graded on the three stage counts. Three hash
    * aggregations + two joins on user_id — every join key is the same, so
    * at scale one hash-partitioning by user_id serves all stages. */
  def eventFunnel(s: SparkSession, d: String): DataFrame =
    funnelCounts(ev(s, d))

  /** The three funnel step frames (first signup, first view after it,
    * first purchase after that) — ONE definition under the funnel count
    * and the funnel latency keys. */
  private def funnelSteps(events: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val e = events.select("user_id", "event_type", "ts")
    val su = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("s_ts"))
    val vu = e.filter(col("event_type") === "view").join(su, "user_id")
      .filter(col("ts") > col("s_ts"))
      .groupBy("user_id").agg(min("ts").as("v_ts"))
    val pu = e.filter(col("event_type") === "purchase").join(vu, "user_id")
      .filter(col("ts") > col("v_ts"))
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    (su, vu, pu)
  }

  /** Core funnel over any (user_id, event_type, ts) frame — exposed so
    * constructed-input tests exercise THIS code, not a reimplementation. */
  def funnelCounts(events: DataFrame): DataFrame = {
    val (su, vu, pu) = funnelSteps(events)
    su.agg(count(lit(1)).as("n_signup"))
      .crossJoin(vu.agg(count(lit(1)).as("n_view_after")))
      .crossJoin(pu.agg(count(lit(1)).as("n_purchase_after")))
  }

  /** Funnel transition latency — "how long does a converting user take
    * between steps", the companion every funnel-count dashboard needs
    * for SLA and drop-off-cause analysis. Gaps are exact integer µs
    * between the SAME step timestamps the graded event_funnel counts
    * ([[funnelSteps]] is shared); stats are all-integer with the
    * truncating mean, guarded for an empty step. Scale: the step
    * frames' user_id joins, then two global 1-row aggregations. */
  def eventFunnelTime(s: SparkSession, d: String): DataFrame = {
    val (su, vu, pu) = funnelSteps(ev(s, d))
    def stats(gaps: DataFrame, step: String) =
      gaps.agg(count(lit(1)).as("n_users"), min("gap").as("min_us"),
          max("gap").as("max_us"), sum("gap").as("sum_us"))
        .select(lit(step).as("step"), col("n_users"), col("min_us"), col("max_us"),
          when(col("n_users") > 0, expr("sum_us DIV n_users")).as("mean_us"))
    val g1 = vu.join(su, "user_id")
      .select((unix_micros(col("v_ts")) - unix_micros(col("s_ts"))).as("gap"))
    val g2 = pu.join(vu, "user_id")
      .select((unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap"))
    stats(g1, "signup->view").unionAll(stats(g2, "view->purchase"))
      .orderBy("step")
  }

  /** Time-decay attribution — the fourth standard credit model next to
    * event_attribution's first/last-touch: every click/view BEFORE a
    * user's first purchase earns weight 2^(−days-before-purchase), so
    * recent touches dominate but older ones keep credit. Weights are
    * EXACT integers scaled by 2³⁰ (halving per day, floored to 0 past
    * 30 days — the fixture span; production re-anchors the scale to its
    * own horizon), summed wide (DECIMAL — Σ of 2³⁰-scaled weights
    * overflows int64 at warehouse touch volumes, the agg_regression
    * lesson) and gated to BIGINT; the credit share is ONE mirrored IEEE
    * division, 6 dp (oracle: HUGEINT sums + the VARCHAR→DOUBLE bridge).
    * Scale: one user-grain purchase aggregation, one join back on
    * user_id, one tiny (2-row) type aggregation + a 1-row broadcast
    * total. */
  def eventAttributionDecay(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val fp = e.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("ts").as("fp_ts"))
    val touches = e.filter(col("event_type").isin("click", "view"))
      .join(fp, "user_id").filter(col("ts") < col("fp_ts"))
      .select(col("event_type"),
        datediff(to_date(col("fp_ts")), to_date(col("ts"))).as("d"))
      .select(col("event_type"),
        expr("IF(d <= 30, shiftleft(CAST(1 AS BIGINT), 30 - d), CAST(0 AS BIGINT))").as("w"))
    val per = touches.groupBy("event_type")
      .agg(count(lit(1)).as("n_touches"),
        sum(col("w").cast("decimal(19,0)")).as("ws"))
    per.crossJoin(broadcast(per.agg(sum("ws").as("tt"))))
      .select(col("event_type"), col("n_touches"), col("ws").cast("long").as("w_sum"),
        (floor(col("ws").cast("double") / col("tt").cast("double") * 1000000.0 + 0.5)
          / 1000000.0).as("share"))
      .orderBy("event_type")
  }

  /** Growth accounting — the weekly new / retained / resurrected /
    * churned ledger every growth team reads before any other chart
    * (the identity: actives(w) = new + retained + resurrected;
    * churned(w) = actives(w−1) − retained(w)). A user's week status
    * comes from the lag/lead of their distinct active weeks: first
    * week → new; exactly-previous week active → retained; an older gap
    * → resurrected; churn lands on the week AFTER the last week of an
    * activity run. All exact integer counts over the ISO week grain
    * (date_trunc('week') is Monday-start on both engines).
    * Scale: one distinct (user, week) shuffle, user-partitioned
    * windows, week-grain aggregations — one key family end to end. */
  def eventLifecycle(s: SparkSession, d: String): DataFrame = {
    val uw = ev(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("wk")
    val lab = uw
      .withColumn("prev", lag("wk", 1).over(w))
      .withColumn("nxt", lead("wk", 1).over(w))
    val act = lab.groupBy("wk").agg(
      sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
      sum(when(col("prev").isNotNull && datediff(col("wk"), col("prev")) === 7, 1L)
        .otherwise(0L)).as("n_retained"),
      sum(when(col("prev").isNotNull && datediff(col("wk"), col("prev")) > 7, 1L)
        .otherwise(0L)).as("n_resurrected"))
    val churn = lab
      .filter(col("nxt").isNull || datediff(col("nxt"), col("wk")) > 7)
      .select(date_add(col("wk"), 7).as("wk"))
      .groupBy("wk").agg(count(lit(1)).as("n_churned"))
    act.join(churn, Seq("wk"), "full")
      .na.fill(0L, Seq("n_new", "n_retained", "n_resurrected", "n_churned"))
      .orderBy("wk")
  }

  /** Retention cohorts: users grouped by first-active day; per cohort, how
    * many returned exactly 1 day and 7 days later. distinct (user, day)
    * first — one shuffle — then cohort assignment and the conditional
    * distinct counts share the user_id partitioning. */
  def eventRetention(s: SparkSession, d: String): DataFrame = {
    val days = ev(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    val cohorts = days.groupBy("user_id").agg(min("day").as("cohort"))
    cohorts.join(days, "user_id")
      .groupBy("cohort")
      .agg(countDistinct("user_id").as("n_users"),
        countDistinct(when(col("day") === col("cohort") + expr("INTERVAL 1 DAY"), col("user_id"))).as("n_d1"),
        countDistinct(when(col("day") === col("cohort") + expr("INTERVAL 7 DAY"), col("user_id"))).as("n_d7"))
      .orderBy("cohort")
  }

  /** Event pathing: counts of consecutive event-type transitions per
    * user (the first-order Markov table behind "what do users do after
    * X"). One window pass per user + one hash aggregation over a
    * 25-value key domain. */
  def eventTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev(s, d)
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("event_type"), col("next_type"))
  }

  /** Per-user anomaly detection: events whose value is > 2 sample
    * standard deviations from that user's own purchase-value mean. One
    * aggregation keyed on user_id + one broadcast-size join back — the
    * classic two-pass z-score at corpus scale (a single-pass window
    * stddev over each user partition would also work but recomputes per
    * row). Users need >= 3 purchases for a stable std; z rounded 4 dp
    * under the shared float discipline (both engines run the identical
    * (value - mean) / std arithmetic). */
  def eventAnomaly(s: SparkSession, d: String): DataFrame = {
    val pur = ev(s, d).filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
    val stats = pur.groupBy("user_id")
      .agg(avg("value").as("mu"), stddev_samp("value").as("sd"), count(lit(1)).as("n"))
      .filter(col("n") >= 3 && col("sd") > 0)
    pur.join(stats, "user_id")
      .withColumn("z", round((col("value") - col("mu")) / col("sd"), 4))
      .filter(abs(col("z")) > 2.0)
      .select("event_id", "user_id", "z")
      .orderBy("event_id")
  }

  /** DAU/WAU: per active day, the distinct-user count that day and over
    * the trailing 7-day window. The rolling distinct can't run as a
    * window aggregate (DISTINCT in frames is unsupported on both
    * engines); instead each (user, day) grain row COVERS the 7 window
    * ends it contributes to — a bounded explode (×7) — and one keyed
    * distinct-count per cover day finishes it. Two shuffles on day-grain
    * keys; the grain table, not the raw event stream, is what explodes,
    * so the fan-out is capped at 7 × |user-days| at any scale. */
  def eventDauWau(s: SparkSession, d: String): DataFrame = {
    val days = ev(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    val dau = days.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val wau = days
      .select(col("user_id"),
        explode(expr("sequence(day, day + interval 6 days, interval 1 day)")).as("day"))
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "day") // only days that actually occur in the data
      .select("day", "dau", "wau")
      .orderBy("day")
  }

  /** Gap-based sessionization with stable per-user session ORDINALS — the
    * batch classic (lag → new-session flag → running count). Differs from
    * the I3 session window ([[streamSession]], Spark's session_window
    * aggregate): the ordinal session_id is a join key downstream systems
    * rely on, and the three passes (lag, running sum, per-session agg)
    * all run inside ONE shuffle on user_id — the window sort orders by
    * (ts, event_id) so ties can't flip session numbering between engines.
    * The per-session aggregation adds NO exchange either: its grouping
    * key (user_id, session_id) is a superset of the window's user_id
    * hash partitioning, which Catalyst recognizes as already clustered
    * (verified in the formatted plan — the only post-scan exchange
    * besides the window's is the output ORDER BY's range partitioning).
    * Gap arithmetic is integer microseconds on both engines (§5.3.3
    * discipline). */
  def eventSessionize(s: SparkSession, d: String): DataFrame =
    // ONE sessionization kernel in this file: the lag → gap-flag →
    // running-sum logic is [[sessionize]] (1-day gap here); a second
    // hand-rolled copy silently diverged from any future fix to the
    // shared one, invisibly to the oracle gate
    sessionize(ev(s, d).select("user_id", "event_id", "ts"), gapSeconds = 86400L)
      .select(col("user_id"), col("sess_id").as("session_id"),
        col("session_start"), col("session_end"), col("n_events"))
      .orderBy("user_id", "session_id")

  /** Marketing attribution, batch form: each purchase is credited to the
    * user's FIRST and LAST preceding touch event (click/view) — the two
    * canonical attribution models, side by side, per conversion. The
    * streaming twin (StreamingOps.purchaseAttribution) keeps last-touch
    * state per user; this is the oracle-checkable replay. Strictly
    * PRECEDING frame (1 preceding), so a click in the same instant as
    * the purchase only counts if it sorts earlier on the (ts, event_id)
    * total order — the same tie discipline sessionize uses. A purchase
    * with no prior touch keeps NULL attribution (organic conversion).
    * Scale: one shuffle on user_id, two sorted window passes sharing one
    * sort — no joins at all. */
  def eventAttribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = col("event_type").isin("click", "view")
    ev(s, d)
      .withColumn("first_touch_id",
        first(when(touch, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("first_touch_type",
        first(when(touch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("last_touch_id",
        last(when(touch, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_touch_type",
        last(when(touch, col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("value"),
        col("first_touch_id"), col("first_touch_type"),
        col("last_touch_id"), col("last_touch_type"))
      .orderBy("purchase_id")
  }

  /** Each user's daily purchase total in exact integer cents — ONE
    * definition under the interpolation and EWMA keys (and, through the
    * EWMA spec, the streaming twin), so a quantization or filter change
    * can never reach only one of them. */
  private def perUserDailyCents(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("v"))

  /** Linear gap-fill of each user's daily purchase series — the
    * regularization step every downstream feature/forecast job needs (a
    * model wants a dense grid; the raw stream is sparse). Each user's
    * observed [first, last]-day range becomes a dense daily spine;
    * missing days interpolate linearly between the two neighboring
    * observed days (win_fill_forward is the step-function sibling; this
    * is the C0-continuous one).
    *
    * Determinism: daily sums are exact integer CENTS (floor(v·100+0.5)
    * BIGINT, immune to summation order); the interpolation fraction is a
    * ratio of small day-offset integers, and the one float expression is
    * mirrored character-for-character in the oracle, rounded half-up
    * 4 dp (values ≥ 0). Endpoint days are observed by construction, so
    * interior gaps always have both neighbors.
    *
    * Scale: the explode is bounded by users × span-days (GRAIN rows, not
    * events); one shuffle keys the corpus to (user, day), then two
    * window passes per user share one sort of the grain table. */
  def tsInterpolate(s: SparkSession, d: String): DataFrame = {
    val daily = perUserDailyCents(s, d)
    val grid = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"), explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val wP = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wN = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("pv", last("v", ignoreNulls = true).over(wP))
      .withColumn("pd", last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wP))
      .withColumn("nv", first("v", ignoreNulls = true).over(wN))
      .withColumn("nd", first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wN))
      .select(col("user_id"), col("day"),
        when(col("v").isNotNull, lit("obs")).otherwise(lit("gap")).as("kind"),
        (floor(when(col("v").isNotNull, col("v").cast("double"))
          .otherwise(col("pv").cast("double") + (col("nv") - col("pv")).cast("double") *
            (datediff(col("day"), col("pd")).cast("double") /
              datediff(col("nd"), col("pd")).cast("double"))) * 10000.0 + 0.5) / 10000.0)
          .as("value_cents"))
      .orderBy("user_id", "day")
  }

  /** Consecutive-active-day streaks per user — the gaps-and-islands
    * idiom (island key = epoch-day − dense row index, constant exactly
    * while days are consecutive) that engagement metrics (longest
    * streak) and SLA reports are built on. All arithmetic is integer
    * day-epochs; no float appears anywhere in the key.
    * Scale: the corpus collapses to the (user, day) grain first (one
    * hash aggregation); the window and both census aggregations run on
    * grain rows. One shuffle on user_id covers the window and the
    * island group-by (same key, Catalyst reuses the exchange). */
  def eventStreaks(s: SparkSession, d: String): DataFrame = {
    val days = ev(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val islands = days
      .withColumn("grp", datediff(col("day"), lit("1970-01-01").cast("date")) -
        row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min("day").as("streak_start"))
    islands
      .withColumn("mx", max("len").over(Window.partitionBy("user_id")))
      .groupBy("user_id")
      .agg(sum("len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max("len").as("max_streak"),
        // start day of the longest streak (earliest on ties)
        min(when(col("len") === col("mx"), col("streak_start"))).as("max_streak_start"))
      .orderBy("user_id")
  }

  /** Exponentially weighted moving average (α = 1/2) over each user's
    * observed daily purchase series — the standard smoothing baseline an
    * anomaly detector compares the next reading against. The recurrence
    * s_k = α·x_k + (1−α)·s_{k−1} has the closed window form
    * s_k = (x_0 + Σ_{i=1..k} x_i·2^{i−1}) / 2^k, and with α = 1/2,
    * integer-cent inputs, and a ≤ 31-day fixture span EVERY term is an
    * exact double (weights are powers of two; the numerator stays far
    * below 2^53; the final division by 2^k only shifts the exponent) —
    * the one key in the family needing NO rounding discipline at all:
    * both engines produce bit-identical doubles by construction.
    *
    * Scale: one shuffle on user_id; one window pass per user over its
    * observed-day grain. The 2^k weights cap the usable window at ~900
    * days of history (past that, production chunks by epoch or carries
    * the recurrence as streaming state — mapGroupsWithState — instead of
    * a window); the fixture span is 30 days, asserted in the spec. */
  def tsEwma(s: SparkSession, d: String): DataFrame = {
    val daily = perUserDailyCents(s, d)
    val wOrd = Window.partitionBy("user_id").orderBy("day")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("k", row_number().over(wOrd) - 1)
      .withColumn("num", sum(when(col("k") === 0, col("v").cast("double"))
        .otherwise(col("v").cast("double") * pow(lit(2.0), col("k") - 1))).over(wCum))
      .select(col("user_id"), col("day"), col("v").as("v_cents"),
        (col("num") / pow(lit(2.0), col("k"))).as("ewma_cents"))
      .orderBy("user_id", "day")
  }

  /** Holt's double-exponential smoothing (level + trend, α = β = 1/2)
    * over each user's daily purchase series — [[tsEwma]]'s
    * trend-aware sibling, the standard short-horizon forecaster. The
    * coupled recursion
    *   l_t = (x_t + l_{t−1} + b_{t−1}) / 2,  b_t = (l_t − l_{t−1} + b_{t−1}) / 2
    * has no closed window form (unlike EWMA's power-of-two sum), so it
    * runs as an exact INTEGER micro-cent fold: inputs scale by 10⁶ and
    * every halving is a truncating BIGINT division — Spark's `DIV` and
    * DuckDB's `//` both truncate toward zero (negative trends
    * included), so the replayed recursive-CTE oracle is bit-identical.
    *
    * Scale: one shuffle on user_id; each group folds its own observed
    * days (≤ fixture-span 31, asserted by the EWMA spec) through one
    * `aggregate` HOF — per-group state is the state array, never the
    * corpus. Past ~10⁴ days of history production carries (l, b) as
    * streaming state (the ewmaStream shape) instead of a fold. */
  def tsHoltWinters(s: SparkSession, d: String): DataFrame =
    perUserDailyCents(s, d)
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("day"), col("v")))).as("xs"))
      .withColumn("st", expr(
        """aggregate(
             xs,
             CAST(array() AS ARRAY<STRUCT<day: DATE, lvl: BIGINT, trd: BIGINT>>),
             (acc, x) -> CASE WHEN size(acc) = 0
               THEN array(named_struct('day', x.day, 'lvl', x.v * 1000000L, 'trd', 0L))
               ELSE concat(acc, array(named_struct(
                 'day', x.day,
                 'lvl', (x.v * 1000000L + element_at(acc, -1).lvl + element_at(acc, -1).trd) DIV 2L,
                 'trd', ((x.v * 1000000L + element_at(acc, -1).lvl + element_at(acc, -1).trd) DIV 2L
                          - element_at(acc, -1).lvl + element_at(acc, -1).trd) DIV 2L)))
             END)"""))
      .select(col("user_id"), explode(col("st")).as("s"))
      .select(col("user_id"), col("s.day").as("day"),
        col("s.lvl").as("level_uc"), col("s.trd").as("trend_uc"),
        (col("s.lvl") + col("s.trd")).as("forecast_uc"))
      .orderBy("user_id", "day")

  /** Day-of-week seasonal decomposition of corpus daily revenue — the
    * additive "weekday effect" split every ops dashboard applies before
    * comparing a Saturday to a Tuesday. Daily totals are exact integer
    * cents; each weekday's mean is a truncating integer division
    * (mirrored `DIV` ≡ `//` on non-negative sums); deseasonalized =
    * day − its weekday mean. Scale: one day-grain aggregation, then an
    * equi-join against the 7-row weekday means — broadcast by size, a
    * map-side subtraction. */
  def tsSeasonalDow(s: SparkSession, d: String): DataFrame =
    seasonalDowFrame(s, d).orderBy("day")

  /** The decomposed (day, dow, rev_c, dow_mean_c, deseason_c) frame —
    * shared by [[tsSeasonalDow]] and [[statSeasonalityStrength]]. */
  private def seasonalDowFrame(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("rev_c"))
      .withColumn("dow", dayofweek(col("day")))
    val dowMean = daily.groupBy("dow")
      .agg(expr("sum(rev_c) DIV count(*)").as("dow_mean_c"))
    daily.join(broadcast(dowMean), "dow")
      .select(col("day"), col("dow"), col("rev_c"), col("dow_mean_c"),
        (col("rev_c") - col("dow_mean_c")).as("deseason_c"))
  }

  /** Seasonality strength — the one-number answer to "does the weekday
    * pattern actually explain this series": 1 − Var(residual)/Var(raw)
    * over [[seasonalDowFrame]]'s decomposition, computed on the
    * variance cross-product form N·Σx² − (Σx)² so every moment is an
    * exact integer (cents² products in DECIMAL(38,0) / HUGEINT — the
    * established overflow discipline) and the ONE float is the mirrored
    * variance ratio (VARCHAR→DOUBLE bridge in the oracle), sign-aware
    * 6 dp. Scale: the day-grain frame, one global 1-row aggregation. */
  def statSeasonalityStrength(s: SparkSession, d: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(19,0)")
    val m = seasonalDowFrame(s, d).agg(
      count(lit(1)).as("n_days"),
      sum("rev_c").as("sr"),
      sum((dec(col("rev_c")) * dec(col("rev_c"))).cast("decimal(38,0)")).as("srr"),
      sum("deseason_c").as("se"),
      sum((dec(col("deseason_c")) * dec(col("deseason_c"))).cast("decimal(38,0)")).as("see"))
    val num = (dec(col("n_days")) * col("see") -
      (dec(col("se")) * dec(col("se"))).cast("decimal(38,0)")).cast("decimal(38,0)")
    val den = (dec(col("n_days")) * col("srr") -
      (dec(col("sr")) * dec(col("sr"))).cast("decimal(38,0)")).cast("decimal(38,0)")
    val strength = lit(1.0) - num.cast("double") / den.cast("double")
    m.select(col("n_days"),
      (signum(strength) * (floor(abs(strength) * 1000000.0 + 0.5) / 1000000.0) + lit(0.0))
        .as("strength"))
  }

  /** Cohort LTV matrix — revenue by (signup-week cohort × age-in-weeks):
    * the retention table's money twin, THE report subscription/commerce
    * teams steer by. Cohort = ISO week of each user's first event (any
    * type); a purchase lands in cell (cohort, weeks since). Revenue is
    * exact integer cents; ages are exact integer week offsets (week
    * starts differ by multiples of 7 days, so the /7 is exact).
    * Scale: one user-grain aggregation (first-seen), one join back on
    * user_id, one (cohort, age) hash aggregation — all on the same key
    * family, so one partitioning serves every stage. */
  def eventCohortLtv(s: SparkSession, d: String): DataFrame = {
    val cohorts = ev(s, d).groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cw"))
    ev(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("pw"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("c"))
      .join(cohorts, "user_id")
      .groupBy(col("cw").as("cohort_week"),
        (datediff(col("pw"), col("cw")) / 7).cast("int").as("age_w"))
      .agg(countDistinct("user_id").as("n_buyers"), sum("c").as("revenue_c"))
      .orderBy("cohort_week", "age_w")
  }

  /** RFM segmentation — the marketing-analytics classic: per user,
    * Recency (days since last purchase, measured against the corpus'
    * last day), Frequency (purchase count), Monetary (total integer
    * cents), each cut into quintiles; a CASE ladder maps the three
    * scores to the standard segment names. Determinism: all three
    * metrics are exact integers; every quintile cut orders by (metric,
    * user_id) so tile assignment is total; recency quintiles invert
    * (recent = high score) by ordering recency DESC.
    * Scale: one hash aggregation to user grain, then three
    * [[ScalePrimitives.distNtile]] passes — each a parallel range
    * sort + pinned-partitioner rank, never a single-partition
    * window. The user grain is the
    * largest dimension in the system at 100 TB; a global
    * `ntile() OVER (ORDER BY …)` would sort all of it on one task,
    * which is exactly what this formulation avoids while staying
    * bit-identical to the plain-ntile oracle. */
  def eventRfm(s: SparkSession, d: String): DataFrame = {
    val pur = ev(s, d).filter(col("event_type") === "purchase")
    val perUser = pur.groupBy("user_id").agg(
      max(to_date(col("ts"))).as("last_day"),
      count(lit(1)).as("frequency"),
      sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("monetary_c"))
    // the measurement horizon is ONE date — a bounded driver literal (the
    // vt_bloom_lookup key-fetch pattern), not an unbounded window whose
    // single-partition sort would re-order the whole user grain just to
    // broadcast a scalar
    val horizon = pur.agg(max(to_date(col("ts")))).head().getDate(0)
    val withRec = perUser.withColumn("recency_d",
      datediff(lit(horizon), col("last_day")).cast("long"))
    val scored = Seq[(String, Seq[Column])](
      ("r_score", Seq(col("recency_d").desc, col("user_id"))),
      ("f_score", Seq(col("frequency"), col("user_id"))),
      ("m_score", Seq(col("monetary_c"), col("user_id")))
    ).foldLeft(withRec) { case (df, (out, ord)) =>
      ScalePrimitives.distNtile(df, 5, out, ord: _*) }
    scored.select(col("user_id"), col("recency_d"), col("frequency"),
      col("monetary_c"), col("r_score"), col("f_score"), col("m_score"),
      when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4, "champion")
        .when(col("r_score") >= 4 && col("f_score") >= 3, "loyal")
        .when(col("r_score") >= 4, "recent")
        .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk")
        .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
        .otherwise("regular").as("segment"))
      .orderBy("user_id")
  }

  /** The corpus-wide daily purchase total in exact integer cents — the
    * shared series under the ACF and CUSUM keys (one definition, so a
    * binning change can never reach only one of them). */
  private def dailyTotals(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("x"))

  /** Autocorrelation function of daily revenue at lags 1..7 — THE
    * first question against any KPI series ("is there weekly
    * structure?"). r_k is the Pearson correlation over the (x_t,
    * x_{t+k}) pair set: all five moments are exact integer sums of
    * integer cents — the squared/cross moments ride in DECIMAL(38,0) /
    * HUGEINT, since a corpus-wide daily total past ~3e9 cents squares
    * beyond int64 (the agg_regression_multi Σy² discipline), and the one sqrt/divide expression is mirrored
    * character-for-character, rounded sign-aware 6 dp.
    * Scale: the corpus collapses to day grain first; the lag spine
    * EXPLODES onto the grain rows (×7), and the pairing is then a pure
    * equi-join on the computed day+k key — no nested-loop node anywhere,
    * and never a corpus operation. */
  def tsAutocorr(s: SparkSession, d: String): DataFrame = {
    val daily = dailyTotals(s, d)
    val pairs = daily
      .select(col("day"), col("x").as("xa"),
        explode(sequence(lit(1), lit(7))).as("lag"))
      .join(daily.select(col("day").as("bday"), col("x").as("xb")),
        col("bday") === date_add(col("day"), col("lag")))
      .select(col("lag"), col("xa"), col("xb"))
    // exact DECIMAL summation. Conversion discipline: Spark's
    // decimal→double is correctly rounded (BigInteger.doubleValue), but
    // DuckDB's HUGEINT→DOUBLE cast is NOT (verified empirically:
    // ~0.8% of >2^53 values off by 1 ulp) — the oracle must route
    // HUGEINT sums through VARCHAR, whose parse IS correctly rounded,
    // so both engines read the identical double at any magnitude
    def m2(a: Column, b: Column) =
      sum(a.cast("decimal(19,0)") * b.cast("decimal(19,0)"))
    val m = pairs.groupBy("lag").agg(count(lit(1)).as("n_pairs"),
      sum("xa").as("sa"), sum("xb").as("sb"),
      m2(col("xa"), col("xa")).as("saa"),
      m2(col("xb"), col("xb")).as("sbb"),
      m2(col("xa"), col("xb")).as("sab"))
    def db(c: String) = col(c).cast("double")
    val r = (db("n_pairs") * db("sab") - db("sa") * db("sb")) /
      sqrt((db("n_pairs") * db("saa") - db("sa") * db("sa")) *
        (db("n_pairs") * db("sbb") - db("sb") * db("sb")))
    m.select(col("lag"), col("n_pairs"),
      (signum(r) * (floor(abs(r) * 1000000.0 + 0.5) / 1000000.0) + lit(0.0)).as("r"))
      .orderBy("lag")
  }

  /** CUSUM changepoint detection on daily revenue — where did the level
    * shift? The scan statistic is kept EXACTLY integer by scaling: with
    * prefix sum P_t and total T over n days, n·P_t − t·T is n times the
    * centered CUSUM, so argmax |n·P_t − t·T| needs no float at all; the
    * split means (4 dp) and the normalized peak ride along as mirrored
    * divisions of exact integers. Earliest day wins ties. One day-grain
    * aggregation + one window pass; at 100 TB only the grain table sorts. */
  def tsChangepoint(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wOrd = Window.orderBy("day")
    dailyTotals(s, d)
      .withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("p", sum("x").over(wCum))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tt", sum("x").over(wAll))
      .filter(col("t") < col("n")) // a "change after the last day" is no change
      .withColumn("s_abs", abs(col("n") * col("p") - col("t") * col("tt")))
      .orderBy(col("s_abs").desc, col("day"))
      .limit(1)
      .select(col("day").as("cp_day"), col("t").as("t_idx"), col("n").as("n_days"),
        col("s_abs"),
        (floor(col("p").cast("double") / col("t").cast("double") * 10000.0 + 0.5)
          / 10000.0).as("mean_before"),
        (floor((col("tt") - col("p")).cast("double") /
          (col("n") - col("t")).cast("double") * 10000.0 + 0.5) / 10000.0).as("mean_after"))
  }

  /** Top-25 user-journey prefixes: the first 4 events of every user's
    * (ts, event_id)-ordered stream joined into a path string, counted
    * across users — the pathing report next to [[eventTransitions]]'s
    * first-order Markov table (paths keep the ORDER context a bigram
    * table marginalizes away; 4 steps over 5 event types bounds the path
    * domain at 5⁴ keys).
    *
    * Determinism: the per-user sequence is the (ts, event_id) total
    * order; path assembly sorts the collected (rn, type) structs, so no
    * collect_list arrival-order nondeterminism reaches the output; the
    * ranking breaks count ties on the path string.
    *
    * Scale: one shuffle on user_id (window + per-user agg share the
    * sort), one on the bounded path domain; collect_list is capped at 4
    * structs per user by the rn filter, so per-group state is O(1). */
  def eventPathTopk(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
      .groupBy("user_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
        x => x.getField("event_type")), ">").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(25)
  }

  /** Peak session concurrency — the capacity-planning question every
    * serving team asks of an event log ("how many sessions were live at
    * the worst moment?"). [[sessionize]] (the I3 30-min kernel) yields
    * [start, end] intervals; the classic sweep-line turns each into a
    * +1 boundary at start and a −1 at end+1µs (sessions are active
    * through their last event's instant), collapses boundaries to the
    * timestamp grain, and takes the running sum — which is the live
    * count at each instant. Peak = lexicographic top-1 by (count DESC,
    * ts ASC), so ties resolve to the EARLIEST peak moment and the
    * output is total-order deterministic.
    * Scale: the boundary running sum is over the timestamp grain — the
    * data grain — so it rides [[ScalePrimitives.distRunning]]'s
    * two-pass range-partitioned scan, never an unpartitioned window;
    * the top-1 is a TakeOrdered, never a global sort. */
  def eventPeakConcurrency(s: SparkSession, d: String): DataFrame = {
    val sess = sessionize(ev(s, d))
    val bounds = sess.select(col("session_start").as("ts"), lit(1L).as("delta"))
      .unionAll(sess.select(
        (col("session_end") + expr("INTERVAL 1 MICROSECOND")).as("ts"),
        lit(-1L).as("delta")))
      .groupBy("ts").agg(sum("delta").as("delta"))
    val run = ScalePrimitives.distRunning(bounds, Seq(col("ts")), "__rnk",
      Seq("delta"), Seq("conc"))
    // n_sessions rides the same job as a broadcast single-row branch (a
    // count is order-independent, so the in-plan second reference to the
    // sessionize aggregation carries none of the range-sampling hazard
    // distRunning's doc warns about) — not a separate count() job that
    // would recompute the whole sessionize pipeline first.
    run.orderBy(col("conc").desc, col("ts")).limit(1)
      .crossJoin(broadcast(sess.agg(count(lit(1)).as("n_sessions"))))
      .select(col("n_sessions"), col("conc").as("peak_concurrent"),
        col("ts").as("peak_at"))
  }

  /** Inter-arrival gap profile per event type — the latency/engagement
    * gauge behind session-gap tuning ("is 30 min the right cut?") and
    * anomaly baselines. The gap attaches to the LATER event's type; the
    * lag window partitions by user (the I3 sessionize shape — shuffles
    * once on user_id, never a global sort), and every statistic is an
    * exact integer microsecond (mean as floor division, mirrored as
    * DuckDB's `//`). */
  def eventInterArrival(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("gap", col("us") - lag("us", 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"), min("gap").as("min_us"),
        max("gap").as("max_us"), sum("gap").as("sum_us"))
      .withColumn("mean_us", expr("sum_us DIV n_gaps"))
      .select("event_type", "n_gaps", "min_us", "max_us", "mean_us")
      .orderBy("event_type")
  }

  val queries: Map[String, Q] = Map(
    "event_peak_concurrency" -> (eventPeakConcurrency _),
    "event_inter_arrival" -> (eventInterArrival _),
    "ts_interpolate" -> (tsInterpolate _),
    "ts_ewma" -> (tsEwma _),
    "ts_holtwinters" -> (tsHoltWinters _),
    "ts_seasonal_dow" -> (tsSeasonalDow _),
    "stat_seasonality_strength" -> (statSeasonalityStrength _),
    "ts_autocorr" -> (tsAutocorr _),
    "ts_changepoint" -> (tsChangepoint _),
    "event_rfm" -> (eventRfm _),
    "event_cohort_ltv" -> (eventCohortLtv _),
    "event_streaks" -> (eventStreaks _),
    "event_path_topk" -> (eventPathTopk _),
    "event_attribution" -> (eventAttribution _),
    "event_attribution_decay" -> (eventAttributionDecay _),
    "event_sessionize" -> (eventSessionize _),
    "event_dau_wau" -> (eventDauWau _),
    "event_anomaly" -> (eventAnomaly _),
    "stream_tumbling" -> (streamTumbling _),
    "stream_sliding" -> (streamSliding _),
    "stream_session" -> (streamSession _),
    "stream_dedup" -> (streamDedup _),
    "event_funnel" -> (eventFunnel _),
    "event_funnel_time" -> (eventFunnelTime _),
    "event_retention" -> (eventRetention _),
    "event_lifecycle" -> (eventLifecycle _),
    "event_transitions" -> (eventTransitions _),
  )

  val oracles: Map[String, String] = Map(
    // the same 30-min sessionize kernel as event_sessionize's oracle,
    // then the sweep-line: ±1 boundaries (end + 1µs), timestamp-grain
    // net deltas, running sum, lexicographic top-1 (peak DESC, ts ASC)
    "event_peak_concurrency" ->
      ("WITH ordered AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, " +
        "CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL OR " +
        "epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000 " +
        "THEN 1 ELSE 0 END AS new_session FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)), " +
        "numbered AS (SELECT user_id, ts, CAST(sum(new_session) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id " +
        "FROM ordered), " +
        "sessions AS (SELECT user_id, sess_id, min(ts) AS session_start, max(ts) AS session_end " +
        "FROM numbered GROUP BY 1, 2), " +
        "bounds AS (SELECT session_start AS ts, 1 AS delta FROM sessions " +
        "UNION ALL SELECT session_end + INTERVAL 1 MICROSECOND, -1 FROM sessions), " +
        "net AS (SELECT ts, CAST(sum(delta) AS BIGINT) AS delta FROM bounds GROUP BY 1), " +
        "cum AS (SELECT ts, CAST(sum(delta) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc FROM net) " +
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM sessions) AS n_sessions, " +
        "conc AS peak_concurrent, ts AS peak_at FROM cum ORDER BY conc DESC, ts LIMIT 1"),
    // gap = µs to the previous event of the SAME user, attributed to the
    // later event's type; all-integer stats, mean as floor division
    "event_inter_arrival" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events), " +
        "g AS (SELECT event_type, us - lag(us) OVER " +
        "(PARTITION BY user_id ORDER BY us, event_id) AS gap FROM e) " +
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps, " +
        "CAST(min(gap) AS BIGINT) AS min_us, CAST(max(gap) AS BIGINT) AS max_us, " +
        "CAST(sum(gap) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_us " +
        "FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1"),
    // daily sums are exact integer cents; the interpolation expression
    // mirrors the Spark parenthesization character-for-character
    "ts_interpolate" ->
      ("WITH daily AS (SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day, " +
        "CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS v " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2), " +
        "grid AS (SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day " +
        "FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1)), " +
        "j AS (SELECT g.user_id, g.day, v FROM grid g LEFT JOIN daily dd " +
        "ON g.user_id = dd.user_id AND g.day = dd.day), " +
        "f AS (SELECT user_id, day, v, " +
        "last_value(v IGNORE NULLS) OVER wp AS pv, " +
        "last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wp AS pd, " +
        "first_value(v IGNORE NULLS) OVER wn AS nv, " +
        "first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wn AS nd " +
        "FROM j WINDOW " +
        "wp AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "wn AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT user_id, day, CASE WHEN v IS NOT NULL THEN 'obs' ELSE 'gap' END AS kind, " +
        "floor((CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE) " +
        "ELSE CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE) * " +
        "(CAST(date_diff('day', pd, day) AS DOUBLE) / CAST(date_diff('day', pd, nd) AS DOUBLE)) END) " +
        "* 10000.0 + 0.5) / 10000.0 AS value_cents " +
        "FROM f ORDER BY user_id, day"),
    // exact integer cents and week offsets; week starts differ by
    // multiples of 7 days, so the // 7 is exact on both engines
    "event_cohort_ltv" ->
      ("WITH c AS (SELECT user_id, CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS DATE) AS cw " +
        "FROM events GROUP BY 1), " +
        "p AS (SELECT user_id, CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS pw, " +
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cc " +
        "FROM events WHERE event_type = 'purchase') " +
        "SELECT c.cw AS cohort_week, CAST(date_diff('day', c.cw, p.pw) // 7 AS INTEGER) AS age_w, " +
        "CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_buyers, CAST(sum(cc) AS BIGINT) AS revenue_c " +
        "FROM p JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2"),
    // integer metrics; every ntile orders by (metric, user_id) so the
    // quintile cut is total; the CASE ladder mirrors verbatim
    "event_rfm" ->
      ("WITH pu AS (SELECT user_id, " +
        "max(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS last_day, " +
        "CAST(count(*) AS BIGINT) AS frequency, " +
        "CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS monetary_c " +
        "FROM events WHERE event_type = 'purchase' GROUP BY user_id), " +
        "r AS (SELECT user_id, CAST(date_diff('day', last_day, max(last_day) OVER ()) AS BIGINT) AS recency_d, " +
        "frequency, monetary_c FROM pu), " +
        "sc AS (SELECT user_id, recency_d, frequency, monetary_c, " +
        "CAST(ntile(5) OVER (ORDER BY recency_d DESC, user_id) AS INTEGER) AS r_score, " +
        "CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS INTEGER) AS f_score, " +
        "CAST(ntile(5) OVER (ORDER BY monetary_c, user_id) AS INTEGER) AS m_score FROM r) " +
        "SELECT user_id, recency_d, frequency, monetary_c, r_score, f_score, m_score, " +
        "CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion' " +
        "WHEN r_score >= 4 AND f_score >= 3 THEN 'loyal' " +
        "WHEN r_score >= 4 THEN 'recent' " +
        "WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk' " +
        "WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating' " +
        "ELSE 'regular' END AS segment FROM sc ORDER BY user_id"),
    // exact BIGINT cent-moments per lag; the Pearson expression mirrors
    // the Spark parenthesization; DATE + INT adds days in DuckDB
    "ts_autocorr" ->
      ("WITH daily AS (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day, " +
        "CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS x " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1), " +
        "lags AS (SELECT CAST(range AS INTEGER) AS lag FROM range(1, 8)), " +
        "pairs AS (SELECT lag, a.x AS xa, b.x AS xb FROM daily a CROSS JOIN lags " +
        "JOIN daily b ON b.day = a.day + lag), " +
        "m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(xa) AS BIGINT) AS sa, CAST(sum(xb) AS BIGINT) AS sb, " +
        "sum(CAST(xa AS HUGEINT) * xa) AS saa, sum(CAST(xb AS HUGEINT) * xb) AS sbb, " +
        "sum(CAST(xa AS HUGEINT) * xb) AS sab FROM pairs GROUP BY lag), " +
        "c AS (SELECT lag, n_pairs, " +
        "(CAST(n_pairs AS DOUBLE) * CAST(CAST(sab AS VARCHAR) AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) / " +
        "sqrt((CAST(n_pairs AS DOUBLE) * CAST(CAST(saa AS VARCHAR) AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) * " +
        "(CAST(n_pairs AS DOUBLE) * CAST(CAST(sbb AS VARCHAR) AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))) AS r FROM m) " +
        "SELECT lag, n_pairs, sign(r) * (floor(abs(r) * 1000000.0 + 0.5) / 1000000.0) + 0.0 AS r " +
        "FROM c ORDER BY lag"),
    // the scan statistic n*P_t - t*T is exact BIGINT; argmax needs no
    // float; earliest day breaks ties
    "ts_changepoint" ->
      ("WITH daily AS (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day, " +
        "CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS x " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1), " +
        "c AS (SELECT day, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t, " +
        "CAST(sum(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p, " +
        "CAST(count(*) OVER () AS BIGINT) AS n, CAST(sum(x) OVER () AS BIGINT) AS tt FROM daily), " +
        "f AS (SELECT day, t, n, p, tt, abs(n * p - t * tt) AS s_abs FROM c WHERE t < n) " +
        "SELECT day AS cp_day, t AS t_idx, n AS n_days, CAST(s_abs AS BIGINT) AS s_abs, " +
        "floor(CAST(p AS DOUBLE) / CAST(t AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS mean_before, " +
        "floor(CAST(tt - p AS DOUBLE) / CAST(n - t AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS mean_after " +
        "FROM f ORDER BY s_abs DESC, cp_day LIMIT 1"),
    // pure integer day-epoch arithmetic end to end; the island key is
    // epoch-day − row_number, mirrored exactly
    "event_streaks" ->
      ("WITH days AS (SELECT DISTINCT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day FROM events), " +
        "isl AS (SELECT user_id, date_diff('day', DATE '1970-01-01', day) - " +
        "row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp, day FROM days), " +
        "st AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len, min(day) AS streak_start " +
        "FROM isl GROUP BY 1, 2), " +
        "mx AS (SELECT user_id, grp, len, streak_start, max(len) OVER (PARTITION BY user_id) AS m FROM st) " +
        "SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days, " +
        "CAST(count(*) AS BIGINT) AS n_streaks, CAST(max(len) AS BIGINT) AS max_streak, " +
        "min(CASE WHEN len = m THEN streak_start END) AS max_streak_start " +
        "FROM mx GROUP BY user_id ORDER BY user_id"),
    // power-of-two weights over integer cents: every double is exact,
    // so there is no rounding anywhere in this oracle by design
    "ts_ewma" ->
      ("WITH daily AS (SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day, " +
        "CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS v " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2), " +
        "k AS (SELECT user_id, day, v, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY day) - 1 AS k FROM daily), " +
        "n AS (SELECT user_id, day, v, k, " +
        "sum(CASE WHEN k = 0 THEN CAST(v AS DOUBLE) ELSE CAST(v AS DOUBLE) * pow(2.0, k - 1) END) " +
        "OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS num FROM k) " +
        "SELECT user_id, day, v AS v_cents, num / pow(2.0, k) AS ewma_cents " +
        "FROM n ORDER BY user_id, day"),
    // distinct user-weeks, lag/lead status labels, week-grain counts;
    // churn attributed to run-end week + 7; DATE subtraction yields
    // integer days in DuckDB, mirrored by Spark's datediff
    "event_lifecycle" ->
      ("WITH uw AS (SELECT DISTINCT user_id, " +
        "CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk FROM events), " +
        "l AS (SELECT user_id, wk, lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev, " +
        "lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt FROM uw), " +
        "act AS (SELECT wk, " +
        "CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new, " +
        "CAST(sum(CASE WHEN prev IS NOT NULL AND wk - prev = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained, " +
        "CAST(sum(CASE WHEN prev IS NOT NULL AND wk - prev > 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected " +
        "FROM l GROUP BY 1), " +
        "ch AS (SELECT wk + 7 AS wk, CAST(count(*) AS BIGINT) AS n_churned FROM l " +
        "WHERE nxt IS NULL OR nxt - wk > 7 GROUP BY 1) " +
        "SELECT COALESCE(act.wk, ch.wk) AS wk, " +
        "CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new, " +
        "CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained, " +
        "CAST(COALESCE(n_resurrected, 0) AS BIGINT) AS n_resurrected, " +
        "CAST(COALESCE(n_churned, 0) AS BIGINT) AS n_churned " +
        "FROM act FULL OUTER JOIN ch ON act.wk = ch.wk ORDER BY wk"),
    // exact 2^(30-d) integer weights, HUGEINT sums, VARCHAR→DOUBLE
    // bridge on the one share division
    "event_attribution_decay" ->
      ("WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events), " +
        "fp AS (SELECT user_id, min(ts) AS fp_ts FROM e WHERE event_type = 'purchase' GROUP BY 1), " +
        "t AS (SELECT e.event_type, datediff('day', CAST(e.ts AS DATE), CAST(fp.fp_ts AS DATE)) AS d " +
        "FROM e JOIN fp ON e.user_id = fp.user_id " +
        "WHERE e.event_type IN ('click', 'view') AND e.ts < fp.fp_ts), " +
        "w AS (SELECT event_type, CASE WHEN d <= 30 THEN CAST(1 AS BIGINT) << (30 - d) " +
        "ELSE CAST(0 AS BIGINT) END AS w FROM t), " +
        "per AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches, " +
        "CAST(sum(CAST(w AS HUGEINT)) AS HUGEINT) AS ws FROM w GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(ws) AS HUGEINT) AS tt FROM per) " +
        "SELECT event_type, n_touches, CAST(ws AS BIGINT) AS w_sum, " +
        "floor(CAST(CAST(ws AS VARCHAR) AS DOUBLE) / CAST(CAST(tt AS VARCHAR) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS share " +
        "FROM per, tot ORDER BY event_type"),
    // the same three step frames as event_funnel's oracle, folded to
    // per-transition integer-µs latency stats; the mean guards n = 0
    "event_funnel_time" ->
      ("WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events), " +
        "su AS (SELECT user_id, min(ts) AS s_ts FROM e WHERE event_type = 'signup' GROUP BY 1), " +
        "vu AS (SELECT e.user_id, min(e.ts) AS v_ts FROM e JOIN su ON e.user_id = su.user_id " +
        "WHERE e.event_type = 'view' AND e.ts > su.s_ts GROUP BY 1), " +
        "pu AS (SELECT e.user_id, min(e.ts) AS p_ts FROM e JOIN vu ON e.user_id = vu.user_id " +
        "WHERE e.event_type = 'purchase' AND e.ts > vu.v_ts GROUP BY 1), " +
        "g1 AS (SELECT epoch_us(v_ts) - epoch_us(s_ts) AS gap FROM vu JOIN su USING (user_id)), " +
        "g2 AS (SELECT epoch_us(p_ts) - epoch_us(v_ts) AS gap FROM pu JOIN vu USING (user_id)) " +
        "SELECT * FROM (" +
        "SELECT 'signup->view' AS step, CAST(count(*) AS BIGINT) AS n_users, " +
        "CAST(min(gap) AS BIGINT) AS min_us, CAST(max(gap) AS BIGINT) AS max_us, " +
        "CASE WHEN count(*) > 0 THEN CAST(sum(gap) AS BIGINT) // CAST(count(*) AS BIGINT) END AS mean_us FROM g1 " +
        "UNION ALL SELECT 'view->purchase', CAST(count(*) AS BIGINT), " +
        "CAST(min(gap) AS BIGINT), CAST(max(gap) AS BIGINT), " +
        "CASE WHEN count(*) > 0 THEN CAST(sum(gap) AS BIGINT) // CAST(count(*) AS BIGINT) END FROM g2" +
        ") ORDER BY step"),
    // the micro-cent Holt fold replayed as a recursive CTE: row 1 seeds
    // (l, b) = (v·10⁶, 0); each step joins the next rn and applies the
    // same truncating-division recursion (// ≡ Spark DIV on negatives)
    "ts_holtwinters" ->
      ("WITH RECURSIVE daily AS (SELECT user_id, " +
        "CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day, " +
        "CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS v " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2), " +
        "k AS (SELECT user_id, day, v, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM daily), " +
        "rec AS (" +
        "SELECT user_id, day, rn, CAST(v * 1000000 AS BIGINT) AS lvl, CAST(0 AS BIGINT) AS trd " +
        "FROM k WHERE rn = 1 " +
        "UNION ALL SELECT k.user_id, k.day, k.rn, " +
        "CAST((k.v * 1000000 + rec.lvl + rec.trd) // 2 AS BIGINT), " +
        "CAST(((k.v * 1000000 + rec.lvl + rec.trd) // 2 - rec.lvl + rec.trd) // 2 AS BIGINT) " +
        "FROM k JOIN rec ON k.user_id = rec.user_id AND k.rn = rec.rn + 1) " +
        "SELECT user_id, day, lvl AS level_uc, trd AS trend_uc, " +
        "CAST(lvl + trd AS BIGINT) AS forecast_uc FROM rec ORDER BY user_id, day"),
    // the ts_seasonal_dow decomposition folded to the variance ratio:
    // exact HUGEINT cross-products, VARCHAR→DOUBLE bridge, sign-aware 6dp
    "stat_seasonality_strength" ->
      ("WITH daily AS (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day, " +
        "CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1), " +
        "dd AS (SELECT day, CAST(dayofweek(day) + 1 AS INT) AS dow, rev_c FROM daily), " +
        "mn AS (SELECT dow, CAST(sum(rev_c) // count(*) AS BIGINT) AS dow_mean_c FROM dd GROUP BY 1), " +
        "f AS (SELECT dd.rev_c, dd.rev_c - mn.dow_mean_c AS e FROM dd JOIN mn ON dd.dow = mn.dow), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n_days, " +
        "CAST(sum(rev_c) AS HUGEINT) AS sr, sum(CAST(rev_c AS HUGEINT) * rev_c) AS srr, " +
        "CAST(sum(e) AS HUGEINT) AS se, sum(CAST(e AS HUGEINT) * e) AS see FROM f), " +
        "v AS (SELECT n_days, 1.0 - " +
        "CAST(CAST(n_days * see - se * se AS VARCHAR) AS DOUBLE) / " +
        "CAST(CAST(n_days * srr - sr * sr AS VARCHAR) AS DOUBLE) AS st FROM m) " +
        "SELECT n_days, sign(st) * floor(abs(st) * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS strength FROM v"),
    // DuckDB dayofweek is 0-based Sunday; +1 matches Spark's 1-based
    "ts_seasonal_dow" ->
      ("WITH daily AS (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day, " +
        "CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1), " +
        "dd AS (SELECT day, CAST(dayofweek(day) + 1 AS INT) AS dow, rev_c FROM daily), " +
        "m AS (SELECT dow, CAST(sum(rev_c) // count(*) AS BIGINT) AS dow_mean_c " +
        "FROM dd GROUP BY 1) " +
        "SELECT dd.day, dd.dow, dd.rev_c, m.dow_mean_c, " +
        "CAST(dd.rev_c - m.dow_mean_c AS BIGINT) AS deseason_c " +
        "FROM dd JOIN m ON dd.dow = m.dow ORDER BY dd.day"),
    // string_agg ORDER BY rn mirrors the sorted-struct path assembly;
    // the (n_users DESC, path) order is total, so LIMIT 25 is stable
    "event_path_topk" ->
      ("WITH e AS (SELECT user_id, event_type, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn FROM events), " +
        "p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path " +
        "FROM e WHERE rn <= 4 GROUP BY user_id) " +
        "SELECT path, count(*) AS n_users FROM p GROUP BY path " +
        "ORDER BY n_users DESC, path LIMIT 25"),
    // value passes through untouched (no float op, byte-identical);
    // IGNORE NULLS first/last over the strictly-preceding frame mirrors
    // the Spark window exactly
    "event_attribution" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events), " +
        "a AS (SELECT event_id, user_id, event_type, value, " +
        "first_value(CASE WHEN event_type IN ('click', 'view') THEN event_id END IGNORE NULLS) OVER w AS first_touch_id, " +
        "first_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END IGNORE NULLS) OVER w AS first_touch_type, " +
        "last_value(CASE WHEN event_type IN ('click', 'view') THEN event_id END IGNORE NULLS) OVER w AS last_touch_id, " +
        "last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END IGNORE NULLS) OVER w AS last_touch_type " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) " +
        "SELECT event_id AS purchase_id, user_id, value, first_touch_id, first_touch_type, " +
        "last_touch_id, last_touch_type FROM a WHERE event_type = 'purchase' ORDER BY purchase_id"),
    // gap test in integer MICROSECONDS (the §5.3.3 discipline the Spark
    // side runs), not interval comparison — the earlier INTERVAL form
    // happened to agree but made the stated invariant false
    "event_sessionize" ->
      ("WITH ordered AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, " +
        "CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL " +
        "OR epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 86400000000 THEN 1 ELSE 0 END AS new_session " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)), " +
        "numbered AS (SELECT user_id, ts, " +
        "CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id " +
        "FROM ordered) " +
        "SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end, " +
        "count(*) AS n_events FROM numbered GROUP BY 1, 2 ORDER BY user_id, session_id"),
    "event_dau_wau" ->
      ("WITH days AS (SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events), " +
        "dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM days GROUP BY day), " +
        "cover AS (SELECT user_id, unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS day FROM days), " +
        "wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM cover GROUP BY day) " +
        "SELECT dau.day, dau, wau FROM dau JOIN wau ON dau.day = wau.day ORDER BY dau.day"),
    "event_anomaly" ->
      ("WITH p AS (SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'), " +
        "st AS (SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sd, count(*) AS n FROM p GROUP BY user_id) " +
        "SELECT p.event_id, p.user_id, round((p.value - st.mu) / st.sd, 4) AS z " +
        "FROM p JOIN st ON p.user_id = st.user_id " +
        "WHERE st.n >= 3 AND st.sd > 0 AND abs(round((p.value - st.mu) / st.sd, 4)) > 2.0 ORDER BY p.event_id"),
    "stream_tumbling" ->
      "SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start, event_type, count(*) AS cnt, round(sum(value), 2) AS sum_v FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type",
    // Series bounds derived from the data (not the fixture's date span):
    // 30-min buckets are epoch-aligned in both engines, so time_bucket
    // reproduces Spark's slide grid at any scale factor.
    "stream_sliding" ->
      "WITH b AS (SELECT time_bucket(INTERVAL 30 MINUTE, min(CAST(ts AS TIMESTAMP))) - INTERVAL 30 MINUTE AS lo, time_bucket(INTERVAL 30 MINUTE, max(CAST(ts AS TIMESTAMP))) AS hi FROM events), g AS (SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b), INTERVAL 30 MINUTE)) AS wstart) SELECT wstart, count(*) AS cnt FROM g JOIN events e ON CAST(e.ts AS TIMESTAMP) >= g.wstart AND CAST(e.ts AS TIMESTAMP) < g.wstart + INTERVAL 1 HOUR GROUP BY wstart ORDER BY wstart",
    "stream_session" ->
      "WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events), l AS (SELECT user_id, ts, event_id, CASE WHEN lag(epoch_us(ts)) OVER w IS NULL OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), s AS (SELECT user_id, ts, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id FROM l) SELECT user_id, sess_id, count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_id",
    "stream_dedup" ->
      "SELECT event_id, ts, user_id, event_type, value FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, row_number() OVER (PARTITION BY event_id ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, user_id NULLS FIRST, event_type NULLS FIRST, value NULLS FIRST) AS rn FROM events) WHERE rn = 1 ORDER BY event_id",
    "event_funnel" ->
      ("WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events), " +
        "s AS (SELECT user_id, min(ts) AS s_ts FROM e WHERE event_type = 'signup' GROUP BY user_id), " +
        "v AS (SELECT e.user_id, min(e.ts) AS v_ts FROM e JOIN s ON e.user_id = s.user_id WHERE e.event_type = 'view' AND e.ts > s.s_ts GROUP BY e.user_id), " +
        "p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM e JOIN v ON e.user_id = v.user_id WHERE e.event_type = 'purchase' AND e.ts > v.v_ts GROUP BY e.user_id) " +
        "SELECT (SELECT count(*) FROM s) AS n_signup, (SELECT count(*) FROM v) AS n_view_after, (SELECT count(*) FROM p) AS n_purchase_after"),
    "event_retention" ->
      ("WITH d AS (SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events), " +
        "c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY user_id) " +
        "SELECT cohort, count(DISTINCT c.user_id) AS n_users, " +
        "count(DISTINCT CASE WHEN d.day = c.cohort + INTERVAL 1 DAY THEN c.user_id END) AS n_d1, " +
        "count(DISTINCT CASE WHEN d.day = c.cohort + INTERVAL 7 DAY THEN c.user_id END) AS n_d7 " +
        "FROM c JOIN d ON c.user_id = d.user_id GROUP BY cohort ORDER BY cohort"),
    "event_transitions" ->
      ("WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events), " +
        "t AS (SELECT event_type, lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type FROM e) " +
        "SELECT event_type, next_type, count(*) AS cnt FROM t WHERE next_type IS NOT NULL " +
        "GROUP BY 1, 2 ORDER BY cnt DESC, event_type, next_type"),
  )
}
