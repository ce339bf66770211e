package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.BloomBridge
import graft.Tables

/** Round-5 scale operators: explicit bloom-filter join pre-filtering (the
  * manual form of Catalyst's runtime-filter injection), a shuffled-hash
  * join exercise, key-skew diagnostics, deterministic weighted sampling
  * (A-ES), and SCD Type-2 history construction from an event stream.
  *
  * Each is the kind of pass a 100 TB warehouse/pipeline runs daily; all
  * five are fully DuckDB-oracle-graded.
  */
object AdvancedOps {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // ---------------------------------------------------------------- bloom

  /** Bloom-prefiltered fact⋈dim join. The selective dim side (URGENT
    * orders, ~20%) is aggregated into Spark's own serialized bloom sketch
    * (BloomFilterAggregate — the exact expression InjectRuntimeFilter
    * plants on 10 GB+ scans), and the probe lands on the lineitem scan as
    * a codegen'd `might_contain` predicate BEFORE the shuffle, so only
    * surviving fact rows pay exchange + join cost. False positives are
    * resolved by the exact join downstream; false negatives are
    * impossible — the result is bit-identical to the plain join, which is
    * what the oracle checks.
    *
    * The driver-side `head` holds only the sketch (metadata-scale — a few
    * KB here, ~5 MB at 4M dim keys; the same payload the injected rule
    * ships via a subquery broadcast); the fact table never leaves the
    * executors. At 100 TB this is THE shuffle-reducer for selective dim
    * filters: a megabyte-scale broadcast vs shuffling the ~80% of fact
    * rows the join would discard anyway. */
  def joinBloomPrefilter(s: SparkSession, d: String): DataFrame = {
    val dim = t(s, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    // Size the sketch from the ACTUAL creation-side cardinality (the same
    // thing Catalyst's injection rule reads from plan stats): ~10 bits per
    // key ≈ 1% fpp, floored at 64 Kbit, capped at Spark's 8 MB maxNumBits.
    // A fixed 4 MB filter would cost 32 partial 4 MB buffers + their merge
    // on a 30 K-key dim — sizing tracks the input at any scale factor.
    val nDim = dim.count()
    val bits = math.min(math.max(nDim * 10L, 65536L), 67108864L)
    val bytes = dim
      .agg(BloomBridge.bloomFilterAgg(col("o_orderkey"), math.max(nDim, 1L), bits).as("bf"))
      .head().getAs[Array[Byte]](0)
    t(s, d, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .filter(BloomBridge.mightContain(bytes, col("l_orderkey")))
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  // ----------------------------------------------------- shuffled hash join

  /** Shuffled-hash join, hint-forced. At fixture scale `part` would
    * broadcast; at 100 TB both sides of a fact⋈fact join exceed the
    * broadcast budget and the planner's default SMJ pays a full sort of
    * BOTH shuffled sides. SHUFFLE_HASH skips the sorts by hashing the
    * smaller side per partition — the right call whenever the build side's
    * per-partition slice fits executor memory (here: part/32 partitions).
    * Plan-asserted as ShuffledHashJoin in AdvancedOpsSpec. */
  def joinShuffleHash(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select("l_partkey", "l_extendedprice")
      .join(t(s, d, "part").select("p_partkey", "p_brand").hint("shuffle_hash"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("revenue"))
      .orderBy("p_brand")

  // ------------------------------------------------------------ skew report

  /** Key-skew diagnostic over the fact table's supplier key: per-key
    * volume, share of total, and ratio to the uniform expectation — the
    * report that decides WHICH keys need salting before the big join.
    * One groupBy pass + a 1-row global rollup broadcast back over the
    * per-key frame (BNL with a single-row build side — allowlisted);
    * top-15 via TakeOrderedAndProject, never a full result sort. */
  def statSkewReport(s: SparkSession, d: String): DataFrame = {
    val per = t(s, d, "lineitem").groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
    val tot = per.agg(sum("cnt").as("total"), count(lit(1)).as("n_keys"))
    // floor(x*1e4+0.5)/1e4 instead of round(,4): ratios of integers can
    // land exactly on the .00005 boundary where engines' round() diverge
    def r4(c: Column) = floor(c * 10000.0 + 0.5) / 10000.0
    per.join(broadcast(tot))
      .select(col("l_suppkey"), col("cnt"),
        r4(col("cnt") * 100.0 / col("total")).as("share_pct"),
        r4(col("cnt") * col("n_keys") / col("total").cast("double")).as("x_avg"))
      .orderBy(col("cnt").desc, col("l_suppkey"))
      .limit(15)
  }

  // ------------------------------------------------------- weighted sample

  /** Deterministic weighted sampling without replacement (Efraimidis–
    * Spirakis A-ES): each document draws u ∈ (0,1) from the md5 of its id
    * (cross-engine-identical 60-bit prefix), and the k largest u^(1/w) win
    * — equivalently the k largest ln(u)/w, which avoids pow's cross-engine
    * edge cases. Weight = n_chars, so long documents are proportionally
    * favored, the standard token-budget-aware corpus draw.
    *
    * Scale shape: one row-local projection + TakeOrderedAndProject (a
    * per-partition k-heap, no global sort) — map-width at 100 TB. Being
    * hash-seeded rather than RNG-seeded, the draw is reproducible across
    * engines, retries, and partitionings — what makes a 100 TB sampling
    * job auditable. */
  def llmWeightedSample(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), col("n_chars"),
        round(
          log(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("double") / 1152921504606846976.0d) / col("n_chars"),
          8).as("skey"))
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(20)

  // ------------------------------------------------------------ SCD type 2

  /** SCD Type-2 history build from the event stream: collapse each user's
    * event sequence to its state-CHANGE rows, then stitch validity
    * intervals (valid_from = change time, valid_to = next change, open
    * interval = current state). This is the standard "change feed →
    * versioned dimension" pass of every warehouse load.
    *
    * Both windows partition by user_id, so the single shuffle on user_id
    * is reused across the lag pass, the filter, and the lead pass — one
    * exchange total. Ordering is (µs-truncated ts, event_id) on BOTH
    * engines: the oracle must ORDER BY CAST(ts AS TIMESTAMP) — not the raw
    * ns value — or sub-µs ordering could disagree with Spark's µs ticks. */
  def scd2Build(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(s, d, "events")
      .select("user_id", "event_type", "ts", "event_id")
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead("ts", 1).over(w))
      // event_id rides along as lineage AND the deterministic final-order
      // tiebreak (two state changes can share a µs-truncated valid_from)
      .select(col("user_id"), col("event_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  // ------------------------------------------------------ incremental rollup

  /** Incremental aggregation: the daily-ETL shape where yesterday's
    * rollup is NOT recomputed — the new partition's partial aggregate is
    * merged into the stored partial states (count and sum are algebraic:
    * merge = sum of partials). Graded against a full recompute in DuckDB,
    * which is exactly the invariant an incremental pipeline must hold.
    * At 100 TB the recompute touches the whole fact history; the merge
    * touches one day + a rollup the size of the group cardinality. */
  def aggIncrementalRollup(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        col("o_orderdate"), col("o_totalprice"))
    def partial(df: DataFrame) = df.groupBy("ym")
      .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("sv"))
    // mid-month cutoff ON PURPOSE: 1997-01's key exists in BOTH partials,
    // so the merge path (sum of partial states for one key) is exercised,
    // not just concatenation of disjoint key sets
    val stored = partial(o.filter(col("o_orderdate") < "1997-01-15"))
    val delta = partial(o.filter(col("o_orderdate") >= "1997-01-15"))
    stored.union(delta)
      .groupBy("ym")
      .agg(sum("cnt").as("cnt"), round(sum("sv"), 2).as("total"))
      .orderBy("ym")
  }

  // ----------------------------------------------------------- MAD outliers

  /** Robust outlier detection: per-group median + median-absolute-
    * deviation, then count the rows above med + 2·MAD (TPC-H's uniform totalprice has thin tails: 3·MAD clears the max and grades an empty frame). Median is the
    * exact interpolated percentile on BOTH engines (Spark `median` ≡
    * DuckDB `median` on doubles), so the gate is cross-engine
    * deterministic. Shape: two keyed aggregations with the tiny
    * per-group stats broadcast back over the fact — the fact shuffles
    * at most once (for the group-medians; the deviation and gate passes
    * are map-side against broadcasts). */
  def statOutlierMad(s: SparkSession, d: String): DataFrame = {
    def r2(c: Column) = floor(c * 100.0 + 0.5) / 100.0
    val o = t(s, d, "orders").select("o_orderpriority", "o_totalprice")
    val med = o.groupBy("o_orderpriority").agg(median(col("o_totalprice")).as("med"))
    val mad = o.join(broadcast(med), "o_orderpriority")
      .groupBy("o_orderpriority")
      .agg(max("med").as("med"),
        median(abs(col("o_totalprice") - col("med"))).as("mad"))
    o.join(broadcast(mad), "o_orderpriority")
      .filter(col("o_totalprice") > col("med") + col("mad") * 2.0)
      .groupBy("o_orderpriority")
      .agg(max(r2(col("med"))).as("med"), max(r2(col("mad"))).as("mad"),
        count(lit(1)).as("n_outliers"))
      .orderBy("o_orderpriority")
  }

  // --------------------------------------------------------- pareto frontier

  /** Skyline (pareto frontier) over part price/size: the points where no
    * other part is both cheaper AND at-least-as-large (strict in one
    * dimension) — the standard multi-objective shortlist query. Computed
    * in three scalable passes, never a pairwise dominance join:
    *   1. collapse to one candidate per price (groupBy price → max size):
    *      any point below its price's max is dominated at equal price;
    *   2. LOCAL skyline per hash bucket (window: running max of size over
    *      price-ascending rows). Skylines are distributive over ANY
    *      partition of the data — a point dominated inside its bucket is
    *      dominated globally — so this pass only discards, never loses a
    *      frontier point, and each bucket's window is independent;
    *   3. GLOBAL skyline over the survivors. For uniform-random data the
    *      expected frontier is O(log n) points, so pass 3 works on a
    *      metadata-sized set; the heavy lifting happened bucket-parallel
    *      in pass 2. Rather than a single-partition window (which logs
    *      the WindowExec no-partition warning on every run), pass 3 is a
    *      2-phase collect_list aggregation + a pairwise dominance filter
    *      lambda over the bounded array: p survives iff no q is cheaper
    *      with size >= p.size — equivalent to "size strictly above the
    *      running max over lower prices" because prices are unique after
    *      pass 1. O(frontier²) work on O(log n) elements, zero extra
    *      shuffles. At 100 TB passes 1-2 are one hash shuffle + one
    *      bucket-partitioned window; pass 3 is driver-scale either way.
    * Survival rule everywhere: size strictly greater than the running max
    * over strictly-lower prices (prices unique after pass 1). */
  def paretoFrontier(s: SparkSession, d: String): DataFrame = {
    val pts = t(s, d, "part")
      .groupBy(col("p_retailprice").as("price"))
      .agg(max("p_size").as("size"))
    val wLocal = Window.partitionBy("b").orderBy("price")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = pts.withColumn("b", pmod(hash(col("price")), lit(32)))
      .withColumn("runmax", max("size").over(wLocal))
      .filter(col("runmax").isNull || col("size") > col("runmax"))
      .drop("b", "runmax")
    local.agg(collect_list(struct(col("price"), col("size"))).as("pts"))
      .select(explode(expr(
        "filter(pts, p -> NOT exists(pts, q -> q.price < p.price AND q.size >= p.size))"))
        .as("pt"))
      .select(col("pt.price").as("price"), col("pt.size").as("size"))
      .orderBy("price")
  }

  // ------------------------------------------------------- rolling regression

  /** Rolling least-squares trend per customer: the slope of totalprice
    * vs order date over each customer's last 5 orders — the per-entity
    * trend detector behind spend-trajectory features. The closed form
    * (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) needs only window SUMS over one
    * frame, so all five statistics ride a single shuffle on o_custkey
    * and one sort — no self-join, no UDAF state. x is days since a fixed
    * epoch (small magnitudes keep the cancellation in the denominator
    * far above double noise). Degenerate frames (n=1, or all orders the
    * same day → zero variance) yield NULL, not a division blow-up. */
  def winRollingSlope(s: SparkSession, d: String): DataFrame = {
    // DETERMINISM: the frame's sums are folded SEQUENTIALLY over
    // collected lists instead of using windowed sum() — Spark's sliding
    // ROWS sum maintains add/remove running state while DuckDB windows
    // aggregate through a segment tree, so the two engines associate the
    // same doubles differently. The slope formula's cancellation
    // (n·sxy − sx·sy over ~1e9-magnitude sums) amplifies that last-ulp
    // gap, and at sf0.1 one row's pre-rounded value landed exactly on a
    // .xxx5 boundary (spark 664.8997 vs duck 664.8996). Folding
    // left-to-right over the same values in the same frame order is
    // bit-identical on both engines at any scale; the frame is 5 rows,
    // so the per-row lambda fold is O(5).
    val w = Window.partitionBy("o_custkey").orderBy("x", "o_orderkey")
      .rowsBetween(-4, 0)
    val o = t(s, d, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      datediff(col("o_orderdate"), lit("1992-01-01")).cast("double").as("x"),
      col("o_totalprice").as("y"))
      .withColumn("xy", col("x") * col("y"))
      .withColumn("xx", col("x") * col("x"))
    def fold(c: String) = expr(s"aggregate($c, 0D, (a, e) -> a + e)")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    o.withColumn("xs", collect_list("x").over(w))
      .withColumn("ys", collect_list("y").over(w))
      .withColumn("xys", collect_list("xy").over(w))
      .withColumn("xxs", collect_list("xx").over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        size(col("xs")).cast("double").as("n"),
        fold("xs").as("sx"), fold("ys").as("sy"),
        fold("xys").as("sxy"), fold("xxs").as("sxx"))
      .select(col("o_custkey"), col("o_orderkey"),
        // sign(v)*floor(|v|*1e4 + 0.5)/1e4, NOT round(v, 4): with
        // bit-identical inputs the engines' round() still split on
        // boundary values — Spark rounds the SHORTEST DECIMAL repr
        // (BigDecimal.valueOf: "…65" → up) while DuckDB rounds the
        // binary value ("…64999…" → down). The floor form is pure IEEE
        // arithmetic, identical by construction; the sign/abs wrap makes
        // it round half AWAY FROM ZERO for negative slopes, matching the
        // HALF_UP convention every other rounded column in the engine
        // uses (a bare floor(v*1e4+0.5) would pull -0.00005 up to 0).
        // trailing +0.0 normalizes IEEE -0.0 (Java signum(-0.0) = -0.0,
        // DuckDB sign(-0.0) = 0) so both engines emit +0.0
        when(col("n") > 1.0 && den =!= 0.0, {
          val v = (col("n") * col("sxy") - col("sx") * col("sy")) / den
          signum(v) * (floor(abs(v) * 10000.0 + 0.5) / 10000.0) + 0.0
        }).as("slope"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // ------------------------------------------------------------- chi-square

  /** Chi-square test of independence for lang × source on documents —
    * the categorical-drift check a corpus pipeline runs between crawl
    * snapshots. Observed cell counts come from ONE groupBy over the
    * fact; marginals and the grand total are re-aggregations of that
    * (tiny) contingency table, broadcast back over the FULL dim grid —
    * built row-marginal × col-marginal so zero-observed cells still
    * contribute their (0−e)²/e term, which a join on observed cells
    * alone would silently drop. Everything after the first groupBy is
    * metadata-scale regardless of corpus size. */
  /** The (o, e) contingency cells with marginal metadata — ONE grid
    * under both the χ² statistic and its Cramér's-V effect size, so a
    * marginal/zero-cell change can never reach only one of them. */
  private def chisqCells(s: SparkSession, d: String): DataFrame = {
    val obs = t(s, d, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).cast("double").as("o"))
    val rows = obs.groupBy("lang").agg(sum("o").as("rt"))
    val cols = obs.groupBy("source").agg(sum("o").as("ct"))
    val tot = obs.agg(sum("o").as("n"),
      countDistinct("lang").as("r"), countDistinct("source").as("c"))
    rows.crossJoin(broadcast(cols))
      .join(obs, Seq("lang", "source"), "left")
      .na.fill(0.0, Seq("o"))
      .crossJoin(broadcast(tot))
      .select((col("rt") * col("ct") / col("n")).as("e"), col("o"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        col("n"), col("r"), col("c"))
  }

  def statChiSquare(s: SparkSession, d: String): DataFrame =
    chisqCells(s, d).groupBy("dof")
      .agg(round(sum((col("o") - col("e")) * (col("o") - col("e")) / col("e")), 6).as("chi2"))
      .select(col("chi2"), col("dof").cast("long").as("dof"))

  /** Cramér's V — the [0,1] EFFECT SIZE the χ² statistic lacks (χ²
    * grows with n; V = sqrt(χ²/(n·min(r−1,c−1))) answers "how strongly
    * associated", comparable across corpus sizes). Shares [[chisqCells]]
    * verbatim; the unrounded cell sum feeds the sqrt and only the final
    * values round (6 dp), the stat_chisq precedent for the ~1e-13
    * summation-order noise a 5×4 grid can carry. */
  def statCramersV(s: SparkSession, d: String): DataFrame =
    chisqCells(s, d).groupBy("dof", "n", "r", "c")
      .agg(sum((col("o") - col("e")) * (col("o") - col("e")) / col("e")).as("chi2raw"))
      .select(round(col("chi2raw"), 6).as("chi2"),
        col("dof").cast("long").as("dof"),
        col("n").cast("long").as("n"),
        // degenerate 1×k grid: min(r−1,c−1)=0 → V is undefined; report
        // 0.0 (no measurable association) instead of Inf/ANSI error —
        // the same graceful degradation statChiSquare has (chi2=0, dof=0)
        when(least(col("r") - 1, col("c") - 1) === 0, lit(0.0))
          .otherwise(floor(sqrt(col("chi2raw") /
            (col("n") * least(col("r") - 1, col("c") - 1).cast("double"))) * 1000000.0 + 0.5)
            / 1000000.0).as("cramers_v"))

  // ---------------------------------------------------------------- KS test

  /** Two-sample Kolmogorov–Smirnov statistic between the purchase-value
    * and click-value distributions — the numeric-drift twin of the
    * chi-square categorical check (the pair a pipeline runs between
    * crawl/feed snapshots). The statistic is computed EXACTLY in
    * integers: D = max_x |F_a(x) − F_b(x)| = max |cumA·nb − cumB·na| /
    * (na·nb), so the graded columns are the integer numerator and
    * counts; only the final display ratio rounds (floor half-up, 6 dp —
    * values are ≥ 0). No per-row float comparison can drift cross-engine.
    *
    * Scale: one hash aggregation collapses the corpus to the VALUE
    * DOMAIN (2-dp readings — bounded, the agg_count_min posture), and
    * the cumulative window runs over that domain table, not the corpus;
    * the single-partition window is domain-sized by construction. */
  def statKsTest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = t(s, d, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .groupBy("value")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("ca"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("cb"))
    val wCum = Window.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("cuma", sum("ca").over(wCum))
      .withColumn("cumb", sum("cb").over(wCum))
      .withColumn("na", sum("ca").over(wAll))
      .withColumn("nb", sum("cb").over(wAll))
      .groupBy("na", "nb")
      // products in DECIMAL: cum·n is n²-scale and wraps int64 silently
      // past ~3e9 rows/side (the m2 discipline); d_num keeps its BIGINT
      // schema through an explicit gate
      .agg(max(abs(col("cuma").cast("decimal(19,0)") * col("nb").cast("decimal(19,0)") -
        col("cumb").cast("decimal(19,0)") * col("na").cast("decimal(19,0)"))).as("dn"))
      .select(col("na"), col("nb"), col("dn").cast("long").as("d_num"),
        (floor(col("dn").cast("double") /
          (col("na").cast("decimal(19,0)") * col("nb").cast("decimal(19,0)")).cast("double")
          * 1e6 + 0.5) / 1e6).as("d_stat"))
  }

  /** Two-sample Mann–Whitney U (Wilcoxon rank-sum) on the same
    * purchase-vs-click value pair the KS key tests — KS asks "do the
    * distributions differ anywhere", U asks "does one stochastically
    * dominate". Rank arithmetic is EXACT in integers throughout: with
    * ties assigned midrank, 2·midrank = 2·cum_before + cnt + 1 is an
    * integer, so the graded statistic is u2_a = 2·U_a (BIGINT) and
    * U_a + U_b = na·nb is an exact identity the spec asserts. The
    * normal-approximation z rides along as the one rounded float
    * (inputs exact, IEEE sqrt correctly rounded, sign-aware floor
    * half-up 6 dp — the win_rolling_slope convention). Same
    * value-domain-bounded aggregation + domain-sized window as the KS
    * key. */
  def statMannWhitney(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = t(s, d, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .groupBy("value")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("ca"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("cb"))
    val wCum = Window.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("cnt", col("ca") + col("cb"))
      .withColumn("cumBefore", sum("cnt").over(wCum) - col("cnt"))
      .withColumn("na", sum("ca").over(wAll))
      .withColumn("nb", sum("cb").over(wAll))
      // Σ ca·(2·cum_before + cnt + 1) = 2·R_a (twice the rank sum)
      .groupBy("na", "nb")
      // rank products in DECIMAL: ca·(2·cum+cnt+1) is 2n²-scale and
      // wraps int64 silently past ~2e9 rows (the m2 discipline); u2_a
      // keeps its BIGINT schema through an explicit gate
      .agg(sum(col("ca").cast("decimal(19,0)") *
        (lit(2L) * col("cumBefore") + col("cnt") + 1L).cast("decimal(19,0)")).as("r2a"))
      .select(col("na"), col("nb"),
        (col("r2a") - col("na").cast("decimal(19,0)") *
          (col("na") + 1L).cast("decimal(19,0)")).cast("long").as("u2_a"))
      .select(col("na"), col("nb"), col("u2_a"), {
        val z = (col("u2_a").cast("double") / lit(2.0) -
          col("na").cast("double") * col("nb").cast("double") / lit(2.0)) /
          sqrt(col("na").cast("double") * col("nb").cast("double") *
            (col("na").cast("double") + col("nb").cast("double") + lit(1.0)) / lit(12.0))
        (signum(z) * (floor(abs(z) * 1000000.0 + 0.5) / 1000000.0) + lit(0.0)).as("z")
      })
  }

  /** Welch's unequal-variance t-test on the same purchase-vs-click value
    * pair — the parametric member of the drift trilogy (KS: any
    * difference; U: stochastic dominance; t: difference of means). The
    * fixture's 2-dp readings quantize to integer CENTS via
    * floor(v·100+0.5) on both engines, so BOTH moments (Σc, Σc²) are
    * EXACT BIGINT sums — immune to float summation order at any
    * parallelism, the trick that makes a mean-based test deterministic
    * where naive sum(double) is not. Everything after the moments is a
    * fixed mirrored IEEE expression over exact integers: sample
    * variance via the (Σc² − (Σc)²/n)/(n−1) form, t, and the
    * Welch–Satterthwaite df, each rounded sign-aware half-up at the
    * end. Scale: one hash aggregation over the corpus (map-side
    * partials), a 2-row pivot, one row out — no window, no sort. */
  def statTtestWelch(s: SparkSession, d: String): DataFrame = {
    val cents = floor(col("value") * 100.0 + 0.5).cast("long")
    val m = t(s, d, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents).as("s1"),
        // operand-first decimal: cents² wraps int64 past ~3e9 cents
        sum(cents.cast("decimal(19,0)") * cents.cast("decimal(19,0)")).as("s2"))
    // two one-row sides pivoted into one row: a conditional-aggregate
    // pivot over the 2-row frame, never a join
    val p = m.agg(
      sum(when(col("event_type") === "purchase", col("n"))).as("na"),
      sum(when(col("event_type") === "purchase", col("s1"))).as("sa1"),
      sum(when(col("event_type") === "purchase", col("s2"))).as("sa2"),
      sum(when(col("event_type") === "click", col("n"))).as("nb"),
      sum(when(col("event_type") === "click", col("s1"))).as("sb1"),
      sum(when(col("event_type") === "click", col("s2"))).as("sb2"))
    def dbl(c: String) = col(c).cast("double")
    val va = (dbl("sa2") - dbl("sa1") * dbl("sa1") / dbl("na")) / (dbl("na") - 1.0)
    val vb = (dbl("sb2") - dbl("sb1") * dbl("sb1") / dbl("nb")) / (dbl("nb") - 1.0)
    val se2 = va / dbl("na") + vb / dbl("nb")
    val tStat = (dbl("sa1") / dbl("na") - dbl("sb1") / dbl("nb")) / sqrt(se2)
    val dfW = se2 * se2 /
      ((va / dbl("na")) * (va / dbl("na")) / (dbl("na") - 1.0) +
        (vb / dbl("nb")) * (vb / dbl("nb")) / (dbl("nb") - 1.0))
    def r6(c: org.apache.spark.sql.Column) =
      signum(c) * (floor(abs(c) * 1000000.0 + 0.5) / 1000000.0) + lit(0.0)
    p.select(col("na"), col("nb"),
      // means in CENTS (exact integers divided once, rounded 4 dp)
      (floor(dbl("sa1") / dbl("na") * 10000.0 + 0.5) / 10000.0).as("mean_a_cents"),
      (floor(dbl("sb1") / dbl("nb") * 10000.0 + 0.5) / 10000.0).as("mean_b_cents"),
      r6(tStat).as("t_stat"), r6(dfW).as("df"))
  }

  // -------------------------------------------------------------------- PSI

  /** Population Stability Index between the first- and second-half
    * purchase-value distributions — the production drift GAUGE next to
    * the hypothesis-test trilogy (KS/U/t answer "did it drift?"; PSI
    * answers "by how much, and in which value band", against the
    * industry 0.1/0.25 action thresholds). Fixed-width 25-unit bins
    * capped at bin 19 (range-complete for the fixture's value domain;
    * fixed edges, not quantiles, so binning is a pure map needing no
    * cutoff pass at any scale), add-one smoothing over the full 20-bin
    * spine so every log is finite even for empty bins.
    *
    * Determinism: each bin's (p−q) and ln(p/q) are built from EXACT
    * integer counts — (p−q) as the integer cross-product difference over
    * the common denominator, ln of a single exact-integer-ratio double —
    * and each rounds to millionths (BIGINT) BEFORE their product, so the
    * per-bin contribution `psi12` (units 1e-12) and the total are exact
    * integer arithmetic, immune to summation order (the perplexity-
    * family discipline). Every term is ≥ 0 by Gibbs' inequality — the
    * spec's invariant.
    *
    * Scale: one hash aggregation collapses the corpus to the 20-bin
    * domain (map-side partials); the spine join and both windows run on
    * 20 rows. The corpus shuffles once, at bin granularity. */
  def statPsi(s: SparkSession, d: String): DataFrame = {
    val split = lit("2024-01-16 00:00:00").cast("timestamp")
    val agg = t(s, d, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(least(floor(col("value") / 25.0), lit(19.0)).cast("long").as("bin"))
      .agg(sum(when(col("ts") < split, 1L).otherwise(0L)).as("nb0"),
        sum(when(col("ts") < split, 0L).otherwise(1L)).as("nc0"))
    val spine = s.range(0, 20).select(col("id").as("bin"))
    val wAll = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def flr6(c: Column) = (signum(c) * floor(abs(c) * 1000000.0 + 0.5)).cast("long")
    spine.join(agg, Seq("bin"), "left")
      .na.fill(0L, Seq("nb0", "nc0"))
      .withColumn("tb", sum("nb0").over(wAll) + 20L)
      .withColumn("tc", sum("nc0").over(wAll) + 20L)
      // cross-products in DECIMAL(38,0): past ~3e9 rows per half the
      // int64 products (nb0+1)*tc and tb*tc wrap silently while DuckDB's
      // HUGEINT does not — the agg_regression_multi discipline
      .withColumn("xp", (col("nb0") + 1L).cast("decimal(19,0)") * col("tc").cast("decimal(19,0)"))
      .withColumn("xq", (col("nc0") + 1L).cast("decimal(19,0)") * col("tb").cast("decimal(19,0)"))
      .select(col("bin"), col("nb0").as("n_base"), col("nc0").as("n_cur"),
        (flr6((col("xp") - col("xq")).cast("double") /
            (col("tb").cast("decimal(19,0)") * col("tc").cast("decimal(19,0)")).cast("double")) *
          flr6(log(col("xp").cast("double") / col("xq").cast("double")))).as("psi12"))
      .withColumn("psi_total", sum("psi12").over(wAll).cast("double") / 1e12)
      .orderBy("bin")
  }

  // ------------------------------------------------------------ ANOVA F

  /** One-way ANOVA F across day-of-week groups on purchase cents — the
    * k-group generalization closing the test family (Welch: 2 means; U:
    * 2 distributions; this: k means at once, "does weekday matter?").
    * Group moments are exact integers (cents; Σc² in DECIMAL(38,0) /
    * HUGEINT); the 7 per-group s²/n terms reduce through an ORDERED fold
    * (sort_array→aggregate vs list(ORDER BY)→list_reduce — the
    * win_rolling_slope discipline), so no float summation-order reaches
    * the statistic at any parallelism. Day-of-week is epoch-day mod 7 —
    * pure integer, immune to the engines' dayofweek() origin mismatch.
    * Scale: one corpus aggregation to 7 group rows; everything after is
    * constant-size. */
  def statAnovaF(s: SparkSession, d: String): DataFrame = {
    val cents = floor(col("value") * 100.0 + 0.5).cast("long")
    val g = t(s, d, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(pmod(datediff(to_date(col("ts")), lit("1970-01-01").cast("date")),
        lit(7)).as("dow"))
      .agg(count(lit(1)).as("n"), sum(cents).as("sc"),
        // operands cast BEFORE the multiply: cents*cents would wrap int64
        // silently past ~3e9 cents (the m2 discipline)
        sum(cents.cast("decimal(19,0)") * cents.cast("decimal(19,0)")).as("q"))
      .withColumn("s2n",
        col("sc").cast("double") * col("sc").cast("double") / col("n").cast("double"))
    val one = g.agg(count(lit(1)).as("k"),
      sum("n").as("nn"), sum("sc").as("tt"), sum("q").cast("double").as("qq"),
      aggregate(sort_array(collect_list(struct(col("dow"), col("s2n")))),
        lit(0.0), (acc, e) => acc + e.getField("s2n")).as("sbsum"))
    def db(c: String) = col(c).cast("double")
    val ssb = col("sbsum") - db("tt") * db("tt") / db("nn")
    val ssw = col("qq") - col("sbsum")
    val f = (ssb / (db("k") - 1.0)) / (ssw / (db("nn") - db("k")))
    val eta2 = ssb / (ssb + ssw)
    def r6(c: Column) = signum(c) * (floor(abs(c) * 1000000.0 + 0.5) / 1000000.0) + lit(0.0)
    one.select(col("k"), col("nn").as("n"), r6(f).as("f_stat"), r6(eta2).as("eta2"))
  }

  // ------------------------------------------------------------- Benford

  /** Benford's-law audit of order totals — the fraud/data-entry screen
    * every financial pipeline runs: the observed first-significant-digit
    * distribution against log₁₀(1+1/d), with per-digit χ² contributions.
    * The digit comes from the INTEGER STRING of floor(price) (values ≥ 1
    * here), never from log10 — a log-based extraction can flip at exact
    * powers of ten on a sub-ulp libm difference; string heads cannot.
    * Expected shares are shared decimal literals both engines parse to
    * identical doubles. One hash aggregation to 9 digit rows. */
  def statBenford(s: SparkSession, d: String): DataFrame = {
    val benford = Seq(0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
      0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
      0.05799194697768673, 0.05115252244738129, 0.04575749056067514)
    val pLit = typedlit(benford)
    val obs = t(s, d, "orders")
      // explicit domain: totals in (0,1) would yield digit 0 (counted in
      // N by Spark but dropped by the oracle's digit join) and negatives
      // would '-'-head — guard the contract instead of commenting it
      .filter(col("o_totalprice") >= 1.0)
      .groupBy(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .agg(count(lit(1)).as("observed"))
    val wAll = Window.orderBy("digit")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    obs
      .withColumn("n", sum("observed").over(wAll))
      .withColumn("e", get(pLit, col("digit") - 1) * col("n").cast("double"))
      .select(col("digit"), col("observed"),
        (floor(col("observed").cast("double") / col("n").cast("double") * 10000.0 + 0.5)
          / 10000.0).as("obs_share"),
        (floor(get(pLit, col("digit") - 1) * 10000.0 + 0.5) / 10000.0).as("benford_share"),
        (floor((col("observed").cast("double") - col("e")) *
          (col("observed").cast("double") - col("e")) / col("e") * 1000000.0 + 0.5)
          / 1000000.0).as("chi2_contrib"))
      .orderBy("digit")
  }

  // ---------------------------------------------------- Poisson bootstrap

  /** Poisson bootstrap of the mean purchase value — THE way to bootstrap
    * a dataset too large to resample (Chamandy et al., Google 2012;
    * Owen & Eckles 2012): instead of drawing n rows with replacement per
    * replicate (a shuffle per replicate), every row independently
    * contributes Poisson(1) copies to each of B=32 replicates. One
    * map-side fan-out (×B) and ONE B-key aggregation replace B resample
    * passes; the replicate-mean spread IS the sampling distribution of
    * the estimator.
    *
    * Determinism: the Poisson draw is an inverse-CDF lookup on a
    * portable md5-derived uniform (exact 60-bit integer / 2⁶⁰, the
    * llm_sample_split hash-coin), against hard-coded CDF literals both
    * engines parse to identical doubles; weights and cent-values are
    * exact integers, so each replicate's (Σw, Σw·x) is summation-order-
    * free and the one division rounds half-up 4 dp. */
  def statBootstrapCi(s: SparkSession, d: String): DataFrame = {
    val rows = t(s, d, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), floor(col("value") * 100.0 + 0.5).cast("long").as("c"))
      .select(col("event_id"), col("c"),
        explode(sequence(lit(0), lit(31))).as("b"))
    val h = conv(substring(md5(concat(col("event_id").cast("string"), lit(":"),
      col("b").cast("string")).cast("binary")), 1, 15), 16, 10).cast("long")
    val u = h.cast("double") / lit(1.152921504606846976e18) // exact 2^60
    // Poisson(1) CDF: P(X ≤ k) = e⁻¹·Σ_{i≤k} 1/i!, capped at 7
    val wgt = when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238462, 3L)
      .when(u < 0.9963401531726563, 4L)
      .when(u < 0.9994058151824183, 5L)
      .when(u < 0.9998407620127588, 6L)
      .otherwise(7L)
    rows.withColumn("w", wgt)
      .groupBy("b")
      .agg(sum("w").as("n_eff"), sum(col("w") * col("c")).as("swx"))
      .select(col("b"), col("n_eff"),
        (floor(col("swx").cast("double") / col("n_eff").cast("double") * 10000.0 + 0.5)
          / 10000.0).as("mean_cents"))
      .orderBy("b")
  }

  // --------------------------------------------------- multivariate OLS

  /** Multivariate OLS — extendedprice ~ quantity + discount with
    * intercept, per return flag — the 3-unknown normal-equation solve
    * Spark's regr_* family (one regressor, [[aggRegression]]) cannot
    * express. X'X / X'y are EXACT integer moment sums (price quantized
    * to cents, discount to integer percent via floor(v·100+0.5); Σy² in
    * DECIMAL(38,0) / HUGEINT since 2e19 overflows int64), so the only
    * float arithmetic is the fixed Cramer's-rule expression tree over
    * exact-integer-valued doubles, mirrored character-for-character in
    * the oracle — bit-identical at any parallelism (the Welch-key
    * discipline scaled up from 1 unknown to 3). R² comes from the same
    * moments (SSE = Σy² − b·X'y), no second data pass.
    *
    * Scale: ONE map-side-partial hash aggregation over the corpus into
    * 3 moment rows; the solve is a per-row projection. This is the
    * textbook distributed-OLS shape — sufficient statistics, not data,
    * cross the network (d²/2 sums per group, d = 3 ≪ shuffle width). */
  def aggRegressionMulti(s: SparkSession, d: String): DataFrame = {
    val y = floor(col("l_extendedprice") * 100.0 + 0.5).cast("long")
    val x1 = col("l_quantity").cast("long")
    val x2 = floor(col("l_discount") * 100.0 + 0.5).cast("long")
    val m = t(s, d, "lineitem").groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(x1).as("s1"), sum(x2).as("s2"), sum(y).as("sy"),
      sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"), sum(x2 * x2).as("s22"),
      sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"),
      // operand-first decimal (y² wraps int64 past ~3e9 cents/line)
      sum(y.cast("decimal(19,0)") * y.cast("decimal(19,0)")).as("syy"))
    def db(c: String) = col(c).cast("double")
    val (n, s1, s2, sy) = (db("n"), db("s1"), db("s2"), db("sy"))
    val (s11, s12, s22) = (db("s11"), db("s12"), db("s22"))
    val (s1y, s2y, syy) = (db("s1y"), db("s2y"), db("syy"))
    // Cramer's rule on [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] b = [sy,s1y,s2y]
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val d0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val d1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val d2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    val (b0, b1, b2) = (d0 / det, d1 / det, d2 / det)
    val r2 = lit(1.0) - (syy - (b0 * sy + b1 * s1y + b2 * s2y)) /
      (syy - sy * sy / n)
    def r4(c: Column) = signum(c) * (floor(abs(c) * 10000.0 + 0.5) / 10000.0) + lit(0.0)
    def r6(c: Column) = signum(c) * (floor(abs(c) * 1000000.0 + 0.5) / 1000000.0) + lit(0.0)
    m.select(col("l_returnflag"), col("n"),
      r4(b0).as("intercept_c"), r4(b1).as("b_qty_c"), r4(b2).as("b_disc_c"),
      r6(r2).as("r2"))
      .orderBy("l_returnflag")
  }

  // ------------------------------------------------------------------ Gini

  /** Gini coefficient core over any (key, spend_c) frame: the rank-form
    * identity G = (2·Σ rᵢxᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) with x ascending —
    * every moment an exact integer. The global rank rides
    * [[ScalePrimitives.distRunning]] (parallel range sort + pinned
    * partitioner), NOT an unpartitioned window — the key grain is the
    * data grain. Σrx in DECIMAL(38,0) (rank·cents products overflow
    * int64's sum at warehouse scale — the agg_regression_multi Σy²
    * discipline; the oracle rides HUGEINT with the VARCHAR→DOUBLE
    * bridge, since DuckDB's HUGEINT→DOUBLE cast is not correctly
    * rounded). One mirrored IEEE division, sign-aware 6 dp rounding. */
  private[graft] def giniFrame(per: DataFrame, key: String, value: String): DataFrame = {
    val (ranked, n) = ScalePrimitives.distRunningWithCount(
      per, Seq(col(value), col(key)), "__rnk")
    val m = ranked.agg(
      sum(col(value)).as("sx"),
      sum((col("__rnk").cast("decimal(19,0)") *
        col(value).cast("decimal(19,0)")).cast("decimal(38,0)")).as("srx"))
    def r6(c: Column) = signum(c) * (floor(abs(c) * 1000000.0 + 0.5) / 1000000.0) + lit(0.0)
    // sx cast to decimal BEFORE the n-multiplies: Σcents·n wraps int64
    // silently in Spark past ~1e15 cents of revenue
    val sxD = col("sx").cast("decimal(19,0)")
    val num = (col("srx") * 2 - (sxD * (n + 1)).cast("decimal(38,0)")).cast("decimal(38,0)")
    val den = (sxD * n).cast("decimal(38,0)")
    m.select(lit(n).as("n_keys"), col("sx").cast("long").as("total_c"),
      r6(num.cast("double") / den.cast("double")).as("gini"))
  }

  /** Per-customer total spend in exact integer cents — the shared input
    * grain of [[statGini]] and [[statLorenz]] (one definition, so the
    * two keys can never disagree on what "spend" means). */
  private def custSpendCents(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")).as("spend_c"))

  /** stat_gini: inequality of per-customer total spend — the Lorenz-curve
    * summary every revenue-concentration dashboard carries ("do 20% of
    * customers drive 80% of revenue?"). Integer cents per order, one hash
    * aggregation to the customer grain, then [[giniFrame]]. */
  def statGini(s: SparkSession, d: String): DataFrame =
    giniFrame(custSpendCents(s, d), "ck", "spend_c")

  /** stat_lorenz: the decile table behind [[statGini]]'s scalar — "the
    * top decile holds X% of revenue", the operational form of the
    * inequality question. Customers cut into spend deciles by
    * [[ScalePrimitives.distNtile]] (the user grain is the data grain —
    * never a global ntile window), then per-decile exact integer sums.
    * The share/cumulative-share divisions are the only floats, each a
    * mirrored exact-integer ratio rounded 6 dp; the cumulative window
    * runs over exactly 10 decile rows (bounded by construction —
    * allowlisted in PlanInvariantsSpec). */
  def statLorenz(s: SparkSession, d: String): DataFrame = {
    val g = ScalePrimitives.distNtile(
        custSpendCents(s, d), 10, "decile", col("spend_c"), col("ck"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_cust"), sum("spend_c").as("spend_c"))
    val wCum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the grand total folds over the SAME 10-row decile table as a
    // broadcast single-row branch (exactly the oracle's `t AS (SELECT
    // sum(spend_c) FROM g)`) — not a separate orders scan + customer
    // aggregation whose only output is one driver scalar; both branches
    // re-read distNtile's pinned RDD, so they cannot disagree
    def shr(c: Column) =
      floor(c.cast("double") / col("__tot").cast("double") * 1000000.0 + 0.5) / 1000000.0
    g.withColumn("cum_c", sum("spend_c").over(wCum))
      .crossJoin(broadcast(g.agg(sum("spend_c").as("__tot"))))
      .select(col("decile"), col("n_cust"), col("spend_c"),
        shr(col("spend_c")).as("share"), shr(col("cum_c")).as("cum_share"))
      .orderBy("decile")
  }

  // --------------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "stat_ks_test" -> (statKsTest _),
    "stat_mannwhitney" -> (statMannWhitney _),
    "stat_ttest_welch" -> (statTtestWelch _),
    "stat_psi" -> (statPsi _),
    "stat_bootstrap_ci" -> (statBootstrapCi _),
    "stat_anova_f" -> (statAnovaF _),
    "stat_benford" -> (statBenford _),
    "agg_regression_multi" -> (aggRegressionMulti _),
    "pareto_frontier" -> (paretoFrontier _),
    "win_rolling_slope" -> (winRollingSlope _),
    "stat_chisq" -> (statChiSquare _),
    "stat_cramers_v" -> (statCramersV _),
    "join_bloom_prefilter" -> (joinBloomPrefilter _),
    "join_shuffle_hash" -> (joinShuffleHash _),
    "stat_skew_report" -> (statSkewReport _),
    "llm_weighted_sample" -> (llmWeightedSample _),
    "scd2_build" -> (scd2Build _),
    "agg_incremental_rollup" -> (aggIncrementalRollup _),
    "stat_outlier_mad" -> (statOutlierMad _),
    "stat_gini" -> (statGini _),
    "stat_lorenz" -> (statLorenz _))

  val oracles: Map[String, String] = Map(
    // exact integer moments over the rank-sorted spend vector; Σrx in
    // HUGEINT with the VARCHAR→DOUBLE bridge (HUGEINT→DOUBLE casts are
    // not correctly rounded in DuckDB); one mirrored IEEE division
    "stat_gini" ->
      ("WITH per AS (SELECT o_custkey AS ck, " +
        "CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS spend_c " +
        "FROM orders GROUP BY 1), " +
        "r AS (SELECT spend_c, CAST(row_number() OVER (ORDER BY spend_c, ck) AS BIGINT) AS rnk FROM per), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(spend_c) AS BIGINT) AS sx, " +
        "sum(CAST(rnk AS HUGEINT) * spend_c) AS srx FROM r), " +
        "g AS (SELECT n, sx, " +
        "CAST(CAST(2 * srx - CAST(n + 1 AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) / " +
        "CAST(CAST(CAST(n AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) AS gv FROM m) " +
        "SELECT n AS n_keys, sx AS total_c, " +
        "sign(gv) * floor(abs(gv) * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS gini FROM g"),
    // plain ntile mirrors distNtile bit-for-bit; shares are exact-integer
    // ratios rounded 6 dp, cumulative over the 10 decile rows
    "stat_lorenz" ->
      ("WITH per AS (SELECT o_custkey AS ck, " +
        "CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS spend_c " +
        "FROM orders GROUP BY 1), " +
        "r AS (SELECT spend_c, CAST(ntile(10) OVER (ORDER BY spend_c, ck) AS INT) AS decile FROM per), " +
        "g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_cust, " +
        "CAST(sum(spend_c) AS BIGINT) AS spend_c FROM r GROUP BY 1), " +
        "t AS (SELECT CAST(sum(spend_c) AS BIGINT) AS tot FROM g) " +
        "SELECT decile, n_cust, spend_c, " +
        "floor(CAST(spend_c AS DOUBLE) / CAST(tot AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS share, " +
        "floor(CAST(sum(spend_c) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS DOUBLE) " +
        "/ CAST(tot AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS cum_share " +
        "FROM g, t ORDER BY decile"),
    // exact integer group moments (HUGEINT Σc²); the 7 s²/n terms reduce
    // through list(ORDER BY dow) + list_reduce — the ordered-fold
    // discipline — so no float summation order exists on either engine
    "stat_anova_f" ->
      ("WITH g AS (SELECT (date_diff('day', DATE '1970-01-01', " +
        "CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))) % 7 AS dow, " +
        "CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sc, sum(CAST(c AS HUGEINT) * c) AS q " +
        "FROM (SELECT ts, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c " +
        "FROM events WHERE event_type = 'purchase') GROUP BY 1), " +
        "g2 AS (SELECT dow, n, sc, q, " +
        "CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS s2n FROM g), " +
        "one AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn, " +
        "CAST(sum(sc) AS BIGINT) AS tt, CAST(CAST(sum(q) AS VARCHAR) AS DOUBLE) AS qq, " +
        "list_reduce(list(s2n ORDER BY dow), (a, b) -> a + b) AS sbsum FROM g2), " +
        "f AS (SELECT k, nn, " +
        "(sbsum - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE)) AS ssb, " +
        "(qq - sbsum) AS ssw FROM one), " +
        "r AS (SELECT k, nn, " +
        "(ssb / (CAST(k AS DOUBLE) - 1.0)) / (ssw / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))) AS fs, " +
        "ssb / (ssb + ssw) AS eta2 FROM f) " +
        "SELECT k, nn AS n, " +
        "sign(fs) * (floor(abs(fs) * 1000000.0 + 0.5) / 1000000.0) + 0.0 AS f_stat, " +
        "sign(eta2) * (floor(abs(eta2) * 1000000.0 + 0.5) / 1000000.0) + 0.0 AS eta2 FROM r"),
    // digit from the integer STRING head (log10-free); expected shares
    // are the same decimal literals, parsed identically
    "stat_benford" ->
      ("WITH p(digit, share) AS (VALUES (1, 0.3010299956639812e0), (2, 0.17609125905568124e0), " +
        "(3, 0.12493873660829993e0), (4, 0.09691001300805642e0), (5, 0.07918124604762482e0), " +
        "(6, 0.06694678963061322e0), (7, 0.05799194697768673e0), (8, 0.05115252244738129e0), " +
        "(9, 0.04575749056067514e0)), " +
        "o AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit, " +
        "CAST(count(*) AS BIGINT) AS observed FROM orders WHERE o_totalprice >= 1.0 GROUP BY 1), " +
        "w AS (SELECT o.digit, observed, CAST(sum(observed) OVER () AS BIGINT) AS n, share " +
        "FROM o JOIN p ON p.digit = o.digit), " +
        "e AS (SELECT digit, observed, n, CAST(share AS DOUBLE) AS share, CAST(share AS DOUBLE) * CAST(n AS DOUBLE) AS exp FROM w) " +
        "SELECT digit, observed, " +
        "floor(CAST(observed AS DOUBLE) / CAST(n AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS obs_share, " +
        "floor(share * 10000.0 + 0.5) / 10000.0 AS benford_share, " +
        "floor((CAST(observed AS DOUBLE) - exp) * (CAST(observed AS DOUBLE) - exp) / exp * 1000000.0 + 0.5) " +
        "/ 1000000.0 AS chi2_contrib FROM e ORDER BY digit"),
    // md5-derived exact uniforms against literal Poisson(1) CDF cuts;
    // integer weights/cents so each replicate is summation-order-free
    "stat_bootstrap_ci" ->
      ("WITH p AS (SELECT event_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c " +
        "FROM events WHERE event_type = 'purchase'), " +
        "e AS (SELECT event_id, c, b FROM p CROSS JOIN (SELECT unnest(range(0, 32)) AS b)), " +
        "h AS (SELECT b, c, CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 15) AS BIGINT) AS hv FROM e), " +
        "u AS (SELECT b, c, CAST(hv AS DOUBLE) / 1152921504606846976.0 AS u FROM h), " +
        "w AS (SELECT b, c, CASE " +
        "WHEN u < 0.36787944117144233 THEN 0 " +
        "WHEN u < 0.7357588823428847 THEN 1 " +
        "WHEN u < 0.9196986029286058 THEN 2 " +
        "WHEN u < 0.9810118431238462 THEN 3 " +
        "WHEN u < 0.9963401531726563 THEN 4 " +
        "WHEN u < 0.9994058151824183 THEN 5 " +
        "WHEN u < 0.9998407620127588 THEN 6 ELSE 7 END AS w FROM u), " +
        "g AS (SELECT b, CAST(sum(w) AS BIGINT) AS n_eff, CAST(sum(w * c) AS BIGINT) AS swx FROM w GROUP BY b) " +
        "SELECT CAST(b AS INTEGER) AS b, n_eff, " +
        "floor(CAST(swx AS DOUBLE) / CAST(n_eff AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS mean_cents " +
        "FROM g ORDER BY b"),
    // per-bin (p−q) and ln(p/q) each from exact integer cross-products,
    // rounded to millionths (BIGINT) BEFORE the product — psi12 and its
    // total are exact integers; the ln input is one exact-int ratio
    "stat_psi" ->
      ("WITH agg AS (SELECT CAST(least(floor(value / 25.0), 19.0) AS BIGINT) AS bin, " +
        "CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS nb0, " +
        "CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END) AS BIGINT) AS nc0 " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1), " +
        "spine AS (SELECT CAST(range AS BIGINT) AS bin FROM range(0, 20)), " +
        "j AS (SELECT s.bin, coalesce(nb0, 0) AS nb0, coalesce(nc0, 0) AS nc0 " +
        "FROM spine s LEFT JOIN agg a ON s.bin = a.bin), " +
        "e AS (SELECT bin, nb0, nc0, sum(nb0) OVER () + 20 AS tb, " +
        "sum(nc0) OVER () + 20 AS tc FROM j), " +
        "x AS (SELECT bin, nb0, nc0, tb, tc, (nb0 + 1) * tc AS xp, (nc0 + 1) * tb AS xq FROM e), " +
        "r AS (SELECT bin, nb0, nc0, " +
        "CAST(CAST(xp - xq AS VARCHAR) AS DOUBLE) / CAST(CAST(tb * tc AS VARCHAR) AS DOUBLE) AS pd, " +
        "ln(CAST(CAST(xp AS VARCHAR) AS DOUBLE) / CAST(CAST(xq AS VARCHAR) AS DOUBLE)) AS lr FROM x), " +
        "terms AS (SELECT bin, nb0 AS n_base, nc0 AS n_cur, " +
        "CAST(sign(pd) * floor(abs(pd) * 1000000.0 + 0.5) AS BIGINT) * " +
        "CAST(sign(lr) * floor(abs(lr) * 1000000.0 + 0.5) AS BIGINT) AS psi12 FROM r) " +
        "SELECT bin, n_base, n_cur, psi12, " +
        "CAST(sum(psi12) OVER () AS DOUBLE) / 1e12 AS psi_total FROM terms ORDER BY bin"),
    // exact integer moments (cents / percent quantization; Σy² needs
    // int128 — HUGEINT here, DECIMAL(38,0) on the Spark side), then the
    // identical Cramer's-rule IEEE expression tree over exact doubles
    "agg_regression_multi" ->
      ("WITH q AS (SELECT l_returnflag, " +
        "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y, " +
        "CAST(l_quantity AS BIGINT) AS x1, " +
        "CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS x2 FROM lineitem), " +
        "m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2, CAST(sum(y) AS BIGINT) AS sy, " +
        "CAST(sum(x1 * x1) AS BIGINT) AS s11, CAST(sum(x1 * x2) AS BIGINT) AS s12, " +
        "CAST(sum(x2 * x2) AS BIGINT) AS s22, " +
        "CAST(sum(x1 * y) AS BIGINT) AS s1y, CAST(sum(x2 * y) AS BIGINT) AS s2y, " +
        "CAST(CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS syy FROM q GROUP BY 1), " +
        "c AS (SELECT l_returnflag, n, " +
        "CAST(n AS DOUBLE) AS dn, CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2, " +
        "CAST(sy AS DOUBLE) AS dy, CAST(s11 AS DOUBLE) AS d11, CAST(s12 AS DOUBLE) AS d12, " +
        "CAST(s22 AS DOUBLE) AS d22, CAST(s1y AS DOUBLE) AS d1y, CAST(s2y AS DOUBLE) AS d2y, syy FROM m), " +
        "k AS (SELECT l_returnflag, n, dy, d1y, d2y, syy, dn, " +
        "dn * (d11 * d22 - d12 * d12) - d1 * (d1 * d22 - d12 * d2) + d2 * (d1 * d12 - d11 * d2) AS det, " +
        "dy * (d11 * d22 - d12 * d12) - d1 * (d1y * d22 - d12 * d2y) + d2 * (d1y * d12 - d11 * d2y) AS det0, " +
        "dn * (d1y * d22 - d12 * d2y) - dy * (d1 * d22 - d12 * d2) + d2 * (d1 * d2y - d1y * d2) AS det1, " +
        "dn * (d11 * d2y - d1y * d12) - d1 * (d1 * d2y - d1y * d2) + dy * (d1 * d12 - d11 * d2) AS det2 FROM c), " +
        "b AS (SELECT l_returnflag, n, dy, d1y, d2y, syy, dn, " +
        "det0 / det AS b0, det1 / det AS b1, det2 / det AS b2 FROM k), " +
        "f AS (SELECT l_returnflag, n, b0, b1, b2, " +
        "1.0 - (syy - (b0 * dy + b1 * d1y + b2 * d2y)) / (syy - dy * dy / dn) AS r2 FROM b) " +
        "SELECT l_returnflag, n, " +
        "sign(b0) * (floor(abs(b0) * 10000.0 + 0.5) / 10000.0) + 0.0 AS intercept_c, " +
        "sign(b1) * (floor(abs(b1) * 10000.0 + 0.5) / 10000.0) + 0.0 AS b_qty_c, " +
        "sign(b2) * (floor(abs(b2) * 10000.0 + 0.5) / 10000.0) + 0.0 AS b_disc_c, " +
        "sign(r2) * (floor(abs(r2) * 1000000.0 + 0.5) / 1000000.0) + 0.0 AS r2 " +
        "FROM f ORDER BY l_returnflag"),
    // exact integer cent-moments (floor(v*100+0.5) quantization, BIGINT
    // sums), then the identical mirrored IEEE expression tree
    "stat_ttest_welch" ->
      ("WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(c) AS BIGINT) AS s1, sum(CAST(c AS HUGEINT) * c) AS s2 FROM " +
        "(SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c " +
        "FROM events WHERE event_type IN ('purchase', 'click')) GROUP BY 1), " +
        "p AS (SELECT " +
        "sum(CASE WHEN event_type = 'purchase' THEN n END) AS na, " +
        "sum(CASE WHEN event_type = 'purchase' THEN s1 END) AS sa1, " +
        "sum(CASE WHEN event_type = 'purchase' THEN s2 END) AS sa2, " +
        "sum(CASE WHEN event_type = 'click' THEN n END) AS nb, " +
        "sum(CASE WHEN event_type = 'click' THEN s1 END) AS sb1, " +
        "sum(CASE WHEN event_type = 'click' THEN s2 END) AS sb2 FROM m), " +
        "e AS (SELECT na, nb, sa1, sb1, " +
        "(CAST(CAST(sa2 AS VARCHAR) AS DOUBLE) - CAST(sa1 AS DOUBLE) * CAST(sa1 AS DOUBLE) / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0) AS va, " +
        "(CAST(CAST(sb2 AS VARCHAR) AS DOUBLE) - CAST(sb1 AS DOUBLE) * CAST(sb1 AS DOUBLE) / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0) AS vb " +
        "FROM p), " +
        "f AS (SELECT na, nb, sa1, sb1, va, vb, " +
        "va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE) AS se2 FROM e), " +
        "g AS (SELECT na, nb, " +
        "CAST(sa1 AS DOUBLE) / CAST(na AS DOUBLE) AS ma, CAST(sb1 AS DOUBLE) / CAST(nb AS DOUBLE) AS mb, " +
        "(CAST(sa1 AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sb1 AS DOUBLE) / CAST(nb AS DOUBLE)) / sqrt(se2) AS t, " +
        "se2 * se2 / ((va / CAST(na AS DOUBLE)) * (va / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0) + " +
        "(vb / CAST(nb AS DOUBLE)) * (vb / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0)) AS df FROM f) " +
        "SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb, " +
        "floor(ma * 10000.0 + 0.5) / 10000.0 AS mean_a_cents, " +
        "floor(mb * 10000.0 + 0.5) / 10000.0 AS mean_b_cents, " +
        "sign(t) * (floor(abs(t) * 1000000.0 + 0.5) / 1000000.0) + 0.0 AS t_stat, " +
        "sign(df) * (floor(abs(df) * 1000000.0 + 0.5) / 1000000.0) + 0.0 AS df FROM g"),
    // exact integer rank arithmetic (2·midrank is an integer); the z
    // expression mirrors the Spark parenthesization character-for-
    // character, sign-aware floor half-up (the rolling-slope form)
    "stat_mannwhitney" ->
      ("WITH per AS (SELECT value, " +
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS cb " +
        "FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1), " +
        "c AS (SELECT value, ca, cb, ca + cb AS cnt, " +
        "sum(ca + cb) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (ca + cb) AS cum_before, " +
        "sum(ca) OVER () AS na, sum(cb) OVER () AS nb FROM per), " +
        "g AS (SELECT na, nb, sum(ca * (2 * cum_before + cnt + 1)) AS r2a FROM c GROUP BY na, nb), " +
        "f AS (SELECT na, nb, r2a - na * (na + 1) AS u2_a FROM g), " +
        "zz AS (SELECT na, nb, u2_a, " +
        "(CAST(CAST(u2_a AS VARCHAR) AS DOUBLE) / 2.0 - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0) / " +
        "sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1.0) / 12.0) AS z FROM f) " +
        "SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb, CAST(u2_a AS BIGINT) AS u2_a, " +
        "sign(z) * (floor(abs(z) * 1000000.0 + 0.5) / 1000000.0) + 0.0 AS z FROM zz"),
    // integer KS numerator: DuckDB window sums are HUGEINT, cast back
    "stat_ks_test" ->
      ("WITH per AS (SELECT value, " +
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS cb " +
        "FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1), " +
        "c AS (SELECT value, " +
        "sum(ca) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma, " +
        "sum(cb) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb, " +
        "sum(ca) OVER () AS na, sum(cb) OVER () AS nb FROM per) " +
        "SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb, " +
        "CAST(max(abs(cuma * nb - cumb * na)) AS BIGINT) AS d_num, " +
        "floor(CAST(CAST(max(abs(cuma * nb - cumb * na)) AS VARCHAR) AS DOUBLE) / CAST(CAST(na * nb AS VARCHAR) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS d_stat " +
        "FROM c GROUP BY na, nb"),
    // the oracle is the O(n²) dominance anti-join the Spark side must
    // NEVER run — the window passes have to reproduce it exactly
    "pareto_frontier" ->
      ("WITH pts AS (SELECT p_retailprice AS price, max(p_size) AS size FROM part GROUP BY 1) " +
        "SELECT price, size FROM pts a WHERE NOT EXISTS (" +
        "SELECT 1 FROM pts b WHERE b.price < a.price AND b.size >= a.size) " +
        "ORDER BY price"),
    // list(...) OVER + list_reduce mirrors the Spark side's sequential
    // fold — windowed sum() would aggregate through DuckDB's segment
    // tree and diverge from Spark by an ulp on cancellation-heavy frames
    "win_rolling_slope" ->
      ("WITH o AS (SELECT o_custkey, o_orderkey, " +
        "CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS DOUBLE) AS x, " +
        "o_totalprice AS y, " +
        "CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS DOUBLE) * o_totalprice AS xy, " +
        "CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS DOUBLE) * CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS DOUBLE) AS xx " +
        "FROM orders), " +
        "lw AS (SELECT o_custkey, o_orderkey, " +
        "list(x) OVER win AS xs, list(y) OVER win AS ys, " +
        "list(xy) OVER win AS xys, list(xx) OVER win AS xxs " +
        "FROM o WINDOW win AS (PARTITION BY o_custkey ORDER BY x, o_orderkey " +
        "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)), " +
        "w AS (SELECT o_custkey, o_orderkey, CAST(len(xs) AS DOUBLE) AS n, " +
        "list_reduce(xs, (a, b) -> a + b) AS sx, list_reduce(ys, (a, b) -> a + b) AS sy, " +
        "list_reduce(xys, (a, b) -> a + b) AS sxy, list_reduce(xxs, (a, b) -> a + b) AS sxx " +
        "FROM lw) " +
        "SELECT o_custkey, o_orderkey, " +
        "CASE WHEN n > 1.0 AND n*sxx - sx*sx <> 0.0 " +
        "THEN sign((n*sxy - sx*sy) / (n*sxx - sx*sx)) * (floor(abs((n*sxy - sx*sy) / (n*sxx - sx*sx)) * 10000.0 + 0.5) / 10000.0) + 0.0 END AS slope " +
        "FROM w ORDER BY o_custkey, o_orderkey"),
    // same grid as stat_chisq, with the marginal metadata the effect
    // size needs; the unrounded sum feeds sqrt, finals round 6 dp
    "stat_cramers_v" ->
      ("WITH obs AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS o FROM documents GROUP BY 1, 2), " +
        "r AS (SELECT lang, sum(o) AS rt FROM obs GROUP BY 1), " +
        "c AS (SELECT source, sum(o) AS ct FROM obs GROUP BY 1), " +
        "tot AS (SELECT sum(o) AS n, count(DISTINCT lang) AS rr, count(DISTINCT source) AS cc FROM obs), " +
        "grid AS (SELECT r.rt * c.ct / tot.n AS e, coalesce(obs.o, 0.0) AS o, " +
        "(tot.rr - 1) * (tot.cc - 1) AS dof, tot.n, tot.rr, tot.cc " +
        "FROM r CROSS JOIN c LEFT JOIN obs ON r.lang = obs.lang AND c.source = obs.source " +
        "CROSS JOIN tot), " +
        "g AS (SELECT dof, n, rr, cc, sum((o - e) * (o - e) / e) AS chi2raw " +
        "FROM grid GROUP BY dof, n, rr, cc) " +
        "SELECT round(chi2raw, 6) AS chi2, CAST(dof AS BIGINT) AS dof, CAST(n AS BIGINT) AS n, " +
        "CASE WHEN least(rr - 1, cc - 1) = 0 THEN 0.0 ELSE floor(sqrt(chi2raw / (n * CAST(least(rr - 1, cc - 1) AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 END AS cramers_v " +
        "FROM g"),
    "stat_chisq" ->
      ("WITH obs AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS o FROM documents GROUP BY 1, 2), " +
        "r AS (SELECT lang, sum(o) AS rt FROM obs GROUP BY 1), " +
        "c AS (SELECT source, sum(o) AS ct FROM obs GROUP BY 1), " +
        "tot AS (SELECT sum(o) AS n, (count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1) AS dof FROM obs), " +
        "grid AS (SELECT r.rt * c.ct / tot.n AS e, coalesce(obs.o, 0.0) AS o, tot.dof " +
        "FROM r CROSS JOIN c LEFT JOIN obs ON r.lang = obs.lang AND c.source = obs.source " +
        "CROSS JOIN tot) " +
        "SELECT round(sum((o - e) * (o - e) / e), 6) AS chi2, CAST(dof AS BIGINT) AS dof " +
        "FROM grid GROUP BY dof"),
    // the bloom prefilter is invisible to the result — the oracle is the
    // plain join, which is exactly the no-false-negatives guarantee
    "join_bloom_prefilter" ->
      ("SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_orderpriority = '1-URGENT' GROUP BY 1 ORDER BY 1"),
    "join_shuffle_hash" ->
      ("SELECT p_brand, count(*) AS cnt, round(sum(l_extendedprice), 2) AS revenue " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1 ORDER BY 1"),
    "stat_skew_report" ->
      ("WITH per AS (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY 1), " +
        "tot AS (SELECT sum(cnt) AS total, count(*) AS n_keys FROM per) " +
        "SELECT l_suppkey, cnt, floor(cnt * 100.0 / total * 10000.0 + 0.5) / 10000.0 AS share_pct, " +
        "floor(cnt * n_keys / CAST(total AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS x_avg " +
        "FROM per CROSS JOIN tot ORDER BY cnt DESC, l_suppkey LIMIT 15"),
    "llm_weighted_sample" ->
      ("SELECT doc_id, n_chars, round(ln(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE) " +
        "/ 1152921504606846976.0) / n_chars, 8) AS skey " +
        "FROM documents ORDER BY skey DESC, doc_id LIMIT 20"),
    "scd2_build" ->
      ("WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events), " +
        "ch AS (SELECT user_id, event_type, ts, event_id, " +
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM e), " +
        "f AS (SELECT * FROM ch WHERE prev_type IS NULL OR prev_type <> event_type) " +
        "SELECT user_id, event_id, event_type AS state, ts AS valid_from, " +
        "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to, " +
        "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current " +
        "FROM f ORDER BY user_id, valid_from, event_id"),
    // the oracle is the FULL recompute — the invariant incremental ETL
    // must preserve
    "agg_incremental_rollup" ->
      ("SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS cnt, " +
        "round(sum(o_totalprice), 2) AS total FROM orders GROUP BY 1 ORDER BY 1"),
    "stat_outlier_mad" ->
      ("WITH med AS (SELECT o_orderpriority, median(o_totalprice) AS med FROM orders GROUP BY 1), " +
        "mad AS (SELECT o.o_orderpriority, max(med.med) AS med, " +
        "median(abs(o.o_totalprice - med.med)) AS mad " +
        "FROM orders o JOIN med ON o.o_orderpriority = med.o_orderpriority GROUP BY 1) " +
        "SELECT o.o_orderpriority, max(floor(mad.med * 100.0 + 0.5) / 100.0) AS med, " +
        "max(floor(mad.mad * 100.0 + 0.5) / 100.0) AS mad, count(*) AS n_outliers " +
        "FROM orders o JOIN mad ON o.o_orderpriority = mad.o_orderpriority " +
        "WHERE o.o_totalprice > mad.med + 2.0 * mad.mad GROUP BY 1 ORDER BY 1"))
}
