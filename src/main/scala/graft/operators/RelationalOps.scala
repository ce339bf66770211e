package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational core (SURVEY.md §2.A, B, C, D, F, G, H).
  *
  * Scale posture (100 TB): every op below is a declarative DataFrame plan —
  * Catalyst provides predicate pushdown, column pruning, partial aggregation
  * and join selection; AQE handles skew splitting and partition coalescing
  * at runtime. Dimension joins are explicitly broadcast; fact-fact joins are
  * left to sort-merge on their shuffle keys. No driver-side loops.
  */
object RelationalOps {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // ---------------------------------------------------------------- A. scans

  /** A1: full scan, all columns, total order. */
  def scanParquet(s: SparkSession, d: String): DataFrame =
    t(s, d, "nation").orderBy("n_nationkey")

  /** A2: 3-column projection + filter — exercises parquet column pruning and
    * predicate pushdown (PushedFilters visible in the physical plan). */
  def scanPruned(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_orderkey") % 500 === 0)
      .select("l_orderkey", "l_partkey", "l_quantity")
      .orderBy("l_orderkey", "l_partkey", "l_quantity")

  /** A3: the events ns-timestamp normalization, ordered head. */
  def scanEventsNs(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .filter(col("event_id") < 500)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")

  /** A4: JSON extraction from the props string column.
    *
    * r15 note: the llmRepetition sort-lift (sort raw, parse after) was
    * tried and reverted — this parse is one cheap get_json_object, so
    * paying it twice in the range-sampling pass beats shuffling the whole
    * `props` string column through the sort (0.58 -> ~1.2 s at sf0.1).
    * The lift only wins when the projection is the expensive side. */
  def jsonExtractProps(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")

  /** A5: CSV round-trip — write region to CSV, read back with explicit
    * schema. Exercises a non-parquet source with pinned header/quote opts. */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val r = t(s, d, "region")
    val tmp = graft.TempDirs.cached("csv", d) { dir =>
      // pin whitespace handling: Spark's CSV WRITER trims leading/trailing
      // whitespace by default, which would silently corrupt the roundtrip
      // the moment a fixture string carries a boundary space
      r.write.mode("overwrite").option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false").csv(dir)
    }
    s.read.option("header", "true").schema(r.schema).csv(tmp)
      .orderBy("r_regionkey")
  }

  /** A5b: JSON round-trip — write region to JSON lines, read back with
    * explicit schema (schema-on-read; no inference job). */
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val r = t(s, d, "region")
    val tmp = graft.TempDirs.cached("json", d)(dir => r.write.mode("overwrite").json(dir))
    s.read.schema(r.schema).json(tmp)
      .orderBy("r_regionkey")
  }

  /** A5c: ORC round-trip — the third file format surface. */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val r = t(s, d, "region")
    val tmp = graft.TempDirs.cached("orc", d)(dir => r.write.mode("overwrite").orc(dir))
    s.read.schema(r.schema).orc(tmp)
      .orderBy("r_regionkey")
  }

  /** A5d: XML round-trip — Spark 4's built-in XML data source, explicit
    * schema on read (rowTag pinned). */
  def xmlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val r = t(s, d, "region")
    val tmp = graft.TempDirs.cached("xml", d) { dir =>
      r.write.mode("overwrite").option("rowTag", "row").format("xml").save(dir)
    }
    s.read.schema(r.schema).option("rowTag", "row").format("xml").load(tmp)
      .orderBy("r_regionkey")
  }

  /** A5e: TYPED JSON file source — the region roundtrip only exercises
    * flat strings+ints on 5 rows; this one ingests the events table
    * (timestamp, double, strings, 60 k rows at sf0.1) through JSON lines
    * with an EXPLICIT schema (schema-on-read, no inference job — at
    * 100 TB inference is a full extra pass) and aggregates per type, so
    * the JSON reader's type coercion (ISO timestamp parse, full-precision
    * double) is oracle-checked, not just its string identity.
    * timestampFormat is pinned to literal microseconds on BOTH write and
    * read: the default JSON format truncates to milliseconds, which
    * would silently lose the µs precision the events fixtures carry. */
  def scanJsonTyped(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val tmp = graft.TempDirs.cached("json_events", d)(dir =>
      ev.write.mode("overwrite").option("timestampFormat", fmt).json(dir))
    s.read.schema(ev.schema).option("timestampFormat", fmt).json(tmp)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        round(sum("value"), 2).as("sum_v"),
        min("ts").as("min_ts"), max("ts").as("max_ts"))
      .orderBy("event_type")
  }

  // ------------------------------------------------- B. projection / filter

  /** B1: per-row computed net revenue. NOTE: (l_orderkey, l_linenumber) is
    * NOT unique in the synthetic lineitem — every lineitem ORDER BY must
    * extend to all output columns. Rounding uses floor(x*100+0.5)/100
    * rather than round(): the inputs carry exactly 2 decimal digits, so the
    * product lands on .xx5 boundaries where Spark's decimal HALF_UP and
    * DuckDB's binary rounding disagree; the floor formula is pure IEEE
    * arithmetic and therefore bit-identical on both engines. */
  def projectCompute(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5) / 100.0).as("net_price"))
      .orderBy("l_orderkey", "l_linenumber", "net_price")

  /** B2: compound predicate — comparisons, AND/OR, BETWEEN, IN. */
  def filterCombo(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .filter(col("o_orderstatus").isin("F", "O") &&
        col("o_totalprice").between(50000, 300000) &&
        (col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"))
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")

  /** B3: LIKE + regexp_extract (brand number from "Brand#<n>"). */
  def filterLikeRegex(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .withColumn("brand_num", regexp_extract(col("p_brand"), "#(\\d+)", 1).cast("int"))
      .filter(col("p_name").like("%gear%") && col("brand_num") > 10)
      .select("p_partkey", "p_name", "p_brand", "brand_num")
      .orderBy("p_partkey")

  /** B4: NULL logic — fixtures are null-free, so manufacture NULLs with
    * nullif, then exercise IS NULL / coalesce / CASE three-valued logic.
    * Never ordered on the nullable columns (SURVEY.md §5.3.4). */
  def filterNullLogic(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .withColumn("nd", nullif(col("l_discount"), lit(0.0)))
      .select(col("l_orderkey"), col("l_linenumber"), col("nd"),
        coalesce(col("nd"), lit(-1.0)).as("disc_or_neg"),
        col("nd").isNull.as("was_zero"),
        when(col("nd") > 0.05, "hi").when(col("nd").isNull, "none").otherwise("lo").as("tier"))
      .orderBy("l_orderkey", "l_linenumber", "disc_or_neg")

  /** B5: CASE WHEN bucketing + per-tier aggregates. */
  def caseBucketing(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .withColumn("tier",
        when(col("o_totalprice") < 100000, "low")
          .when(col("o_totalprice") < 300000, "mid")
          .otherwise("high"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("tier")

  // ----------------------------------------------------------------- C. joins

  /** C1: inner equi-join (sort-merge at scale; AQE may demote to broadcast). */
  def joinInnerEqui(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")

  /** C2: dimension joins with explicit broadcast hints — at 100 TB the fact
    * side streams while nation/region (25 / 5 rows) replicate to executors. */
  def joinBroadcastDims(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "n_name", "r_name")
      .orderBy("c_custkey")

  private def bigOrders(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").filter(col("o_totalprice") > 400000)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** C3: left outer join — unmatched customers keep NULL order columns. */
  def joinLeftOuter(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(bigOrders(s, d), col("o_custkey") === col("c_custkey"), "left")
      .select("c_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)

  /** C4: right outer mirror of C3. */
  def joinRightOuter(s: SparkSession, d: String): DataFrame =
    bigOrders(s, d)
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
      .select("c_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)

  /** C5: full outer join of per-nation supplier vs customer counts, with
    * asymmetric filters so each side has nations the other lacks. */
  def joinFullOuter(s: SparkSession, d: String): DataFrame = {
    val sup = t(s, d, "supplier").filter(col("s_acctbal") > 5000)
      .groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))
    val cus = t(s, d, "customer").filter(col("c_acctbal") > 9000)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
    sup.join(cus, col("s_nationkey") === col("c_nationkey"), "full")
      .select(coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
        col("n_supp"), col("n_cust"))
      .orderBy("nationkey")
  }

  /** C6: left semi — customers having a qualifying order (EXISTS). */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_totalprice") > 450000),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** C7: left anti — customers with NO qualifying order (NOT EXISTS). */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_totalprice") > 450000),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** C8: cross join — bounded (5 × 25 rows). */
  def joinCross(s: SparkSession, d: String): DataFrame =
    t(s, d, "region").crossJoin(t(s, d, "nation"))
      .select("r_name", "n_name")
      .orderBy("r_name", "n_name")

  /** C9: theta/range join — events within 10 min after a signup by the same
    * user. Interval arithmetic pinned to integer µs on both engines. At
    * 100 TB this becomes a range join: pre-filter + bucket by user, never a
    * full cartesian. */
  def joinThetaRange(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
    val sig = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("su"),
        unix_micros(col("ts")).as("ts1"))
    val ev = e.select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts2"))
    sig.join(ev, col("su") === col("user_id") &&
        col("ts2") > col("ts1") && col("ts2") <= col("ts1") + lit(600000000L))
      .select("signup_id", "event_id", "event_type")
      .orderBy("signup_id", "event_id")
  }

  /** C9b: PURE range self-join (no equi key) — all purchase-event pairs
    * within 5 minutes of each other, via [[ScaleOps.rangePairsBinned]]'s
    * interval binning. The naive formulation is a cartesian nested-loop;
    * the binned one is an ordinary hash/merge join on the bin key
    * (plan-asserted: no BroadcastNestedLoopJoin/CartesianProduct). */
  def joinRangeBinned(s: SparkSession, d: String): DataFrame = {
    val p = t(s, d, "events").filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    ScaleOps.rangePairsBinned(p, "event_id", "us", 300000000L)
      .orderBy("a_id", "b_id")
  }

  /** THE purchase/signup projections of the as-of family — ONE copy for
    * all six operators (the forward variant derives its negated axis from
    * these), so a fixture schema change cannot reach only some of them. */
  private def asofPurchases(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))

  private def asofSignups(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("su"), col("ts").as("s_ts"))

  /** C10: as-of join — for each purchase, the latest prior-or-equal signup of
    * the same user; tie-break on signup event_id. Spark has no native as-of
    * join, so: conditional join + window argmax (row_number = 1). At 100 TB:
    * range-partition by user, sort by ts, merge within partitions. */
  def joinAsof(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (pur, sig) = (asofPurchases(s, d), asofSignups(s, d))
    val w = Window.partitionBy("purchase_id")
      .orderBy(col("s_ts").desc, col("signup_id").desc)
    pur.join(sig, col("user_id") === col("su") && col("s_ts") <= col("p_ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("purchase_id", "user_id", "signup_id")
      .orderBy("purchase_id")
  }

  /** C10b: the same as-of join through the engine's NATIVE plan node
    * (graftnative.AsOfJoinPlan → AsOfJoinExec): both sides hash-cluster on
    * user and sort by (user, ts), then a single per-partition merge pass
    * keeps O(1) state instead of materializing every (purchase × earlier
    * signup) pair for the window to discard. Same oracle as C10 — the two
    * formulations must agree row-for-row. */
  def joinAsofNative(s: SparkSession, d: String): DataFrame = {
    val (pur, sig) = (asofPurchases(s, d), asofSignups(s, d))
    org.apache.spark.sql.graftnative.AsOfJoinApi
      .asofJoin(pur, sig, "user_id", "su", "p_ts", "s_ts", "signup_id")
      .select("purchase_id", "user_id", "signup_id")
      .orderBy("purchase_id")
  }

  /** C10c: as-of join with a staleness tolerance — the native merge node
    * composed with a post-filter. Tolerance only EXCLUDES (the backward
    * as-of already picked the maximum s_ts; if that one is older than the
    * window, no earlier signup can be younger), so filter-after-merge is
    * exactly as-of-with-tolerance, with no second pass. */
  def joinAsofTolerance(s: SparkSession, d: String): DataFrame = {
    val (pur, sig) = (asofPurchases(s, d), asofSignups(s, d))
    org.apache.spark.sql.graftnative.AsOfJoinApi
      .asofJoin(pur, sig, "user_id", "su", "p_ts", "s_ts", "signup_id")
      .filter(col("s_ts") >= col("p_ts") - expr("INTERVAL 3 DAYS"))
      .select("purchase_id", "user_id", "signup_id")
      .orderBy("purchase_id")
  }

  /** C10e: LEFT-OUTER as-of join — every purchase survives; those with no
    * prior signup carry a NULL signup_id (pandas merge_asof's default
    * shape). Same single merge pass; the outer flag only changes what the
    * merge emits on a miss. */
  def joinAsofOuter(s: SparkSession, d: String): DataFrame = {
    val (pur, sig) = (asofPurchases(s, d), asofSignups(s, d))
    org.apache.spark.sql.graftnative.AsOfJoinApi
      .asofJoin(pur, sig, "user_id", "su", "p_ts", "s_ts", "signup_id", isOuter = true)
      .select("purchase_id", "user_id", "signup_id")
      .orderBy("purchase_id")
  }

  /** C10d: FORWARD as-of join — for each purchase, the EARLIEST signup at
    * or after it — via the same native merge node on a negated time axis:
    * backward-as-of on -unix_micros(ts) picks max(-s) <= -p ⟺ min s >= p.
    * Tie-break negates too (max(-id) ⟺ min id), matching the forward
    * convention (pandas merge_asof direction='forward'). One plan node
    * serves both directions — no second operator to maintain. */
  def joinAsofForward(s: SparkSession, d: String): DataFrame = {
    val pur = asofPurchases(s, d)
      .select(col("purchase_id"), col("user_id"), (-unix_micros(col("p_ts"))).as("neg_p"))
    val sig = asofSignups(s, d)
      .select(col("signup_id"), col("su"), (-unix_micros(col("s_ts"))).as("neg_s"),
        (-col("signup_id")).as("neg_id"))
    org.apache.spark.sql.graftnative.AsOfJoinApi
      .asofJoin(pur, sig, "user_id", "su", "neg_p", "neg_s", "neg_id")
      .select("purchase_id", "user_id", "signup_id")
      .orderBy("purchase_id")
  }

  /** C10f: NEAREST as-of join (pandas merge_asof direction='nearest') —
    * for each purchase, the signup closest in time in EITHER direction.
    * Composed from the native merge node run twice: the backward pick
    * minimizes the time gap among s_ts ≤ p_ts (it takes the max such
    * s_ts) and the forward pick minimizes it among s_ts ≥ p_ts, so the
    * global nearest is always one of the two — an equi-join of the two
    * purchase-sized outer results and a comparison finish the job. Tie
    * rules are inherited and deterministic: equal gaps prefer backward;
    * within a direction the merge's tie column decides (backward: max
    * signup_id, forward: min signup_id), mirrored exactly in the oracle's
    * rank expression. Both merges shuffle once on user_id; the alignment
    * join shuffles two |purchases|-sized sides on purchase_id. */
  def joinAsofNearest(s: SparkSession, d: String): DataFrame = {
    val (pur, sig) = (asofPurchases(s, d), asofSignups(s, d))
    val back = org.apache.spark.sql.graftnative.AsOfJoinApi
      .asofJoin(pur, sig, "user_id", "su", "p_ts", "s_ts", "signup_id", isOuter = true)
      .select(col("purchase_id"), col("user_id"), unix_micros(col("p_ts")).as("p_us"),
        col("signup_id").as("b_id"), unix_micros(col("s_ts")).as("b_us"))
    val purN = pur.select(col("purchase_id"), col("user_id"),
      (-unix_micros(col("p_ts"))).as("neg_p"))
    val sigN = sig.select(col("signup_id"), col("su"),
      (-unix_micros(col("s_ts"))).as("neg_s"), (-col("signup_id")).as("neg_id"))
    val fwd = org.apache.spark.sql.graftnative.AsOfJoinApi
      .asofJoin(purN, sigN, "user_id", "su", "neg_p", "neg_s", "neg_id", isOuter = true)
      .select(col("purchase_id").as("f_pid"), col("signup_id").as("f_id"),
        (-col("neg_s")).as("f_us"))
    back.join(fwd, col("purchase_id") === col("f_pid"))
      .withColumn("pick_b", col("b_id").isNotNull &&
        (col("f_id").isNull || col("p_us") - col("b_us") <= col("f_us") - col("p_us")))
      .select(col("purchase_id"), col("user_id"),
        when(col("pick_b"), col("b_id")).otherwise(col("f_id")).as("signup_id"),
        when(col("pick_b"), lit("backward"))
          .when(col("f_id").isNotNull, lit("forward")).as("dir"))
      .orderBy("purchase_id")
  }

  /** C14: blocked fuzzy join (entity resolution) — never all-pairs;
    * candidates come from equality on cheap blocking keys, the edit
    * distance only runs on candidates. Semantics: lev ≤ 1 pairs within
    * 16-char-prefix blocks. For equal-length names lev = 1 means exactly
    * ONE substitution (an indel pair already costs 2), so within a block
    * the free positions are 17 and 18 and TWO blocking passes — "agree
    * everywhere but 17" and "agree everywhere but 18" — generate exactly
    * the qualifying pairs, no misses, no dead candidates (the naive
    * single-pass in-block join evaluates 5.5× more pairs: measured 5.0 s
    * vs 1.x s at sf0.1; a 15-char block key costs 45 s). The two passes
    * are disjoint by construction (pass-A pairs differ at 17, pass-B
    * pairs agree through 17), so a plain union needs no dedup. At 100 TB
    * the pass keys are the shuffle keys — candidate generation stays
    * linear in corpus size.
    *
    * PRECONDITION (enforced): every name is exactly 18 characters. The
    * two free positions {17, 18} are derived from that length — on a
    * mixed-length corpus a lev-1 INDEL pair (e.g. a 17-char name equal to
    * an 18-char name with char 17 deleted) shares the 16-char prefix but
    * matches neither pass key, a silent miss. Rather than silently lose
    * pairs, the op fails loudly; generalizing needs one pass per suffix
    * position (L−16 passes for uniform length L) or deletion-neighborhood
    * keys for true mixed lengths. The guard is IN the blocking-key
    * expression (raise_error under a length test), not a driver-side
    * pre-scan: the builder stays purely declarative like every sibling
    * op — no extra Spark job per construction — and the key can't be
    * pruned away because the join condition consumes it. */
  def fuzzyJoinBlocked(s: SparkSession, d: String): DataFrame = {
    def side(p: String) = t(s, d, "customer")
      .select(col("c_custkey").as(s"${p}_key"), col("c_name").as(s"${p}_name"))
    def pass(key: Column => Column, extra: Column): DataFrame =
      side("a").withColumn("bk", key(col("a_name")))
        .join(side("b").withColumn("bk2", key(col("b_name"))),
          col("bk") === col("bk2") && col("a_key") < col("b_key") && extra)
        .select("a_key", "b_key", "a_name", "b_name")
    // Null name → null blocking key → the join condition is null and the
    // row silently drops out, same as the old driver-side require that
    // ignored null names. Without the explicit branch, length(null)===18
    // is null and `otherwise` fired raise_error with the misleading
    // "another length" message on a merely-absent name.
    val checked = (n: Column) => when(n.isNull, lit(null).cast("string"))
      .when(length(n) === 18, n).otherwise(raise_error(concat(
        lit("fuzzyJoinBlocked: two-pass {17,18} blocking is complete only for 18-char " +
          "non-null names; this corpus has another length in: "), n)).cast("string"))
    val skipPos17 = (n: Column) => {
      val c = checked(n); concat(substring(c, 1, 16), substring(c, 18, 1))
    }
    val skipPos18 = (n: Column) => substring(checked(n), 1, 17)
    // pass-A additionally requires char 17 to DIFFER: identical names
    // (lev 0) match both pass keys, so without this the union emitted
    // duplicate-name pairs twice (the old "disjoint by construction"
    // claim held only for lev = 1). With it the passes partition the
    // qualifying pairs: differ-at-17 vs agree-through-17.
    pass(skipPos17, substring(col("a_name"), 17, 1) =!= substring(col("b_name"), 17, 1))
      .unionByName(pass(skipPos18, lit(true)))
      .withColumn("lev", levenshtein(col("a_name"), col("b_name")))
      .filter(col("lev") <= 1)
      .select("a_key", "b_key", "lev")
      // r15: materialize the matched pairs BEFORE the output sort — the
      // range exchange's sampling pass otherwise re-executes both blocked
      // join passes and every levenshtein a second time per run. The
      // checkpoint holds only the qualifying (a_key, b_key, lev) triples
      // (output-sized, ~|customers| rows here), so at 100 TB it is the
      // result set, never the candidate set.
      .localCheckpoint(true)
      .orderBy("a_key", "b_key")
  }

  /** D12: exact median plus a DETERMINISTIC mode — Spark's (and DuckDB's)
    * mode() is tie-arbitrary, so the mode is computed as an explicit
    * argmax: count per value, window row_number ordered by (count desc,
    * value asc). Same plan both engines → hash-stable. */
  def aggMedianMode(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(s, d, "orders")
    val med = o.groupBy("o_orderstatus")
      .agg(round(median(col("o_totalprice")), 4).as("med_price"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("cnt").desc, col("o_orderpriority").asc)
    val mode = o.groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_prio"))
    med.join(mode, "o_orderstatus").orderBy("o_orderstatus")
  }

  /** D13: weighted median — the value at which cumulative weight first
    * reaches half the total (lower weighted median): quantity-weighted
    * extendedprice per return flag. Spark ships no weighted quantile at
    * all (median/percentile are unweighted), yet pricing and survey
    * pipelines need exactly this. EXACT integer arithmetic end to end:
    * weights are integral quantities, the crossing test is 2·cumw ≥
    * totw, and the selected price passes through untouched (no float
    * op anywhere). Scale: prices are NEAR-UNIQUE (the (flag, price)
    * "domain" is ~the row count — unlike the KS keys' bounded 2-dp
    * domain), so a window PARTITION BY flag would put the whole corpus
    * into |flags| window tasks at any size — a hidden data-grain
    * window. The cumulative weight instead rides
    * [[ScalePrimitives.distRunning]] (parallel range-partitioned
    * prefix sums) in global (flag, price) order; per-flag cums are
    * recovered by subtracting each flag's exclusive offset — off =
    * max(gcum) − total, a |flags|-row aggregate OF the ranked frame
    * itself (no window anywhere, no second corpus pass), broadcast
    * back. */
  def aggWeightedMedian(s: SparkSession, d: String): DataFrame = {
    val per = t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_extendedprice").as("price"))
      .agg(sum(col("l_quantity").cast("long")).as("w"))
    val run = ScalePrimitives.distRunning(
      per, Seq(col("l_returnflag"), col("price")), "rk", Seq("w"), Seq("gcum"))
    val offs = run.groupBy("l_returnflag")
      .agg(sum("w").as("totw"), max("gcum").as("hi"))
      .withColumn("off", col("hi") - col("totw")).drop("hi")
    run.join(broadcast(offs), "l_returnflag")
      .filter((col("gcum") - col("off")) * 2 >= col("totw"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("price")).as("w_median"), max(col("totw")).as("total_weight"))
      .orderBy("l_returnflag")
  }

  /** C11: TPC-H-Q5-shaped star join — revenue by nation for one region and
    * one order-date year, with the supplier-nation co-location condition. */
  def joinStarTpch(s: SparkSession, d: String): DataFrame =
    t(s, d, "region").filter(col("r_name") === "ASIA")
      .join(t(s, d, "nation"), col("n_regionkey") === col("r_regionkey"))
      .join(t(s, d, "customer"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, d, "orders"), col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(t(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "supplier"),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** C12: correlated scalar subquery — orders above 2× their customer's
    * average (Catalyst decorrelates to an aggregate + join; SQL-text entry
    * point). */
  def subScalarCorr(s: SparkSession, d: String): DataFrame = {
    Tables.view(s, d, "orders")
    s.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders o
      WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""")
  }

  /** Correlated EXISTS (Catalyst rewrites to a left-semi join on the
    * correlation key — the plan join_semi grades, reached from the SQL
    * subquery surface instead of the DataFrame API). */
  def subExistsCorr(s: SparkSession, d: String): DataFrame = {
    Tables.view(s, d, "orders")
    Tables.view(s, d, "customer")
    s.sql("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""")
  }

  /** Correlated NOT EXISTS (rewritten to a left-anti join) — customers
    * with no URGENT order, the classic anti-join formulation (the
    * unconditioned "never ordered" form is empty on this fixture, which
    * would grade a degenerate 0-row result). */
  def subNotExists(s: SparkSession, d: String): DataFrame = {
    Tables.view(s, d, "orders")
    Tables.view(s, d, "customer")
    s.sql("""
      SELECT c_custkey, c_acctbal
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""")
  }

  /** C13: uncorrelated IN subquery (rewritten to a semi join). */
  def subInUncorr(s: SparkSession, d: String): DataFrame = {
    Tables.view(s, d, "orders")
    Tables.view(s, d, "customer")
    s.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)
      ORDER BY o_orderkey""")
  }

  // ----------------------------------------------------------- D. aggregation

  /** D1: ungrouped global aggregates. */
  def aggGlobal(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").agg(
      count(lit(1)).as("cnt"),
      round(sum("l_quantity"), 2).as("sum_qty"),
      round(avg("l_extendedprice"), 4).as("avg_price"),
      min("l_quantity").as("min_qty"),
      max("l_quantity").as("max_qty"),
      min("l_shipdate").as("min_ship"),
      max("l_shipdate").as("max_ship"))

  /** D2: TPC-H Q1 pricing summary — 2-phase hash aggregation. */
  def aggGroupbyQ1(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** The Q1 pricing sums on a DECIMAL money path (the one type family
    * real TPC-H data has that the double fixtures don't): every money
    * column casts to a tight decimal at the scan (the data is 2-dp by
    * construction, so the cast recovers exact cents identically in both
    * engines — the proven tpch_q9_profit treatment) and the per-row
    * discount/tax arithmetic and the per-group sums all run in EXACT
    * decimal — no floating accumulation anywhere. Widths are chosen so
    * the widest product, decimal(12,2)·(5,2)·(5,2) summed over a group,
    * stays inside 38 digits on BOTH engines (Spark would otherwise
    * silently truncate scale under allowPrecisionLoss; DuckDB would
    * overflow). Output is the cent-exact value surfaced as 2-dp doubles
    * (exact — values ≪ 2^53/100), the cross-engine-stable output type. */
  def aggGroupbyQ1Decimal(s: SparkSession, d: String): DataFrame = {
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val oneMinusDisc = lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")
    val onePlusTax = lit(1).cast("decimal(3,2)") + col("l_tax").cast("decimal(4,2)")
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity").cast("decimal(8,2)")), 2).cast("double").as("sum_qty"),
        round(sum(price), 2).cast("double").as("sum_base_price"),
        round(sum(price * oneMinusDisc), 2).cast("double").as("sum_disc_price"),
        round(sum(price * oneMinusDisc * onePlusTax), 2).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** D3: exact multi-distinct aggregation (Expand + 2-phase agg). */
  def aggCountDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("nd_part"),
        countDistinct("l_suppkey").as("nd_supp"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  /** EXACT distinct counting through the bitmap aggregate family
    * (Spark 4 natives: bitmap_bucket_number / bitmap_bit_position /
    * bitmap_construct_agg / bitmap_count) — the scalable exact-distinct
    * shape: level 1 aggregates per (group, bucket) so no single reducer
    * ever holds a whole group's distinct set (a plain count(DISTINCT)
    * concentrates each group on one task; HLL is the approximate twin
    * when 4 KB/bucket is still too much), level 2 sums the per-bucket
    * bitmap cardinalities. Result is exactly count(DISTINCT). */
  def aggBitmapDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"))
      .groupBy(col("l_returnflag"),
        expr("bitmap_bucket_number(l_orderkey)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_orderkey))").as("bm"))
      .groupBy("l_returnflag")
      .agg(sum(expr("bitmap_count(bm)")).as("nd_orders"))
      .orderBy("l_returnflag")

  /** Portable HyperLogLog (round-7 promotion, same pattern as the CMS and
    * SimHash promotions): m=512 registers over the pinned 60-bit md5
    * hash, so the DuckDB oracle rebuilds the SAME registers and the key
    * grades with a full hash-match instead of rows-only. The register
    * table per (group, reg) is max-mergeable at every level — map-side,
    * reducer, cross-day — which is the whole point of HLL at 100 TB.
    *
    * Cross-engine determinism, the part that makes the oracle possible:
    * registers are summed as EXACT scaled integers (2^(52-rank) as
    * BIGINT, total ≤ 2^61), never as 2^-rank doubles — a float sum's
    * value depends on aggregation order, which neither engine pins. The
    * estimate is then two IEEE ops (one literal multiply baked into
    * [[HllNumerator]], one divide) on identical inputs → bit-identical.
    * m=512 keeps the GRADED fixture cardinalities (2 k / 20 k distinct)
    * out of the small-range zone (E > 2.5m) — measured rel-err 3.1%
    * (sf0.01) / 3.3% (sf0.1); the linear-counting branch in
    * [[hllEstimate]] covers small cardinalities deterministically.
    * Bit split: reg = low 9 bits, w = h >> 9 (51 bits), rank =
    * 52 - bitlen(w) via length(bin(w)) — minimal binary string in BOTH
    * engines, pure integer/string ops. */
  private[graft] val HllMaxRank = 52
  /** alpha_512 * 512^2 * 2^52 = 0.7213/(1+1.079/512) * 2^70; the literal
    * is the shortest double repr, parsed to the same IEEE value by both
    * engines (the 2^70 factor only shifts the exponent, so this IS
    * alpha's mantissa). */
  private[graft] val HllNumerator = 8.497699123215257e20

  /** Per-(group, reg) max-rank register table — ONE 2-phase hash
    * aggregation; at most |groups|·512 rows regardless of input size. */
  private[graft] def hllRegisters(df: DataFrame, group: String, value: Column): DataFrame =
    // distinct BEFORE hashing: duplicate values contribute the same
    // (reg, rank), so the md5+conv tower only needs to run once per
    // distinct (group, value) — a cheap integer/narrow-row hash agg
    // replaces ~30× repeated string-hash work at sf0.1 (and ~85% of the
    // hash work in the 20M-row stress run). Register table unchanged.
    withHllRegRank(df.select(col(group), value.as("v")).distinct(), col("v"))
      .groupBy(col(group), col("reg")).agg(max("rank").as("mr"))

  /** The stateless (reg, rank) projection under [[hllRegisters]] and the
    * streaming HLL twin — one definition of the md5 tower, so the batch
    * oracle grades the streaming registers too. Appends `reg`/`rank`. */
  private[graft] def withHllRegRank(df: DataFrame, value: Column): DataFrame =
    df.withColumn("__h60",
        conv(substring(md5(value.cast("string").cast("binary")), 1, 15), 16, 10)
          .cast("long"))
      .withColumn("__w", shiftright(col("__h60"), 9))
      .withColumn("reg", col("__h60").bitwiseAND(511L))
      .withColumn("rank",
        when(col("__w") === 0L, HllMaxRank)
          .otherwise(lit(HllMaxRank) - length(bin(col("__w")))))
      .drop("__h60", "__w")

  /** Driver/state-side twin of [[hllEstimate]] for the streaming op:
    * the SAME scaled-integer sum and the same two-IEEE-op estimate, so
    * a register table folded in streaming state estimates
    * bit-identically to the batch frame. The ln is STRICTMATH.log —
    * Spark's `log` expression compiles to StrictMath.log, while
    * Math.log is a HotSpot intrinsic that differs from it by 1 ulp on
    * ~7% of the 511 linear-counting inputs on this host; the
    * bit-identity contract must not hang on which of those ulps sits
    * next to a half-integer on some JDK. `regs(i)` = max rank of
    * register i, or -1 if never hit. */
  private[graft] def hllEstimateScalar(regs: Array[Int]): Long = {
    var np = 0L; var sp = 0L
    var i = 0
    while (i < regs.length) {
      if (regs(i) >= 0) { np += 1; sp += 1L << (HllMaxRank - regs(i)) }
      i += 1
    }
    val nv = 512L - np
    val raw = HllNumerator / ((nv * (1L << HllMaxRank) + sp).toDouble)
    val est =
      if (raw <= 1280.0 && nv > 0L) 512.0 * StrictMath.log(512.0 / nv.toDouble) else raw
    math.floor(est + 0.5).toLong
  }

  /** Registers → estimate: exact integer S_scaled, then 2 IEEE ops for
    * the raw estimate. Standard small-range correction (linear counting,
    * E ≤ 2.5m with empty registers): the BRANCH CONDITION tests the raw
    * estimate, which is bit-identical cross-engine, so both engines
    * always take the same branch; the ln() inside the branch is the one
    * sub-ulp engine-libm exposure, and it is INACTIVE at both graded
    * scales (fixture cardinalities 2 k / 20 k ≫ 2.5m = 1280) — it exists
    * for small-cardinality accuracy (sf0.001 unit tests: 200 distinct →
    * raw HLL reads 474, linear counting reads 201). */
  private[graft] def hllEstimate(regs: DataFrame, group: String): DataFrame =
    regs.groupBy(group)
      .agg(count(lit(1)).as("np"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllMaxRank - mr)")).as("sp"))
      .select(col(group),
        (lit(HllNumerator) /
          ((lit(512L) - col("np")) * lit(1L << HllMaxRank) + col("sp")).cast("double"))
          .as("raw"),
        (lit(512L) - col("np")).as("nv"))
      .select(col(group),
        floor(
          when(col("raw") <= 1280.0 && col("nv") > 0L,
            lit(512.0) * log(lit(512.0) / col("nv").cast("double")))
            .otherwise(col("raw")) + 0.5).cast("long").as("est_nd"))

  /** D4: approximate distinct — portable-HLL variant, graded with a full
    * DuckDB oracle (see [[hllRegisters]]). The Spark builtin
    * approx_count_distinct (HLL++ library surface) stays unit-tested
    * against exact counts in RelationalOpsSpec. */
  def aggApproxHll(s: SparkSession, d: String): DataFrame =
    hllEstimate(
      hllRegisters(t(s, d, "lineitem"), "l_returnflag", col("l_partkey")),
      "l_returnflag")
      .orderBy("l_returnflag")

  /** D4b: Apache DataSketches HLL — unlike approx_count_distinct's
    * internal HLL++, the sketch itself is a first-class mergeable value
    * (union partial sketches across partitions/days, estimate once) —
    * the 100 TB pattern for incremental distinct counts. No oracle
    * (sketch-specific); rel-err vs exact is unit-tested. */
  def aggHllSketch(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(cast(l_partkey as string)))").as("sketch_nd"))
      .orderBy("l_returnflag")

  /** D4d: sketch MERGEABILITY — per-group portable-HLL register tables
    * union-merged (register-wise max) into one global estimate without
    * rescanning rows. This is the property that makes sketches the
    * 100 TB answer: partials combine associatively at every level
    * (map-side, reducer, cross-partition, cross-day). Graded with a full
    * DuckDB oracle since round 7 — the oracle rebuilds the same per-group
    * registers and merges them the same way; RelationalOpsSpec also
    * asserts the merge invariant (merged estimate == the estimate of a
    * sketch built directly on the unsplit data, bit-for-bit). The
    * DataSketches union surface (hll_union_agg) stays unit-tested there
    * too. */
  def aggHllMerge(s: SparkSession, d: String): DataFrame = {
    // r15: the per-group register table feeds both the merge and the
    // n_sketches scalar — one lazy plan re-ran the full corpus distinct +
    // md5 tower per branch; the eager checkpoint (≤ |groups|·512 rows)
    // prices the corpus pass once.
    val perGroup = hllRegisters(t(s, d, "lineitem"), "l_returnflag", col("l_partkey"))
      .localCheckpoint(true)
    val merged = perGroup.groupBy("reg").agg(max("mr").as("mr"))
      .select(lit("all").as("scope"), col("reg"), col("mr"))
    val nSketches = perGroup.select(countDistinct("l_returnflag").as("n_sketches"))
    hllEstimate(merged, "scope")
      .crossJoin(nSketches)
      .select(col("n_sketches"), col("est_nd").as("global_nd"))
  }

  /** D4e: sketch INTERSECTION via inclusion–exclusion — |A∩B| ≈ est(A) +
    * est(B) − est(A∪B), the audience-overlap question ("orders with
    * lines under BOTH flags") answered from mergeable sketches without a
    * pairwise join. Union is register-wise max (the [[aggHllMerge]]
    * kernel); all three estimates are exact BIGINTs from the shared
    * portable-HLL tower, so the subtraction is integer-exact. The exact
    * intersection rides along as its own column — both the oracle's
    * cross-check and the honest statement of I–E's error (it compounds
    * three estimates; fine at 512 registers for same-order sets, and the
    * 100 TB posture is the same one-pass register tables). */
  def aggHllIntersect(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").filter(col("l_returnflag").isin("A", "R"))
    // r15: the distinct (flag, orderkey) pair set is the shared input of
    // ALL FOUR branches (A/R registers, union registers, exact
    // intersection) — as one lazy plan it was recomputed per branch, i.e.
    // three full lineitem scans + three distinct shuffles per run. One
    // eager checkpoint of the ~distinct-pair frame (2·|orders| rows max,
    // register-table-adjacent grain) makes every branch a cheap re-read;
    // identical expressions, one corpus pass.
    val dd = li.select(col("l_returnflag"), col("l_orderkey").as("v"))
      .distinct().localCheckpoint(true)
    // registers likewise feed two branches (per-flag + union estimates);
    // the checkpointed register table is ≤ 2·512 rows
    val regs = withHllRegRank(dd, col("v"))
      .groupBy(col("l_returnflag"), col("reg")).agg(max("rank").as("mr"))
      .localCheckpoint(true)
    val per = hllEstimate(regs, "l_returnflag").agg(
      sum(when(col("l_returnflag") === "A", col("est_nd"))).as("est_a"),
      sum(when(col("l_returnflag") === "R", col("est_nd"))).as("est_b"))
    val union = hllEstimate(
      regs.groupBy("reg").agg(max("mr").as("mr"))
        .select(lit("u").as("scope"), col("reg"), col("mr")),
      "scope").select(col("est_nd").as("est_union"))
    val exact = dd
      .groupBy("v").agg(count(lit(1)).as("nf"))
      .filter(col("nf") === 2).agg(count(lit(1)).as("exact_intersect"))
    per.crossJoin(union).crossJoin(exact)
      .select(col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"),
        col("exact_intersect"))
  }

  /** Pinned md5 universal-hash bucket shared by the portable CMS ops:
    * h_j(v) = md5("j:v") 60-bit prefix mod width. md5 is bit-identical
    * in DuckDB, so the oracle rebuilds the SAME counter table — the
    * trick that promoted SimHash/MinHash to full hash-match grades. */
  private def cmsBucket(j: Column, v: Column, width: Int): Column =
    conv(substring(md5(concat_ws(":", j, v).cast("binary")), 1, 15), 16, 10)
      .cast("long") % width

  /** D4c: approximate heavy-hitters — PORTABLE count-min variant, graded
    * with a full DuckDB oracle (round-7 promotion; the Spark builtin
    * `approx_top_k` library surface stays unit-tested against exact
    * counts in NoOracleKeysSpec). The CMS build is one 2-phase groupBy
    * over (hash-row, bucket) — partial sums map-side, d·w counters total
    * regardless of corpus size; candidates (the distinct event domain)
    * probe 4 buckets each and take the min, then top-3 by estimate is a
    * TakeOrderedAndProject. At 100 TB with an open domain the candidate
    * set comes from a per-partition local top-k instead of distinct();
    * the closed 5-value fixture domain needs no pre-screen. */
  def aggApproxTopk(s: SparkSession, d: String): DataFrame = {
    val width = 1024
    val js = array((0 until 4).map(lit): _*)
    val ev = t(s, d, "events").select(col("event_type"))
    // value-counts first, hash the 5-value domain after (same rationale
    // as aggCountMin: the bucket depends only on (j, value), so the md5
    // tower runs ~20 times instead of once per (row, j))
    val counters = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("n"), explode(js).as("j"))
      .groupBy(col("j"), cmsBucket(col("j"), col("event_type"), width).as("bucket"))
      .agg(sum("n").as("c"))
    ev.distinct()
      .select(col("event_type"), explode(js).as("j"))
      .withColumn("bucket", cmsBucket(col("j"), col("event_type"), width))
      .join(counters, Seq("j", "bucket"), "left")
      .groupBy("event_type")
      .agg(min(coalesce(col("c"), lit(0L))).as("est_cnt"))
      .orderBy(col("est_cnt").desc, col("event_type"))
      .limit(3)
      .orderBy("event_type")
  }

  /** D13: count-min sketch — PORTABLE arithmetic variant, graded with a
    * full DuckDB oracle (round-7 promotion): d=4 pinned md5 hash rows
    * over a width-2048 counter table per returnflag, built as value-
    * counts → hashed bucket-sums (both 2-phase map-side-mergeable
    * aggregations — the CMS property that matters at 100 TB: counters
    * are partial-sum mergeable at every level — map-side, reducer,
    * cross-day). Point estimates for the full 1..50 quantity
    * domain are 4 bucket lookups + min each, never undercounting. The
    * Spark builtin `count_min_sketch` (serialized-sketch library
    * surface, eps bound, mergeInPlace) stays unit-tested in
    * NoOracleKeysSpec. */
  def aggCountMin(s: SparkSession, d: String): DataFrame = {
    val width = 2048
    val js = array((0 until 4).map(lit): _*)
    val li = t(s, d, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("int").as("qv"))
    // value-counts FIRST, hash the ~50-value domain after: the md5
    // bucket depends only on (j, qv), so hashing per ROW evaluated 2.4M
    // md5+conv towers at sf0.1 where ~600 suffice (honest-sink bench:
    // 4.5 s → sub-second; the old count() sink had hidden the entire
    // counter build by pruning the unreferenced min() column and the
    // left join under it). Counters are IDENTICAL — sum of value-counts
    // per bucket — and both aggregations stay map-side mergeable, the
    // CMS property that matters at 100 TB.
    val vc = li.groupBy("l_returnflag", "qv").agg(count(lit(1)).as("n"))
    val counters = vc
      .select(col("l_returnflag"), col("qv"), col("n"), explode(js).as("j"))
      .groupBy(col("l_returnflag"), col("j"),
        cmsBucket(col("j"), col("qv"), width).as("bucket"))
      .agg(sum("n").as("c"))
    // query grid generated per flag via explode(sequence) — same rows a
    // cross join would produce, but with no nested-loop join in the plan
    li.select("l_returnflag").distinct()
      .select(col("l_returnflag"),
        explode(sequence(lit(1), lit(50))).as("qv"))
      .select(col("l_returnflag"), col("qv"), explode(js).as("j"))
      .withColumn("bucket", cmsBucket(col("j"), col("qv"), width))
      .join(counters, Seq("l_returnflag", "j", "bucket"), "left")
      .groupBy("l_returnflag", "qv")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
      .orderBy("l_returnflag", "qv")
  }

  /** D5: statistical aggregates per group. */
  def aggStats(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp("l_quantity"), 4).as("sd_qty"),
        round(var_samp("l_quantity"), 4).as("var_qty"),
        round(corr("l_extendedprice", "l_quantity"), 4).as("corr_pq"),
        round(covar_samp("l_extendedprice", "l_quantity"), 4).as("cov_pq"))
      .orderBy("l_returnflag")

  /** D6: exact interpolated percentiles (sort-based). */
  def aggPercentile(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
      .orderBy("o_orderstatus")

  /** D6b: approximate percentiles — PORTABLE equi-width-histogram variant,
    * graded with a full DuckDB oracle (round-7 promotion; the Spark
    * builtin `approx_percentile` GK-sketch surface stays unit-tested in
    * RelationalOpsSpec). The sketch is 4096 fixed, data-independent
    * buckets of width exactly 125.0 over o_totalprice's [0, 512000)
    * domain (out-of-domain values clamp into the last bucket) — counts
    * are plain-sum mergeable at every level, the property that matters
    * at 100 TB, and the whole build is ONE 2-phase groupBy. The p-th
    * estimate is the midpoint of the first bucket whose cumulative count
    * reaches ceil(p·n): every step (divide by the dyadic 125.0, floor,
    * integer cums, ceil of one IEEE product, 125·(b+0.5) exact) is
    * deterministic and identical cross-engine, so the oracle hash-matches
    * while the estimate stays within half a bucket (±62.5, rel-err
    * < 0.1% on this domain) of the exact percentile. */
  def aggApproxPercentile(s: SparkSession, d: String): DataFrame = {
    val buckets = t(s, d, "orders")
      .groupBy(col("o_orderstatus"),
        least(floor(col("o_totalprice") / 125.0), lit(4095L)).cast("int").as("b"))
      .agg(count(lit(1)).as("c"))
    val byStatus = org.apache.spark.sql.expressions.Window.partitionBy("o_orderstatus")
    val cum = buckets
      .withColumn("cum", sum("c").over(byStatus.orderBy("b")))
      .withColumn("n", sum("c").over(byStatus))
    cum.groupBy("o_orderstatus")
      .agg(
        min(when(col("cum") >= ceil(lit(0.5) * col("n")), col("b"))).as("b50"),
        min(when(col("cum") >= ceil(lit(0.9) * col("n")), col("b"))).as("b90"))
      .select(col("o_orderstatus"),
        (lit(125.0) * (col("b50") + 0.5)).as("ap50"),
        (lit(125.0) * (col("b90") + 0.5)).as("ap90"))
      .orderBy("o_orderstatus")
  }

  /** D7: ROLLUP with GROUPING markers; subtotal keys coalesced to 'ALL' so
    * no NULL ever reaches an ORDER BY (SURVEY.md §5.3.4). */
  def aggRollup(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        grouping("l_returnflag").cast("int").as("g_rf"),
        grouping("l_linestatus").cast("int").as("g_ls"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("cnt"), col("sum_qty"), col("g_rf"), col("g_ls"))
      .orderBy("rf", "ls")

  /** D8: CUBE over order status × priority. */
  def aggCube(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        round(avg("o_totalprice"), 4).as("avg_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("cnt"), col("avg_price"))
      .orderBy("status", "priority")

  /** D9: explicit GROUPING SETS (SQL-text entry point, SURVEY.md §3.2). */
  def aggGroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.view(s, d, "lineitem")
    s.sql("""
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             count(1) AS cnt,
             round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY rf, ls""")
  }

  /** D10: ordered string aggregation — sorted CSV of nation names per
    * region (string output sidesteps list-encoding differences). */
  def aggCollectSorted(s: SparkSession, d: String): DataFrame =
    t(s, d, "nation")
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(concat_ws(",", sort_array(collect_list("n_name"))).as("nations"))
      .orderBy("r_name")

  /** D11: manual conditional pivot over the closed 5-value event_type domain
    * (sum(CASE WHEN ...) rather than the pivot() API keeps the oracle ANSI). */
  def aggConditionalPivot(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
    val types = Seq("click", "error", "purchase", "signup", "view")
    val aggs = types.map(ty =>
      round(sum(when(col("event_type") === ty, col("value"))), 2).as(s"${ty}_v")) :+
      count(lit(1)).as("n")
    e.groupBy("user_id").agg(aggs.head, aggs.tail: _*).orderBy("user_id")
  }

  /** D14: contingency table via DataFrameStatFunctions.crosstab (counts
    * are exact → oracle-able as a manual pivot). */
  def statCrosstab(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").stat.crosstab("l_returnflag", "l_linestatus")
      .orderBy("l_returnflag_l_linestatus")

  /** D11b: the same pivot through RelationalGroupedDataset.pivot — the
    * API-surface twin of agg_conditional_pivot. Values are listed
    * explicitly: pivot() without them runs an extra distinct-values job
    * AND caps the column count at spark.sql.pivotMaxValues — on a closed
    * domain the list is free and the plan is a single aggregation,
    * identical to the CASE-WHEN formulation after Catalyst rewrites it. */
  def aggPivotNative(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    t(s, d, "events")
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(round(sum("value"), 2))
      .select(col("user_id") +: types.map(ty => col(s"`$ty`").as(s"${ty}_v")): _*)
      .orderBy("user_id")
  }

  /** D15: pairwise Pearson correlation matrix over lineitem's numeric
    * measures, in tidy (col_a, col_b) long form — the profiling pass run
    * before feature selection. One aggregation computes all 6 pairs
    * (corr is algebraic: partial co-moments combine map-side), then the
    * 6-row stack is driver-trivial. 4 dp rounding absorbs the
    * summation-order noise of the distributed co-moment merge. */
  def statCorrMatrix(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 4).as(s"${a}__$b")
    }
    val wide = t(s, d, "lineitem").agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) => s"'$a', '$b', `${a}__$b`" }
      .mkString(", ")
    wide.select(expr(
        s"stack(${pairs.size}, $stacked) as (col_a, col_b, corr_v)"))
      .orderBy("col_a", "col_b")
  }

  // -------------------------------------------------------- F. sort / top-k

  /** F1: multi-column global sort (range-partitioned SortExec). */
  def sortMulticol(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate", "l_quantity")
      .orderBy(col("l_returnflag"), col("l_shipdate").desc, col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** F2: top-k with tie-break (TakeOrderedAndProject — no full sort). */
  def topkLimit(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  // ------------------------------------------------------------ G. set ops

  /** G1: UNION ALL with side tags (Spark union is by position — columns
    * aligned explicitly). */
  def setUnionAll(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_nationkey").as("nationkey"), lit("cust").as("side"))
      .unionAll(
        t(s, d, "supplier").select(col("s_nationkey").as("nationkey"), lit("supp").as("side")))
      .orderBy("nationkey", "side")

  /** G2: distinct union. */
  def setUnionDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      .union(t(s, d, "supplier").select(col("s_nationkey")))
      .distinct()
      .orderBy("nationkey")

  /** G3: INTERSECT (distinct semantics on both engines). */
  def setIntersect(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(t(s, d, "supplier").select(col("s_nationkey")))
      .orderBy("nationkey")

  /** G4: EXCEPT with selective sides. */
  def setExcept(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").filter(col("c_acctbal") > 9900)
      .select(col("c_nationkey").as("nationkey"))
      .except(t(s, d, "supplier").filter(col("s_acctbal") > 9000).select(col("s_nationkey")))
      .orderBy("nationkey")

  /** G5: INTERSECT ALL — multiset semantics: each nationkey appears
    * min(customer-count, supplier-count) times. */
  def setIntersectAll(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      .intersectAll(t(s, d, "supplier").select(col("s_nationkey")))
      .orderBy("nationkey")

  /** G6: EXCEPT ALL — multiset difference: customer occurrences minus
    * supplier occurrences per nationkey. */
  def setExceptAll(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      .exceptAll(t(s, d, "supplier").select(col("s_nationkey")))
      .orderBy("nationkey")

  /** G7: unionByName with allowMissingColumns — schema-aligned union by
    * column NAME (Spark's plain union is by position); the side lacking a
    * column gets NULLs. */
  def setUnionByName(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer")
      .select(col("c_nationkey").as("nationkey"), lit("cust").as("side"),
        col("c_acctbal").as("acctbal"))
    val supp = t(s, d, "supplier")
      .select(lit("supp").as("side"), col("s_nationkey").as("nationkey"))
    cust.unionByName(supp, allowMissingColumns = true)
      .orderBy(col("nationkey"), col("side"), col("acctbal").asc_nulls_first)
  }

  // ------------------------------------------------- H. scalar function lib

  /** H1: string function suite. */
  def fnStringSuite(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(
      col("c_custkey"),
      upper(col("c_name")).as("up_name"),
      lower(col("c_mktsegment")).as("lo_seg"),
      length(col("c_name")).as("name_len"),
      substring(col("c_name"), 10, 4).as("sub4"),
      concat(col("c_mktsegment"), lit("-"), col("c_name")).as("cat"),
      lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
      regexp_replace(col("c_name"), "Customer", "C").as("repl"),
      trim(concat(lit(" "), col("c_mktsegment"), lit(" "))).as("trimmed"),
      split(col("c_name"), "#").getItem(0).as("prefix"))
      .orderBy("c_custkey")

  /** H6: URL function suite — parse_url field extraction over URLs
    * constructed deterministically from document metadata (the shape a
    * web-corpus pipeline sees: per-source hosts, per-doc paths, query
    * params carrying language/id). The oracle replicates each field with
    * anchored regexes over the SAME constructed string — safe because the
    * construction guarantees well-formed URLs, where java.net.URI (Spark)
    * and the regexes agree by inspection. Row-local, no shuffle. */
  def fnUrlSuite(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("url",
        concat(lit("https://"), col("source"), lit(".example.com/docs/"),
          col("doc_id"), lit("?lang="), col("lang"), lit("&id="), col("doc_id")))
      .select(
        col("doc_id"),
        col("url"),
        parse_url(col("url"), lit("PROTOCOL")).as("proto"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("lang")).as("q_lang"))
      .orderBy("doc_id")

  /** H2: date/time function suite — ISO weekday only (Spark weekday()+1 ≡
    * DuckDB isodow; the engines' dayofweek disagree), UTC pinned. */
  def fnDateSuite(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dom"),
      (weekday(col("o_orderdate")) + 1).as("isodow"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
      last_day(col("o_orderdate").cast("date")).as("month_end"))
      .orderBy("o_orderkey")

  /** H3: math function suite — transcendental outputs rounded to 6 dp to
    * absorb last-ulp libm differences. */
  def fnMathSuite(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").select(
      col("p_partkey"),
      round(abs(col("p_retailprice") - 1000.0), 6).as("a"),
      ceil(col("p_retailprice")).as("c"),
      floor(col("p_retailprice")).as("f"),
      round(pow(col("p_retailprice"), 0.5), 6).as("pw"),
      round(sqrt(col("p_size").cast("double")), 6).as("sq"),
      round(log(col("p_retailprice")), 6).as("l"),
      round(log10(col("p_retailprice")), 6).as("lg"),
      (col("p_partkey") % 7).as("m"),
      signum(col("p_retailprice") - 1200.0).cast("int").as("sg"))
      .orderBy("p_partkey")

  /** H4: array functions over the 64-dim embedding column. */
  def fnArraySuite(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      round(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
      round(element_at(col("embedding"), 2).cast("double"), 6).as("e2"),
      col("label"))
      .orderBy("vec_id")

  /** H5: conditional scalar functions. */
  def fnConditional(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(
      col("c_custkey"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
      greatest(col("c_acctbal"), lit(0.0)).as("pos_bal"),
      least(col("c_acctbal"), lit(5000.0)).as("capped"),
      when(nullif(col("c_acctbal"), lit(0.0)).isNull, 1).otherwise(0).as("zero_flag"))
      .orderBy("c_custkey")

  // --------------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "scan_parquet" -> (scanParquet _),
    "scan_pruned" -> (scanPruned _),
    "scan_events_ns" -> (scanEventsNs _),
    "json_extract_props" -> (jsonExtractProps _),
    "csv_roundtrip" -> (csvRoundtrip _),
    "json_roundtrip" -> (jsonRoundtrip _),
    "orc_roundtrip" -> (orcRoundtrip _),
    "xml_roundtrip" -> (xmlRoundtrip _),
    "scan_json_typed" -> (scanJsonTyped _),
    "project_compute" -> (projectCompute _),
    "filter_combo" -> (filterCombo _),
    "filter_like_regex" -> (filterLikeRegex _),
    "filter_null_logic" -> (filterNullLogic _),
    "case_bucketing" -> (caseBucketing _),
    "join_inner_equi" -> (joinInnerEqui _),
    "join_broadcast_dims" -> (joinBroadcastDims _),
    "join_left_outer" -> (joinLeftOuter _),
    "join_right_outer" -> (joinRightOuter _),
    "join_full_outer" -> (joinFullOuter _),
    "join_semi" -> (joinSemi _),
    "join_anti" -> (joinAnti _),
    "join_cross" -> (joinCross _),
    "join_theta_range" -> (joinThetaRange _),
    "join_range_binned" -> (joinRangeBinned _),
    "join_asof" -> (joinAsof _),
    "join_asof_native" -> (joinAsofNative _),
    "join_asof_tolerance" -> (joinAsofTolerance _),
    "join_asof_forward" -> (joinAsofForward _),
    "join_asof_nearest" -> (joinAsofNearest _),
    "join_asof_outer" -> (joinAsofOuter _),
    "fuzzy_join_blocked" -> (fuzzyJoinBlocked _),
    "agg_median_mode" -> (aggMedianMode _),
    "agg_weighted_median" -> (aggWeightedMedian _),
    "join_star_tpch" -> (joinStarTpch _),
    "sub_scalar_corr" -> (subScalarCorr _),
    "sub_in_uncorr" -> (subInUncorr _),
    "sub_exists_corr" -> (subExistsCorr _),
    "sub_not_exists" -> (subNotExists _),
    "agg_global" -> (aggGlobal _),
    "agg_groupby_q1" -> (aggGroupbyQ1 _),
    "agg_groupby_q1_decimal" -> (aggGroupbyQ1Decimal _),
    "agg_count_distinct" -> (aggCountDistinct _),
    "agg_bitmap_distinct" -> (aggBitmapDistinct _),
    "agg_approx_hll" -> (aggApproxHll _),
    "agg_approx_percentile" -> (aggApproxPercentile _),
    "agg_hll_sketch" -> (aggHllSketch _),
    "agg_hll_merge" -> (aggHllMerge _),
    "agg_hll_intersect" -> (aggHllIntersect _),
    "agg_approx_topk" -> (aggApproxTopk _),
    "agg_count_min" -> (aggCountMin _),
    "agg_stats" -> (aggStats _),
    "agg_percentile" -> (aggPercentile _),
    "agg_rollup" -> (aggRollup _),
    "agg_cube" -> (aggCube _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "agg_collect_sorted" -> (aggCollectSorted _),
    "agg_conditional_pivot" -> (aggConditionalPivot _),
    "agg_pivot_native" -> (aggPivotNative _),
    "stat_crosstab" -> (statCrosstab _),
    "stat_corr_matrix" -> (statCorrMatrix _),
    "sort_multicol" -> (sortMulticol _),
    "topk_limit" -> (topkLimit _),
    "set_union_all" -> (setUnionAll _),
    "set_union_distinct" -> (setUnionDistinct _),
    "set_intersect" -> (setIntersect _),
    "set_except" -> (setExcept _),
    "set_intersect_all" -> (setIntersectAll _),
    "set_except_all" -> (setExceptAll _),
    "set_union_by_name" -> (setUnionByName _),
    "fn_string_suite" -> (fnStringSuite _),
    "fn_url_suite" -> (fnUrlSuite _),
    "fn_date_suite" -> (fnDateSuite _),
    "fn_math_suite" -> (fnMathSuite _),
    "fn_array_suite" -> (fnArraySuite _),
    "fn_conditional" -> (fnConditional _),
  )

  /** DuckDB oracle SQL per query key. Dialect notes: integer-width CASTs
    * align DuckDB result types with Spark's (BIGINT vs INTEGER); events.ts
    * is CAST to µs TIMESTAMP to mirror the Spark-side ns normalization. */
  val oracles: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "agg_bitmap_distinct" ->
      "SELECT l_returnflag, count(DISTINCT l_orderkey) AS nd_orders FROM lineitem GROUP BY 1 ORDER BY 1",
    "scan_pruned" ->
      "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_orderkey % 500 = 0 ORDER BY l_orderkey, l_partkey, l_quantity",
    "scan_events_ns" ->
      "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events WHERE event_id < 500 ORDER BY event_id",
    "json_extract_props" ->
      "SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k FROM events ORDER BY event_id",
    "csv_roundtrip" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    "json_roundtrip" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    "orc_roundtrip" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    "xml_roundtrip" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    // the roundtrip is lossless (pinned microsecond timestampFormat), so
    // the oracle aggregates the parquet source directly
    "scan_json_typed" ->
      "SELECT event_type, CAST(count(*) AS BIGINT) AS cnt, round(sum(value), 2) AS sum_v, min(CAST(ts AS TIMESTAMP)) AS min_ts, max(CAST(ts AS TIMESTAMP)) AS max_ts FROM events GROUP BY 1 ORDER BY event_type",
    "project_compute" ->
      "SELECT l_orderkey, l_linenumber, floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) / 100.0 AS net_price FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price",
    "filter_combo" ->
      "SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderstatus IN ('F','O') AND o_totalprice BETWEEN 50000 AND 300000 AND (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH') ORDER BY o_orderkey",
    "filter_like_regex" ->
      "SELECT p_partkey, p_name, p_brand, CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS INTEGER) AS brand_num FROM part WHERE p_name LIKE '%gear%' AND CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS INTEGER) > 10 ORDER BY p_partkey",
    "filter_null_logic" ->
      "SELECT l_orderkey, l_linenumber, nullif(l_discount, 0.0) AS nd, coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_neg, (nullif(l_discount, 0.0) IS NULL) AS was_zero, CASE WHEN nullif(l_discount, 0.0) > 0.05 THEN 'hi' WHEN nullif(l_discount, 0.0) IS NULL THEN 'none' ELSE 'lo' END AS tier FROM lineitem ORDER BY l_orderkey, l_linenumber, disc_or_neg",
    "case_bucketing" ->
      "SELECT CASE WHEN o_totalprice < 100000 THEN 'low' WHEN o_totalprice < 300000 THEN 'mid' ELSE 'high' END AS tier, count(*) AS n, round(sum(o_totalprice), 2) AS total FROM orders GROUP BY 1 ORDER BY tier",
    "join_inner_equi" ->
      "SELECT o_orderkey, c_custkey, c_name, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey",
    "join_broadcast_dims" ->
      "SELECT c_custkey, n_name, r_name FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey ORDER BY c_custkey",
    "join_left_outer" ->
      "SELECT c_custkey, o_orderkey, o_totalprice FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o ON o_custkey = c_custkey ORDER BY c_custkey, o_orderkey NULLS FIRST",
    "join_right_outer" ->
      "SELECT c_custkey, o_orderkey, o_totalprice FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o RIGHT JOIN customer ON o_custkey = c_custkey ORDER BY c_custkey, o_orderkey NULLS FIRST",
    "join_full_outer" ->
      "SELECT coalesce(s.s_nationkey, c.c_nationkey) AS nationkey, s.n_supp, c.n_cust FROM (SELECT s_nationkey, count(*) AS n_supp FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey) s FULL JOIN (SELECT c_nationkey, count(*) AS n_cust FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) c ON s.s_nationkey = c.c_nationkey ORDER BY nationkey",
    "join_semi" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000) ORDER BY c_custkey",
    "join_anti" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000) ORDER BY c_custkey",
    "join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",
    "join_theta_range" ->
      "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events) SELECT s.event_id AS signup_id, e.event_id AS event_id, e.event_type FROM ev s JOIN ev e ON e.user_id = s.user_id AND epoch_us(e.ts) > epoch_us(s.ts) AND epoch_us(e.ts) <= epoch_us(s.ts) + 600000000 WHERE s.event_type = 'signup' ORDER BY signup_id, event_id",
    "join_range_binned" ->
      ("WITH p AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events WHERE event_type = 'purchase') " +
        "SELECT a.event_id AS a_id, b.event_id AS b_id, abs(b.us - a.us) AS dt_us " +
        "FROM p a JOIN p b ON a.event_id < b.event_id AND abs(b.us - a.us) <= 300000000 " +
        "ORDER BY a_id, b_id"),
    "join_asof" ->
      "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events), pairs AS (SELECT p.event_id AS purchase_id, p.user_id AS user_id, s.event_id AS signup_id, row_number() OVER (PARTITION BY p.event_id ORDER BY s.ts DESC, s.event_id DESC) AS rn FROM ev p JOIN ev s ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts WHERE p.event_type = 'purchase') SELECT purchase_id, user_id, signup_id FROM pairs WHERE rn = 1 ORDER BY purchase_id",
    "join_asof_native" ->
      "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events), pairs AS (SELECT p.event_id AS purchase_id, p.user_id AS user_id, s.event_id AS signup_id, row_number() OVER (PARTITION BY p.event_id ORDER BY s.ts DESC, s.event_id DESC) AS rn FROM ev p JOIN ev s ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts WHERE p.event_type = 'purchase') SELECT purchase_id, user_id, signup_id FROM pairs WHERE rn = 1 ORDER BY purchase_id",
    "join_asof_tolerance" ->
      "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events), pairs AS (SELECT p.event_id AS purchase_id, p.user_id AS user_id, s.event_id AS signup_id, p.ts AS p_ts, s.ts AS s_ts, row_number() OVER (PARTITION BY p.event_id ORDER BY s.ts DESC, s.event_id DESC) AS rn FROM ev p JOIN ev s ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts WHERE p.event_type = 'purchase') SELECT purchase_id, user_id, signup_id FROM pairs WHERE rn = 1 AND s_ts >= p_ts - INTERVAL 3 DAY ORDER BY purchase_id",
    "fuzzy_join_blocked" ->
      "SELECT a.c_custkey AS a_key, b.c_custkey AS b_key, CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS lev FROM customer a JOIN customer b ON substr(a.c_name, 1, 16) = substr(b.c_name, 1, 16) AND a.c_custkey < b.c_custkey WHERE levenshtein(a.c_name, b.c_name) <= 1 ORDER BY a_key, b_key",
    "join_asof_outer" ->
      "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events), pur AS (SELECT event_id AS purchase_id, user_id FROM ev WHERE event_type = 'purchase'), m AS (SELECT purchase_id, signup_id FROM (SELECT p.event_id AS purchase_id, s.event_id AS signup_id, row_number() OVER (PARTITION BY p.event_id ORDER BY s.ts DESC, s.event_id DESC) AS rn FROM ev p JOIN ev s ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts WHERE p.event_type = 'purchase') WHERE rn = 1) SELECT pur.purchase_id, pur.user_id, m.signup_id FROM pur LEFT JOIN m ON pur.purchase_id = m.purchase_id ORDER BY pur.purchase_id",
    "join_asof_forward" ->
      "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events), pairs AS (SELECT p.event_id AS purchase_id, p.user_id AS user_id, s.event_id AS signup_id, row_number() OVER (PARTITION BY p.event_id ORDER BY s.ts ASC, s.event_id ASC) AS rn FROM ev p JOIN ev s ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts >= p.ts WHERE p.event_type = 'purchase') SELECT purchase_id, user_id, signup_id FROM pairs WHERE rn = 1 ORDER BY purchase_id",
    // rank order mirrors the composition's tie rules exactly: smallest
    // gap first, backward preferred on equal gaps, then the direction's
    // own tie column (backward: max id, forward: min id)
    "join_asof_nearest" ->
      ("WITH p AS (SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts FROM events WHERE event_type = 'purchase'), " +
        "g AS (SELECT event_id AS signup_id, user_id, CAST(ts AS TIMESTAMP) AS s_ts FROM events WHERE event_type = 'signup'), " +
        "pr AS (SELECT p.purchase_id, g.signup_id, (g.s_ts <= p.p_ts) AS is_back, abs(epoch_us(g.s_ts) - epoch_us(p.p_ts)) AS gap FROM p JOIN g ON p.user_id = g.user_id), " +
        "r AS (SELECT purchase_id, signup_id, is_back, row_number() OVER (PARTITION BY purchase_id ORDER BY gap, is_back DESC, CASE WHEN is_back THEN -signup_id ELSE signup_id END) AS rn FROM pr) " +
        "SELECT p.purchase_id, p.user_id, r.signup_id, CASE WHEN r.signup_id IS NULL THEN NULL WHEN r.is_back THEN 'backward' ELSE 'forward' END AS dir " +
        "FROM p LEFT JOIN (SELECT * FROM r WHERE rn = 1) r ON p.purchase_id = r.purchase_id ORDER BY p.purchase_id"),
    "agg_median_mode" ->
      "WITH med AS (SELECT o_orderstatus, round(median(o_totalprice), 4) AS med_price FROM orders GROUP BY o_orderstatus), c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt FROM orders GROUP BY o_orderstatus, o_orderpriority), m AS (SELECT o_orderstatus, o_orderpriority AS mode_prio, row_number() OVER (PARTITION BY o_orderstatus ORDER BY cnt DESC, o_orderpriority) AS rn FROM c) SELECT med.o_orderstatus, med.med_price, m.mode_prio FROM med JOIN m ON med.o_orderstatus = m.o_orderstatus AND m.rn = 1 ORDER BY med.o_orderstatus",
    // integer weights, integer crossing test, price passes through
    // untouched — no float op anywhere in the key
    "agg_weighted_median" ->
      ("WITH per AS (SELECT l_returnflag, l_extendedprice AS price, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w FROM lineitem GROUP BY 1, 2), " +
        "c AS (SELECT l_returnflag, price, w, " +
        "CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY price ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw, " +
        "CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS totw FROM per) " +
        "SELECT l_returnflag, min(price) AS w_median, CAST(max(totw) AS BIGINT) AS total_weight " +
        "FROM c WHERE cumw * 2 >= totw GROUP BY l_returnflag ORDER BY l_returnflag"),
    "join_star_tpch" ->
      "SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue FROM region JOIN nation ON n_regionkey = r_regionkey JOIN customer ON c_nationkey = n_nationkey JOIN orders ON o_custkey = c_custkey JOIN lineitem ON l_orderkey = o_orderkey JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY n_name ORDER BY revenue DESC, n_name",
    "sub_scalar_corr" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders o WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) ORDER BY o_orderkey",
    "sub_in_uncorr" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500) ORDER BY o_orderkey",
    "sub_exists_corr" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT') ORDER BY c_custkey",
    "sub_not_exists" ->
      "SELECT c_custkey, c_acctbal FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT') ORDER BY c_custkey",
    "agg_global" ->
      "SELECT count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty, round(avg(l_extendedprice), 4) AS avg_price, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty, min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship FROM lineitem",
    "agg_groupby_q1" ->
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, round(sum(l_extendedprice), 2) AS sum_base_price, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price, round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge, round(avg(l_quantity), 4) AS avg_qty, round(avg(l_extendedprice), 4) AS avg_price, round(avg(l_discount), 4) AS avg_disc, count(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    // decimal money path: identical tight casts on both engines; the
    // sums are exact decimal end-to-end, only the OUTPUT drops to 2-dp
    // doubles (exact) for the cross-engine compare
    "agg_groupby_q1_decimal" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(round(sum(CAST(l_quantity AS DECIMAL(8,2))), 2) AS DOUBLE) AS sum_qty, " +
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price, " +
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price, " +
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "agg_count_distinct" ->
      "SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part, count(DISTINCT l_suppkey) AS nd_supp, count(*) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "agg_stats" ->
      "SELECT l_returnflag, round(stddev_samp(l_quantity), 4) AS sd_qty, round(var_samp(l_quantity), 4) AS var_qty, round(corr(l_extendedprice, l_quantity), 4) AS corr_pq, round(covar_samp(l_extendedprice, l_quantity), 4) AS cov_pq FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    // Portable CMS twins (round-7 promotion): identical md5 hash math,
    // counter build, and min-probe in both engines — see aggCountMin.
    "agg_count_min" ->
      "WITH li AS (SELECT l_returnflag, CAST(l_quantity AS INTEGER) AS qv FROM lineitem), js AS (SELECT unnest(generate_series(0,3)) AS j), h AS (SELECT l_returnflag, qv, j, CAST('0x' || substr(md5(j || ':' || qv), 1, 15) AS BIGINT) % 2048 AS bucket FROM li CROSS JOIN js), counters AS (SELECT l_returnflag, j, bucket, count(*) AS c FROM h GROUP BY 1,2,3), qs AS (SELECT unnest(generate_series(1,50)) AS qv), qh AS (SELECT qv, j, CAST('0x' || substr(md5(j || ':' || qv), 1, 15) AS BIGINT) % 2048 AS bucket FROM qs CROSS JOIN js), flags AS (SELECT DISTINCT l_returnflag FROM li) SELECT f.l_returnflag, CAST(q.qv AS INTEGER) AS qv, CAST(min(coalesce(c.c, 0)) AS BIGINT) AS est FROM flags f CROSS JOIN qh q LEFT JOIN counters c ON c.l_returnflag = f.l_returnflag AND c.j = q.j AND c.bucket = q.bucket GROUP BY 1, 2 ORDER BY 1, 2",
    "agg_approx_topk" ->
      "WITH ev AS (SELECT event_type FROM events), js AS (SELECT unnest(generate_series(0,3)) AS j), h AS (SELECT event_type, j, CAST('0x' || substr(md5(j || ':' || event_type), 1, 15) AS BIGINT) % 1024 AS bucket FROM ev CROSS JOIN js), counters AS (SELECT j, bucket, count(*) AS c FROM h GROUP BY 1,2), cands AS (SELECT DISTINCT event_type FROM ev), ch AS (SELECT event_type, j, CAST('0x' || substr(md5(j || ':' || event_type), 1, 15) AS BIGINT) % 1024 AS bucket FROM cands CROSS JOIN js), est AS (SELECT ch.event_type, CAST(min(coalesce(c.c, 0)) AS BIGINT) AS est_cnt FROM ch LEFT JOIN counters c ON c.j = ch.j AND c.bucket = ch.bucket GROUP BY 1) SELECT * FROM (SELECT event_type, est_cnt FROM est ORDER BY est_cnt DESC, event_type LIMIT 3) ORDER BY event_type",
    "agg_approx_hll" ->
      ("WITH h AS (SELECT l_returnflag, CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT) AS h60 FROM lineitem), " +
        "r AS (SELECT l_returnflag, h60 & 511 AS reg, CASE WHEN (h60 >> 9) = 0 THEN 52 ELSE 52 - length(bin(h60 >> 9)) END AS rank FROM h), " +
        "m AS (SELECT l_returnflag, reg, max(rank) AS mr FROM r GROUP BY 1, 2), " +
        "s AS (SELECT l_returnflag, count(*) AS np, sum(1::BIGINT << (52 - mr)) AS sp FROM m GROUP BY 1), " +
        "e AS (SELECT l_returnflag, 8.497699123215257e20 / CAST((512 - np) * (1::BIGINT << 52) + sp AS DOUBLE) AS raw, 512 - np AS nv FROM s) " +
        "SELECT l_returnflag, CAST(floor(CASE WHEN raw <= 1280.0 AND nv > 0 THEN 512.0 * ln(512.0 / nv) ELSE raw END + 0.5) AS BIGINT) AS est_nd " +
        "FROM e ORDER BY l_returnflag"),
    "agg_hll_merge" ->
      ("WITH h AS (SELECT l_returnflag, CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT) AS h60 FROM lineitem), " +
        "r AS (SELECT l_returnflag, h60 & 511 AS reg, CASE WHEN (h60 >> 9) = 0 THEN 52 ELSE 52 - length(bin(h60 >> 9)) END AS rank FROM h), " +
        "m AS (SELECT l_returnflag, reg, max(rank) AS mr FROM r GROUP BY 1, 2), " +
        "u AS (SELECT reg, max(mr) AS mr FROM m GROUP BY 1), " +
        "s AS (SELECT count(*) AS np, sum(1::BIGINT << (52 - mr)) AS sp FROM u), " +
        "e AS (SELECT 8.497699123215257e20 / CAST((512 - np) * (1::BIGINT << 52) + sp AS DOUBLE) AS raw, 512 - np AS nv FROM s), " +
        "n AS (SELECT count(DISTINCT l_returnflag) AS n_sketches FROM m) " +
        "SELECT n.n_sketches, CAST(floor(CASE WHEN raw <= 1280.0 AND nv > 0 THEN 512.0 * ln(512.0 / nv) ELSE raw END + 0.5) AS BIGINT) AS global_nd FROM e, n"),
    "agg_hll_intersect" ->
      ("WITH h AS (SELECT l_returnflag, CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h60 " +
        "FROM lineitem WHERE l_returnflag IN ('A', 'R')), " +
        "r AS (SELECT l_returnflag, h60 & 511 AS reg, CASE WHEN (h60 >> 9) = 0 THEN 52 ELSE 52 - length(bin(h60 >> 9)) END AS rank FROM h), " +
        "m AS (SELECT l_returnflag, reg, max(rank) AS mr FROM r GROUP BY 1, 2), " +
        "s AS (SELECT l_returnflag, count(*) AS np, sum(1::BIGINT << (52 - mr)) AS sp FROM m GROUP BY 1), " +
        "e AS (SELECT l_returnflag, 8.497699123215257e20 / CAST((512 - np) * (1::BIGINT << 52) + sp AS DOUBLE) AS raw, 512 - np AS nv FROM s), " +
        "est AS (SELECT l_returnflag, CAST(floor(CASE WHEN raw <= 1280.0 AND nv > 0 THEN 512.0 * ln(512.0 / nv) ELSE raw END + 0.5) AS BIGINT) AS est_nd FROM e), " +
        "p AS (SELECT CAST(sum(CASE WHEN l_returnflag = 'A' THEN est_nd END) AS BIGINT) AS est_a, " +
        "CAST(sum(CASE WHEN l_returnflag = 'R' THEN est_nd END) AS BIGINT) AS est_b FROM est), " +
        "u AS (SELECT reg, max(mr) AS mr FROM m GROUP BY 1), " +
        "su AS (SELECT count(*) AS np, sum(1::BIGINT << (52 - mr)) AS sp FROM u), " +
        "eu AS (SELECT 8.497699123215257e20 / CAST((512 - np) * (1::BIGINT << 52) + sp AS DOUBLE) AS raw, 512 - np AS nv FROM su), " +
        "uu AS (SELECT CAST(floor(CASE WHEN raw <= 1280.0 AND nv > 0 THEN 512.0 * ln(512.0 / nv) ELSE raw END + 0.5) AS BIGINT) AS est_union FROM eu), " +
        "x AS (SELECT CAST(count(*) AS BIGINT) AS exact_intersect FROM " +
        "(SELECT l_orderkey FROM (SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem WHERE l_returnflag IN ('A', 'R')) " +
        "GROUP BY l_orderkey HAVING count(*) = 2)) " +
        "SELECT est_a, est_b, est_union, est_a + est_b - est_union AS est_intersect, exact_intersect FROM p, uu, x"),
    "agg_percentile" ->
      "SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 4) AS p50, round(quantile_cont(o_totalprice, 0.9), 4) AS p90 FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    "agg_approx_percentile" ->
      ("WITH b AS (SELECT o_orderstatus, LEAST(CAST(floor(o_totalprice / 125.0) AS INT), 4095) AS b FROM orders), " +
        "c AS (SELECT o_orderstatus, b, count(*) AS c FROM b GROUP BY 1, 2), " +
        "w AS (SELECT o_orderstatus, b, sum(c) OVER (PARTITION BY o_orderstatus ORDER BY b) AS cum, sum(c) OVER (PARTITION BY o_orderstatus) AS n FROM c), " +
        "q AS (SELECT o_orderstatus, min(CASE WHEN cum >= ceil(0.5 * n) THEN b END) AS b50, min(CASE WHEN cum >= ceil(0.9 * n) THEN b END) AS b90 FROM w GROUP BY 1) " +
        "SELECT o_orderstatus, 125.0 * (b50 + 0.5) AS ap50, 125.0 * (b90 + 0.5) AS ap90 FROM q ORDER BY o_orderstatus"),
    "agg_rollup" ->
      "SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty, CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf, CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls",
    "agg_cube" ->
      "SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS cnt, round(avg(o_totalprice), 4) AS avg_price FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY status, priority",
    "agg_grouping_sets" ->
      "SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) ORDER BY rf, ls",
    "agg_collect_sorted" ->
      "SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name",
    "agg_conditional_pivot" ->
      "SELECT user_id, round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click_v, round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error_v, round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase_v, round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup_v, round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view_v, count(*) AS n FROM events GROUP BY user_id ORDER BY user_id",
    "stat_crosstab" ->
      "SELECT CAST(l_returnflag AS VARCHAR) AS l_returnflag_l_linestatus, count(*) FILTER (WHERE l_linestatus = 'F') AS F, count(*) FILTER (WHERE l_linestatus = 'O') AS O FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag_l_linestatus",
    "agg_pivot_native" ->
      "SELECT user_id, round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click_v, round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error_v, round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase_v, round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup_v, round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view_v FROM events GROUP BY user_id ORDER BY user_id",
    "stat_corr_matrix" ->
      ("SELECT col_a, col_b, corr_v FROM (" +
        "SELECT 'l_discount' AS col_a, 'l_tax' AS col_b, round(corr(l_discount, l_tax), 4) AS corr_v FROM lineitem " +
        "UNION ALL SELECT 'l_extendedprice', 'l_discount', round(corr(l_extendedprice, l_discount), 4) FROM lineitem " +
        "UNION ALL SELECT 'l_extendedprice', 'l_tax', round(corr(l_extendedprice, l_tax), 4) FROM lineitem " +
        "UNION ALL SELECT 'l_quantity', 'l_extendedprice', round(corr(l_quantity, l_extendedprice), 4) FROM lineitem " +
        "UNION ALL SELECT 'l_quantity', 'l_discount', round(corr(l_quantity, l_discount), 4) FROM lineitem " +
        "UNION ALL SELECT 'l_quantity', 'l_tax', round(corr(l_quantity, l_tax), 4) FROM lineitem" +
        ") ORDER BY col_a, col_b"),
    "sort_multicol" ->
      "SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate, l_quantity FROM lineitem WHERE l_partkey % 10 = 0 ORDER BY l_returnflag, l_shipdate DESC, l_orderkey, l_linenumber, l_quantity",
    "topk_limit" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "set_union_all" ->
      "SELECT c_nationkey AS nationkey, 'cust' AS side FROM customer UNION ALL SELECT s_nationkey, 'supp' FROM supplier ORDER BY nationkey, side",
    "set_union_distinct" ->
      "SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY nationkey",
    "set_intersect" ->
      "SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey",
    "set_except" ->
      "SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900 EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000 ORDER BY nationkey",
    "set_intersect_all" ->
      "SELECT * FROM (SELECT c_nationkey AS nationkey FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier) ORDER BY nationkey",
    "set_except_all" ->
      "SELECT * FROM (SELECT c_nationkey AS nationkey FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier) ORDER BY nationkey",
    "set_union_by_name" ->
      "SELECT * FROM (SELECT c_nationkey AS nationkey, 'cust' AS side, c_acctbal AS acctbal FROM customer UNION ALL SELECT s_nationkey, 'supp', NULL FROM supplier) ORDER BY nationkey, side, acctbal NULLS FIRST",
    "fn_string_suite" ->
      "SELECT c_custkey, upper(c_name) AS up_name, lower(c_mktsegment) AS lo_seg, CAST(length(c_name) AS INTEGER) AS name_len, substr(c_name, 10, 4) AS sub4, concat(c_mktsegment, '-', c_name) AS cat, lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded, regexp_replace(c_name, 'Customer', 'C', 'g') AS repl, trim(concat(' ', c_mktsegment, ' ')) AS trimmed, split_part(c_name, '#', 1) AS prefix FROM customer ORDER BY c_custkey",
    "fn_url_suite" ->
      ("WITH u AS (SELECT doc_id, 'https://' || source || '.example.com/docs/' || doc_id || '?lang=' || lang || '&id=' || doc_id AS url FROM documents) " +
        "SELECT doc_id, url, regexp_extract(url, '^([a-z]+)://', 1) AS proto, " +
        "regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host, " +
        "regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path, " +
        "regexp_extract(url, '\\?([^#]*)', 1) AS query, " +
        "regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS q_lang FROM u ORDER BY doc_id"),
    "fn_date_suite" ->
      "SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS y, CAST(month(o_orderdate) AS INTEGER) AS m, CAST(day(o_orderdate) AS INTEGER) AS dom, CAST(isodow(o_orderdate) AS INTEGER) AS isodow, date_trunc('month', o_orderdate) AS month_start, CAST(o_orderdate AS DATE) + 30 AS plus30, CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since, last_day(CAST(o_orderdate AS DATE)) AS month_end FROM orders ORDER BY o_orderkey",
    "fn_math_suite" ->
      "SELECT p_partkey, round(abs(p_retailprice - 1000.0), 6) AS a, CAST(ceil(p_retailprice) AS BIGINT) AS c, CAST(floor(p_retailprice) AS BIGINT) AS f, round(pow(p_retailprice, 0.5), 6) AS pw, round(sqrt(CAST(p_size AS DOUBLE)), 6) AS sq, round(ln(p_retailprice), 6) AS l, round(log10(p_retailprice), 6) AS lg, p_partkey % 7 AS m, CAST(sign(p_retailprice - 1200.0) AS INTEGER) AS sg FROM part ORDER BY p_partkey",
    "fn_array_suite" ->
      "SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim, round(CAST(embedding[1] AS DOUBLE), 6) AS e1, round(CAST(embedding[2] AS DOUBLE), 6) AS e2, label FROM embeddings ORDER BY vec_id",
    "fn_conditional" ->
      "SELECT c_custkey, coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg, greatest(c_acctbal, 0.0) AS pos_bal, least(c_acctbal, 5000.0) AS capped, CASE WHEN nullif(c_acctbal, 0.0) IS NULL THEN 1 ELSE 0 END AS zero_flag FROM customer ORDER BY c_custkey",
  )
}
