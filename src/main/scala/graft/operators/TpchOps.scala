package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Classic TPC-H-shaped analytic queries adapted to the fixture schema.
  * With the Q2/Q9/Q11/Q16/Q20 adaptations below, all 22 TPC-H query
  * SHAPES are graded (Q1/Q5's twins live as agg_groupby_q1 /
  * join_star_tpch). The fixture has no partsupp table, l_shipmode, or
  * l_commitdate: the five partsupp-dependent queries derive the
  * supplier-part relationship from lineitem itself — distinct
  * (l_partkey, l_suppkey) pairs, with the minimum observed unit price
  * (l_extendedprice / l_quantity, money-rounded) standing in for
  * ps_supplycost and shipped quantity standing in for ps_availqty.
  * Each adaptation keeps the ORIGINAL query's plan shape (correlated
  * min subquery, scalar-threshold, NOT-IN exclusion, nested semi join)
  * so the optimizer exercises are the real ones.
  *
  * Scale posture: all five are the canonical warehouse patterns —
  * selective scans feed partial aggregation before any join where
  * possible, dimension sides broadcast, fact-fact joins shuffle on the
  * join key, and every top-k is a TakeOrderedAndProject (never a global
  * sort). Predicates sit directly on scan columns so parquet row-group
  * stats prune I/O (PushedFilters asserted in ScaleOpsSpec for the same
  * scan paths).
  */
object TpchOps {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  private def revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Q3 shipping priority: top-10 unshipped-revenue orders in the BUILDING
    * segment. Filters reach all three scans before the joins. */
  def tpchQ3Shipping(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(t(s, d, "orders").filter(col("o_orderdate") < lit("1998-03-15")),
        col("c_custkey") === col("o_custkey"))
      .join(t(s, d, "lineitem").filter(col("l_shipdate") > lit("1998-03-15")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(revenue), 2).as("rev"))
      .orderBy(col("rev").desc, col("l_orderkey"))
      .limit(10)

  /** Q6 revenue forecast: one selective scan, one global agg — the purest
    * pushdown exercise (predicates on three scan columns, zero joins). */
  def tpchQ6Revenue(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("rev"))

  /** Q10 returned items: top-20 customers by returned-lineitem revenue in
    * a quarter; nation broadcasts as a true dimension. */
  def tpchQ10Returns(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_orderdate") >= lit("1996-10-01") &&
          col("o_orderdate") < lit("1997-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(t(s, d, "lineitem").filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(round(sum(revenue), 2).as("rev"))
      .orderBy(col("rev").desc, col("c_custkey"))
      .limit(20)

  /** Q14 promo revenue share for one ship-month. The part side carries
    * only (p_partkey, p_type) into the join — column pruning keeps the
    * build side narrow enough to broadcast at any scale where part is a
    * true dimension. */
  def tpchQ14Promo(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-09-01") && col("l_shipdate") < lit("1996-10-01"))
      .join(broadcast(t(s, d, "part").select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO", revenue).otherwise(lit(0.0))) /
        sum(revenue), 4).as("promo_pct"))

  /** Q18 large-volume orders: orders whose lineitem quantity total exceeds
    * 300, with their customer. The HAVING aggregation runs FIRST on
    * lineitem alone (fact-side reduction before any join — at 100 TB this
    * is the difference between joining 600 M rows and joining the few
    * thousand qualifying orders). */
  def tpchQ18Large(s: SparkSession, d: String): DataFrame = {
    // filter on the RAW sum (matching the oracle's HAVING), round only for
    // output — filtering on the rounded value would disagree with the
    // oracle for totals in (300, 300.005)
    val big = t(s, d, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("raw_qty"))
      .filter(col("raw_qty") > 300)
      .select(col("l_orderkey"), round(col("raw_qty"), 2).as("total_qty"))
    big.join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q4 order-priority check: EXISTS rewritten as a LEFT SEMI join — the
    * probe (orders) is date-pruned at the scan and the semi join never
    * materializes lineitem columns, so the shuffle carries only
    * l_orderkey. (Fixture has no l_commitdate/l_receiptdate; the EXISTS
    * predicate is adapted to returned lineitems.) */
  def tpchQ4Priority(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01") && col("o_orderdate") < lit("1996-10-01"))
      .join(t(s, d, "lineitem").filter(col("l_returnflag") === "R").select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** Q7 volume shipping between two nations: both endpoint dimensions are
    * pre-filtered to the nation pair BEFORE touching the facts, so the
    * supplier/customer sides broadcast; the only big shuffle is the
    * lineitem↔orders fact join. Same-nation pairs drop in a post-filter. */
  def tpchQ7Volume(s: SparkSession, d: String): DataFrame = {
    val pair = Seq("NATION_3", "NATION_7")
    val nations = t(s, d, "nation").filter(col("n_name").isin(pair: _*))
    val supp = t(s, d, "supplier")
      .join(broadcast(nations.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    val cust = t(s, d, "customer")
      .join(broadcast(nations.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cnk"))
      .select("c_custkey", "cust_nation")
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1998-01-01"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(revenue), 2).as("rev"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q8 national market share: NATION_2's share of PROMO-part revenue sold
    * into ASIA-region customers, by order year. part/supplier/nation/region
    * all broadcast (true dimensions); the single shuffle is lineitem↔orders.
    * The share is a conditional-sum ratio inside one aggregation — no
    * second pass over the facts. */
  def tpchQ8Share(s: SparkSession, d: String): DataFrame = {
    val asiaNations = t(s, d, "nation")
      .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cnk"))
    val suppNation = t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation").select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part").filter(col("p_type") === "PROMO").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer").select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("cnk"), "left_semi")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_2", revenue).otherwise(lit(0.0))) / sum(revenue),
        4).as("mkt_share"))
      .orderBy("o_year")
  }

  /** Q13 customer order-count distribution: left join preserves never-
    * ordered customers, then a two-level aggregation. The second groupBy
    * keys on the (tiny-cardinality) count — at 100 TB the first agg does
    * the heavy reduction and the second is a near-free re-shuffle of one
    * row per customer. */
  def tpchQ13Custdist(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select("c_custkey")
      .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Q15 top supplier: quarterly revenue per supplier, keep the max-revenue
    * supplier(s) via a broadcast scalar (one extra row, not a second fact
    * pass — the rev aggregate is reused for both the ranking and the
    * output). Revenue is rounded BEFORE the max compare on both engines so
    * the tie semantics are identical. */
  def tpchQ15Top(s: SparkSession, d: String): DataFrame = {
    val rev = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .groupBy("l_suppkey")
      .agg(round(sum(revenue), 2).as("total_rev"))
    rev.crossJoin(broadcast(rev.agg(max(col("total_rev")).as("mx"))))
      .filter(col("total_rev") === col("mx"))
      .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy("s_suppkey")
  }

  /** Q17 small-quantity-order revenue: the correlated per-part average is
    * decorrelated into one aggregate over the ALREADY brand-filtered
    * lineitem subset (the correlation key is the part, so filtering by
    * brand first is semantics-preserving and shrinks the agg input by
    * ~25×). Quantities are integral in the fixtures, so 0.2*avg is
    * bit-identical across engines and the `<` boundary is deterministic. */
  def tpchQ17SmallQty(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part").filter(col("p_brand") === "Brand#3").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .select("p_partkey", "l_quantity", "l_extendedprice")
    val lim = li.groupBy(col("p_partkey").as("ak"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_lim"))
    li.join(broadcast(lim), col("p_partkey") === col("ak"))
      .filter(col("l_quantity") < col("qty_lim"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** Q19 disjunctive brand/size/quantity predicates: the OR-of-ANDs sits
    * on the joined row, but the part-only conjuncts (brand, size) are
    * extracted by Catalyst into a pushed-down scan filter on the broadcast
    * side — the fixture-schema version of Q19's "discounted revenue"
    * predicate-pushdown exercise. */
  def tpchQ19Disjunct(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#4" && col("p_size").between(1, 35) && col("l_quantity").between(20, 30)))
      .agg(round(sum(revenue), 2).as("rev"))

  /** Q22 idle high-balance customers: global-average scalar broadcast +
    * anti join against recent orders (customers with no order since 1999 —
    * the fixtures have no fully order-less customers), grouped by market
    * segment (the fixture's stand-in for Q22's phone country code). The
    * anti join shuffles only (c_custkey, o_custkey) key columns, and the
    * date predicate prunes the orders scan before the shuffle. */
  def tpchQ22Idle(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer")
    val avgBal = cust.filter(col("c_acctbal") > 0.0).agg(avg(col("c_acctbal")).as("ab"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1999-01-01")).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"), round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** Q12 shipping-mode priority mix, adapted: the fixture has no
    * l_shipmode/l_commitdate/l_receiptdate, so "late" is shipped > 90 days
    * after the order date and l_returnflag stands in for the mode key.
    * The ship-year predicate prunes the lineitem scan; the lateness
    * predicate needs the joined row, so it runs post-join — but it only
    * gates the conditional counts, never widens the shuffle (both join
    * sides are pre-projected to the 3–4 columns the query touches). */
  def tpchQ12Late(s: SparkSession, d: String): DataFrame = {
    val highPri = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .select("l_orderkey", "l_returnflag", "l_shipdate")
      .join(t(s, d, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 90)
      .groupBy("l_returnflag")
      .agg(
        sum(when(highPri, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(highPri, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** Q21 suppliers-who-kept-orders-waiting, adapted to the fixture columns
    * (lateness as in [[tpchQ12Late]]): count, per supplier, the
    * multi-supplier orders where that supplier was the ONLY late one.
    * The classic EXISTS + NOT-EXISTS double self-join collapses into ONE
    * aggregation to per-(order, supplier) grain plus ONE window over the
    * order key: n_supp/n_late ride the same partitioning, so the fact
    * side is shuffled twice total (groupBy, window) instead of the four
    * passes the literal SQL shape implies — at 100 TB the window reuses
    * the exchange the groupBy's output already has modulo the suppkey
    * column, and no branch rescans lineitem. */
  def tpchQ21Waiting(s: SparkSession, d: String): DataFrame = {
    // r15: ONE exchange instead of two. The pair aggregation used to hash
    // on (l_orderkey, l_suppkey) and the window then re-exchanged on
    // l_orderkey (HashPartitioning(k1,k2) does NOT satisfy
    // ClusteredDistribution(k1)). Repartitioning by l_orderkey FIRST
    // satisfies both the aggregation's (orderkey, suppkey) clustering
    // (subset key) and the window's — the fact rows cross the network
    // once. No explicit partition count: the session's shuffle-partition
    // conf + AQE coalescing stay in charge.
    val flagged = t(s, d, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .repartition(col("l_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(datediff(col("l_shipdate"), col("o_orderdate")) > 90, 1).otherwise(0))
        .as("supp_late"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
    flagged
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum("supp_late").over(w))
      .filter(col("supp_late") === 1 && col("n_supp") > 1 && col("n_late") === 1)
      .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Q2 minimum-cost supplier, adapted: supply cost per (part, supplier)
    * is the minimum unit price ever charged (money-rounded with the
    * floor(x*100+0.5) discipline so both engines agree on .xx5
    * boundaries). The correlated "= min cost over that part's European
    * suppliers" subquery is decorrelated into a window min over the
    * already-reduced pair table. Scale order matters: the 41 size-15
    * parts broadcast-semi-prune lineitem BEFORE the pair aggregation
    * (correlation is per part, so pre-filtering is semantics-preserving
    * and shrinks the shuffle ~50×), and the European supplier dimension
    * broadcasts. */
  def tpchQ2MinCost(s: SparkSession, d: String): DataFrame = {
    val sized = t(s, d, "part").filter(col("p_size") === 15).select("p_partkey", "p_name")
    val eu = t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation")
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val ps = t(s, d, "lineitem")
      .join(broadcast(sized.select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg((floor(min(col("l_extendedprice") / col("l_quantity")) * 100 + 0.5) / 100)
        .as("supp_cost"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    ps.join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
      .withColumn("min_cost", min("supp_cost").over(w))
      .filter(col("supp_cost") === col("min_cost"))
      .join(broadcast(sized), col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("supp_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** Q9 product-type profit, adapted: with no ps_supplycost, the cost
    * model is 0.6 × p_retailprice × quantity (deterministic, part-derived,
    * so the profit expression needs no extra join). part (LIKE-filtered)
    * and supplier→nation broadcast; the only shuffle joins the pruned
    * lineitem to orders for the order year.
    *
    * The profit sum runs in DECIMAL, not double: the subtraction makes
    * this the one headline aggregate whose true total actually landed on
    * a .xx5 cent boundary at sf0.01, where double summation order (32
    * partials here vs one stream in the oracle) flips the rounded cent.
    * The inputs are fixed-point by construction (money 2 dp, discount
    * 2 dp, retail 1 dp, integral quantity), so decimal aggregation is
    * exact and order-independent on both engines — same cast widths on
    * both sides, double only at the output boundary. */
  def tpchQ9Profit(s: SparkSession, d: String): DataFrame = {
    val suppNation = t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val profitRow =
      col("l_extendedprice").cast("decimal(14,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")) -
      lit(0.6).cast("decimal(2,1)") *
        col("p_retailprice").cast("decimal(8,1)") * col("l_quantity").cast("decimal(4,0)")
    t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part").filter(col("p_name").like("%gear%"))
          .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(profitRow), 2).cast("double").as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Q11 important stock, adapted: "inventory value" per part held by one
    * nation's suppliers is shipped quantity × retail price; keep parts
    * whose value exceeds 3× the nation's AVERAGE part value (Q11's
    * scalar-subquery threshold shape, but average-relative instead of
    * the spec's fraction-of-total — the spec itself divides its fraction
    * by SF because fraction-of-total yields 0 rows the moment the part
    * count grows; the average form is scale-free, 19 rows at sf0.01 and
    * 194 at sf0.1). The nation's suppliers (~4 rows) semi-prune lineitem
    * before the per-part aggregation; the threshold re-aggregates the
    * SAME per-part result (one extra reduction row, never a second fact
    * pass) and broadcasts. Raw doubles feed the threshold compare on
    * both engines; rounding is output-only. */
  def tpchQ11Stock(s: SparkSession, d: String): DataFrame = {
    val natSupp = t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_5")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val perPart = t(s, d, "lineitem")
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .join(broadcast(t(s, d, "part").select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey")
      .agg(sum(col("l_quantity") * col("p_retailprice")).as("v"))
    perPart.crossJoin(broadcast(perPart.agg((avg("v") * 3.0).as("threshold"))))
      .filter(col("v") > col("threshold"))
      .select(col("l_partkey").as("p_partkey"), round(col("v"), 2).as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** Q16 parts/supplier relationship, adapted: distinct supplier-part
    * pairs come from lineitem, the "customer complaints" NOT-IN exclusion
    * becomes negative-balance suppliers (a broadcast anti join — NOT IN
    * is safe to plan as anti here because s_suppkey is never null), and
    * the count-distinct-suppliers per (brand, type, size) group runs on
    * the part-filtered pairs. The pair distinct is the one fact shuffle;
    * everything else broadcasts. */
  def tpchQ16SuppCnt(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(t(s, d, "supplier").filter(col("s_acctbal") < 0).select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(t(s, d, "part")
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
          .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))

  /** Q20 potential part promotion, adapted: with no ps_availqty, "surplus
    * stock" becomes shipment dominance — European suppliers who shipped
    * MORE THAN HALF of a small-part's total 1996 volume. The nested
    * IN-subqueries of the original collapse to one aggregation to
    * (part, supplier) grain plus one window total per part (the window
    * reuses the aggregation's data with a single partkey re-shuffle, vs
    * the two extra fact passes the literal SQL implies), then a semi join
    * into the 100-row supplier dimension. */
  def tpchQ20Promo(s: SparkSession, d: String): DataFrame = {
    val shipped = t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .join(broadcast(t(s, d, "part").filter(col("p_name").like("small%")).select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum("l_quantity").as("qty"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    val dominant = shipped
      .withColumn("total_qty", sum("qty").over(w))
      .filter(col("qty") > lit(0.5) * col("total_qty"))
      .select("l_suppkey")
    t(s, d, "supplier")
      .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(t(s, d, "nation")
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  val queries: Map[String, Q] = Map(
    "tpch_q2_mincost" -> (tpchQ2MinCost _),
    "tpch_q9_profit" -> (tpchQ9Profit _),
    "tpch_q11_stock" -> (tpchQ11Stock _),
    "tpch_q16_suppcnt" -> (tpchQ16SuppCnt _),
    "tpch_q20_promo" -> (tpchQ20Promo _),
    "tpch_q3_shipping" -> (tpchQ3Shipping _),
    "tpch_q12_late" -> (tpchQ12Late _),
    "tpch_q21_waiting" -> (tpchQ21Waiting _),
    "tpch_q4_priority" -> (tpchQ4Priority _),
    "tpch_q6_revenue" -> (tpchQ6Revenue _),
    "tpch_q7_volume" -> (tpchQ7Volume _),
    "tpch_q8_share" -> (tpchQ8Share _),
    "tpch_q10_returns" -> (tpchQ10Returns _),
    "tpch_q13_custdist" -> (tpchQ13Custdist _),
    "tpch_q14_promo" -> (tpchQ14Promo _),
    "tpch_q15_top" -> (tpchQ15Top _),
    "tpch_q17_smallqty" -> (tpchQ17SmallQty _),
    "tpch_q18_large" -> (tpchQ18Large _),
    "tpch_q19_disjunct" -> (tpchQ19Disjunct _),
    "tpch_q22_idle" -> (tpchQ22Idle _),
  )

  val oracles: Map[String, String] = Map(
    "tpch_q2_mincost" ->
      ("WITH ps AS (SELECT l_partkey, l_suppkey, floor(min(l_extendedprice / l_quantity)*100 + 0.5)/100 AS supp_cost " +
        "FROM lineitem GROUP BY 1, 2), " +
        "eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE') " +
        "SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supp_cost " +
        "FROM ps JOIN eu ON l_suppkey = s_suppkey JOIN part ON p_partkey = l_partkey " +
        "WHERE p_size = 15 AND supp_cost = (SELECT min(ps2.supp_cost) FROM ps ps2 " +
        "JOIN eu eu2 ON ps2.l_suppkey = eu2.s_suppkey WHERE ps2.l_partkey = p_partkey) " +
        "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"),
    "tpch_q9_profit" ->
      ("SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year, " +
        "CAST(round(sum(" +
        "CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) " +
        "- CAST(0.6 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(8,1)) * CAST(l_quantity AS DECIMAL(4,0))" +
        "), 2) AS DOUBLE) AS profit " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey JOIN supplier ON s_suppkey = l_suppkey " +
        "JOIN orders ON o_orderkey = l_orderkey JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE p_name LIKE '%gear%' GROUP BY 1, 2 ORDER BY 1, 2 DESC"),
    "tpch_q11_stock" ->
      ("WITH val AS (SELECT l_partkey, sum(l_quantity * p_retailprice) AS v " +
        "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN part ON p_partkey = l_partkey WHERE n_name = 'NATION_5' GROUP BY 1) " +
        "SELECT l_partkey AS p_partkey, round(v, 2) AS value FROM val " +
        "WHERE v > (SELECT avg(v) * 3.0 FROM val) ORDER BY value DESC, p_partkey"),
    "tpch_q16_suppcnt" ->
      ("SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt " +
        "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps " +
        "JOIN part ON p_partkey = l_partkey " +
        "WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' AND p_size IN (1, 4, 9, 16, 25, 36, 49) " +
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
        "GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"),
    "tpch_q20_promo" ->
      ("WITH shipped AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE p_name LIKE 'small%' AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY 1, 2), " +
        "tot AS (SELECT l_partkey, sum(qty) AS total_qty FROM shipped GROUP BY 1) " +
        "SELECT s_suppkey, s_name, n_name FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'EUROPE' AND s_suppkey IN " +
        "(SELECT l_suppkey FROM shipped JOIN tot USING (l_partkey) WHERE qty > 0.5 * total_qty) " +
        "ORDER BY s_suppkey"),
    "tpch_q12_late" ->
      ("SELECT l_returnflag, " +
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND date_diff('day', o_orderdate, l_shipdate) > 90 " +
        "GROUP BY 1 ORDER BY 1"),
    "tpch_q21_waiting" ->
      ("WITH flagged AS (" +
        "SELECT l_orderkey, l_suppkey, " +
        "max(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90 THEN 1 ELSE 0 END) AS supp_late " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2), " +
        "per_order AS (SELECT l_orderkey, count(*) AS n_supp, sum(supp_late) AS n_late FROM flagged GROUP BY 1) " +
        "SELECT s_name, count(*) AS numwait " +
        "FROM flagged JOIN per_order USING (l_orderkey) JOIN supplier ON s_suppkey = l_suppkey " +
        "WHERE supp_late = 1 AND n_supp > 1 AND n_late = 1 " +
        "GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20"),
    "tpch_q3_shipping" ->
      ("SELECT l_orderkey, o_orderdate, o_orderpriority, round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev " +
        "FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15' " +
        "GROUP BY 1, 2, 3 ORDER BY rev DESC, l_orderkey LIMIT 10"),
    "tpch_q6_revenue" ->
      ("SELECT round(sum(l_extendedprice * l_discount), 2) AS rev FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24"),
    "tpch_q10_returns" ->
      ("SELECT c_custkey, c_name, n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev " +
        "FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY 1, 2, 3 ORDER BY rev DESC, c_custkey LIMIT 20"),
    "tpch_q14_promo" ->
      ("SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) " +
        "/ sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'"),
    "tpch_q18_large" ->
      ("WITH big AS (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) " +
        "SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty " +
        "FROM big JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey " +
        "ORDER BY total_qty DESC, o_orderkey LIMIT 100"),
    "tpch_q4_priority" ->
      ("SELECT o_orderpriority, count(*) AS order_count FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01' " +
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') " +
        "GROUP BY 1 ORDER BY 1"),
    "tpch_q7_volume" ->
      ("SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, CAST(year(l_shipdate) AS INTEGER) AS l_year, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev " +
        "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN customer ON c_custkey = o_custkey " +
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "AND n1.n_name IN ('NATION_3', 'NATION_7') AND n2.n_name IN ('NATION_3', 'NATION_7') " +
        "AND n1.n_name <> n2.n_name " +
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
    "tpch_q8_share" ->
      ("SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, " +
        "round(sum(CASE WHEN n2.n_name = 'NATION_2' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) " +
        "/ sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey JOIN supplier ON s_suppkey = l_suppkey " +
        "JOIN orders ON o_orderkey = l_orderkey JOIN customer ON c_custkey = o_custkey " +
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey JOIN region ON n1.n_regionkey = r_regionkey " +
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
        "WHERE p_type = 'PROMO' AND r_name = 'ASIA' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY 1 ORDER BY 1"),
    "tpch_q13_custdist" ->
      ("SELECT c_count, count(*) AS custdist FROM (" +
        "SELECT c_custkey, count(o_orderkey) AS c_count FROM customer " +
        "LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey) " +
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),
    "tpch_q15_top" ->
      ("WITH rev AS (SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01' " +
        "GROUP BY l_suppkey) " +
        "SELECT s_suppkey, s_name, total_rev FROM supplier JOIN rev ON s_suppkey = l_suppkey " +
        "WHERE total_rev = (SELECT max(total_rev) FROM rev) ORDER BY s_suppkey"),
    "tpch_q17_smallqty" ->
      ("SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE p_brand = 'Brand#3' " +
        "AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"),
    "tpch_q19_disjunct" ->
      ("SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) " +
        "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20) " +
        "OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"),
    "tpch_q22_idle" ->
      ("SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal " +
        "FROM customer WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0) " +
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01') " +
        "GROUP BY 1 ORDER BY 1"),
  )
}
