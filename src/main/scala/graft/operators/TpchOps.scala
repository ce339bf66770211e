package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Classic TPC-H-shaped analytic queries adapted to the fixture schema
  * (no partsupp / l_shipmode / l_commitdate columns exist, so Q3/Q6/Q10/
  * Q14/Q18 are the shapes the star schema supports beyond the Q1/Q5 twins
  * already graded as agg_groupby_q1 / join_star_tpch).
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

  val queries: Map[String, Q] = Map(
    "tpch_q3_shipping" -> (tpchQ3Shipping _),
    "tpch_q6_revenue" -> (tpchQ6Revenue _),
    "tpch_q10_returns" -> (tpchQ10Returns _),
    "tpch_q14_promo" -> (tpchQ14Promo _),
    "tpch_q18_large" -> (tpchQ18Large _),
  )

  val oracles: Map[String, String] = Map(
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
  )
}
