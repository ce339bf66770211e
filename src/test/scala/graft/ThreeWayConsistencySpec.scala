package graft

/** SURVEY.md §3.2's free three-way check: for oracle SQL that is ANSI
  * enough to run on Spark too, the DataFrame-API result must equal
  * spark.sql(oracle) — so the DuckDB hash-match transitively covers the
  * SQL entry point as well. (Dialect-specific oracles — epoch_us,
  * list_*, '//', FILTER — are excluded; they test DuckDB's spelling,
  * not this engine.) */
class ThreeWayConsistencySpec extends SparkTestBase {

  private val portableKeys = Seq(
    "filter_combo", "join_inner_equi", "join_semi", "join_anti",
    "agg_groupby_q1", "agg_count_distinct", "case_bucketing",
    "set_union_distinct", "set_intersect", "set_except", "topk_limit",
    "sub_in_uncorr", "sub_scalar_corr", "sub_exists_corr",
    "sub_not_exists", "agg_bitmap_distinct", "join_lateral",
    "tpch_q3_shipping", "tpch_q6_revenue", "tpch_q10_returns",
    "tpch_q14_promo", "tpch_q18_large")

  test("DataFrame plans and spark.sql(oracle text) agree row-for-row") {
    Tables.registerAll(spark, SF)
    portableKeys.foreach { key =>
      val viaApi = SparkEntry.queries(key)(spark, SF).collect().map(_.toString).toSeq
      val viaSql = spark.sql(SparkEntry.oracleSql(key)).collect().map(_.toString).toSeq
      assert(viaApi == viaSql, s"$key: API vs SQL divergence")
    }
  }
}
