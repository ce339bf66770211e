package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` has one entry per implemented operator (SURVEY.md §2 keys);
  * `oracleSql` carries the DuckDB-runnable twin for every entry whose
  * semantics are cross-engine deterministic (SURVEY.md §5.3).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.aggGroupbyQ1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalOps.queries ++ WindowOps.queries ++ EventOps.queries ++
      LlmOps.queries ++ MlOps.queries ++ LlmTextOps.queries ++
      MultimodalOps.queries ++ ExtendedOps.queries ++ MinHashOps.queries ++
      TableOps.queries ++ TpchOps.queries ++ LlmCorpusOps.queries ++
      PqOps.queries ++ GraphOps.queries ++ AdvancedOps.queries ++
      UnigramOps.queries ++ WordPieceOps.queries ++ DataQualityOps.queries ++
      GeoOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalOps.oracles ++ WindowOps.oracles ++ EventOps.oracles ++
      LlmOps.oracles ++ MlOps.oracles ++ LlmTextOps.oracles ++
      MultimodalOps.oracles ++ ExtendedOps.oracles ++ MinHashOps.oracles ++
      TableOps.oracles ++ TpchOps.oracles ++ LlmCorpusOps.oracles ++
      PqOps.oracles ++ GraphOps.oracles ++ AdvancedOps.oracles ++
      UnigramOps.oracles ++ WordPieceOps.oracles ++ DataQualityOps.oracles ++
      GeoOps.oracles
}
