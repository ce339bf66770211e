package graft

import org.apache.spark.sql.functions._

/** Engine-surface behaviors with no query key: caching, range-partitioned
  * layout, and the catalog API. */
class EngineSurfaceSpec extends SparkTestBase {

  test("CANARY: JVM default locale lowercases like the DuckDB oracle") {
    // RegexTokenizer's toLowercase uses the JVM default locale; the J1/J2
    // DuckDB oracles use locale-free lower(). On a Turkish-locale JVM
    // "I".toLowerCase is dotless 'ı' and those grades silently mismatch —
    // fail here with the explanation instead (MlOps.tokenizer scaladoc).
    assert("I".toLowerCase == "i",
      s"JVM default locale ${java.util.Locale.getDefault} lowercases 'I' to " +
        s"'${"I".toLowerCase}' — the ml_tokenize/ml_stopwords oracles assume " +
        "locale-free lowercasing; run with -Duser.language=en or another " +
        "locale where toLowerCase('I') == 'i'")
  }

  test("driver flagship: SparkEntry.entry returns rows on sf0.001") {
    // the driver smoke-checks exactly this; covering it here means a
    // broken flagship fails in OUR suite before it fails in the driver
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("cache() serves repeat reads from InMemoryTableScan") {
    val df = Tables.load(spark, SF, "orders")
      .filter(col("o_totalprice") > 100000).cache()
    try {
      val n1 = df.count()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), s"expected cached scan in:\n$plan")
      assert(df.count() == n1)
    } finally df.unpersist()
  }

  test("repartitionByRange + sortWithinPartitions plans range partitioning") {
    val df = Tables.load(spark, SF, "orders")
      .repartitionByRange(4, col("o_custkey"))
      .sortWithinPartitions("o_custkey", "o_orderkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"expected range exchange in:\n$plan")
    // partition-local sort, not a global Sort node above the exchange
    assert(df.count() == Tables.load(spark, SF, "orders").count())
  }

  test("corrupt JSON: PERMISSIVE isolates bad records, FAILFAST raises") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badjson")
    java.nio.file.Files.write(dir.resolve("data.json"),
      "{\"id\": 1, \"v\": 10}\nTHIS IS NOT JSON\n{\"id\": 2, \"v\": 20}\n".getBytes("UTF-8"))
    val schema = "id BIGINT, v BIGINT, _corrupt_record STRING"
    val permissive = spark.read.schema(schema).json(dir.toString).cache()
    try {
      assert(permissive.count() == 3)
      assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 1)
      assert(permissive.filter(col("id").isNotNull).count() == 2)
    } finally permissive.unpersist()
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.schema("id BIGINT, v BIGINT").option("mode", "FAILFAST")
        .json(dir.toString).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      String.valueOf(e.getCause).toLowerCase.contains("malformed"))
  }

  test("Observation API collects pipeline metrics without an extra pass") {
    val obs = org.apache.spark.sql.Observation("qa")
    val df = Tables.load(spark, SF, "orders")
      .observe(obs, count(lit(1)).as("n"),
        sum(when(col("o_totalprice") > 400000, 1).otherwise(0)).as("n_big"))
      .filter(col("o_totalprice") > 0)
    val n = df.count()
    val metrics = obs.get
    assert(metrics("n") == n, s"observed ${metrics("n")} vs counted $n")
    val expectedBig = Tables.load(spark, SF, "orders")
      .filter(col("o_totalprice") > 400000).count()
    assert(metrics("n_big") == expectedBig)
  }

  test("catalog lists registered fixture views with their columns") {
    Tables.registerAll(spark, SF)
    val tables = spark.catalog.listTables().collect().map(_.name).toSet
    assert(Tables.all.toSet.subsetOf(tables), s"missing views: ${Tables.all.toSet -- tables}")
    val cols = spark.catalog.listColumns("lineitem").collect().map(_.name).toSet
    assert(Set("l_orderkey", "l_quantity", "l_returnflag").subsetOf(cols))
  }

  test("query registries merge without key collisions; every oracle key is runnable") {
    import graft.operators._
    // ++ on Map silently keeps the RIGHT entry on a key clash — a
    // duplicated key across two operator objects would shadow one
    // implementation and desync the oracle from what actually runs.
    val registries: Seq[(String, Set[String])] = Seq(
      "RelationalOps" -> RelationalOps.queries.keySet,
      "WindowOps" -> WindowOps.queries.keySet,
      "EventOps" -> EventOps.queries.keySet,
      "LlmOps" -> LlmOps.queries.keySet,
      "MlOps" -> MlOps.queries.keySet,
      "LlmTextOps" -> LlmTextOps.queries.keySet,
      "MultimodalOps" -> MultimodalOps.queries.keySet,
      "ExtendedOps" -> ExtendedOps.queries.keySet,
      "MinHashOps" -> MinHashOps.queries.keySet,
      "TableOps" -> TableOps.queries.keySet,
      "TpchOps" -> TpchOps.queries.keySet,
      "LlmCorpusOps" -> LlmCorpusOps.queries.keySet,
      "PqOps" -> PqOps.queries.keySet,
      "GraphOps" -> GraphOps.queries.keySet,
      "AdvancedOps" -> AdvancedOps.queries.keySet,
      "UnigramOps" -> UnigramOps.queries.keySet,
      "WordPieceOps" -> WordPieceOps.queries.keySet,
      "DataQualityOps" -> DataQualityOps.queries.keySet,
      "GeoOps" -> GeoOps.queries.keySet)
    val perRegistry = registries.map(_._2.size).sum
    assert(perRegistry == SparkEntry.queries.size,
      s"key collision across registries: ${
        registries.combinations(2).flatMap { case Seq((n1, k1), (n2, k2)) =>
          val inter = k1 & k2
          if (inter.nonEmpty) Some(s"$n1 ∩ $n2 = $inter") else None
        }.mkString("; ")}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a queries entry: $orphans")
  }
}
