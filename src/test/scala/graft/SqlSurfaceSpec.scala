package graft

import org.apache.spark.sql.functions._

/** SQL table-management + registration surface: DDL, CTAS, INSERT, the
  * DataFrameWriterV2 API, and runtime UDF registration. */
class SqlSurfaceSpec extends SparkTestBase {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val dir = new java.io.File(s"spark-warehouse/$name")
    if (dir.exists()) {
      val walk = java.nio.file.Files.walk(dir.toPath)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("DDL + INSERT + CTAS round-trip through the session catalog") {
    dropTable("sql_ddl_demo"); dropTable("sql_ctas_demo")
    try {
      spark.sql("CREATE TABLE sql_ddl_demo (k BIGINT, v STRING) USING parquet")
      spark.sql("INSERT INTO sql_ddl_demo VALUES (1, 'a'), (2, 'b')")
      spark.sql("INSERT INTO sql_ddl_demo SELECT 3, 'c'")
      assert(spark.table("sql_ddl_demo").count() == 3)
      spark.sql("CREATE TABLE sql_ctas_demo USING parquet AS SELECT k, upper(v) AS v FROM sql_ddl_demo")
      val rows = spark.table("sql_ctas_demo").orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "A"), (2L, "B"), (3L, "C")))
    } finally { dropTable("sql_ddl_demo"); dropTable("sql_ctas_demo") }
  }

  test("DataFrameWriterV2 create, then v1 insertInto appends") {
    // the built-in session catalog is v1: writeTo().create() works (CTAS
    // path), but v2 append/replace need a v2 catalog — the append leg
    // goes through the classic insertInto
    dropTable("wv2_demo")
    try {
      Tables.load(spark, SF, "region")
        .writeTo("wv2_demo").using("parquet").create()
      assert(spark.table("wv2_demo").count() == 5)
      Tables.load(spark, SF, "region").filter(col("r_regionkey") < 2)
        .write.insertInto("wv2_demo")
      assert(spark.table("wv2_demo").count() == 7)
    } finally dropTable("wv2_demo")
  }

  test("runtime-registered UDF is SQL-callable") {
    spark.udf.register("graft_clip", (x: Double, lo: Double, hi: Double) =>
      math.max(lo, math.min(hi, x)))
    Tables.view(spark, SF, "customer")
    val n = spark.sql(
      "SELECT count(*) FROM customer WHERE graft_clip(c_acctbal, 0.0, 1000.0) = 1000.0")
      .head().getLong(0)
    val expected = Tables.load(spark, SF, "customer")
      .filter(col("c_acctbal") >= 1000.0).count()
    assert(n == expected)
  }
}
