package graft

import org.apache.spark.sql.AnalysisException

/** The SQL plug-in surface: GraftExtensions registers graft_dot at
  * session build (TestSpark uses GraftSession.builder, so the extension
  * is installed here exactly as for an end user). */
class GraftExtensionsSpec extends SparkTestBase {

  test("graft_dot is SQL-callable and matches the kernel") {
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head
    assert(r.getDouble(0) == 11.0)
  }

  test("graft_dot rejects wrong arity with an analysis error, not an index crash") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(e.getMessage.contains("graft_dot"), s"unhelpful message: ${e.getMessage}")
  }
}
