package graft

import org.apache.spark.sql.AnalysisException

/** The SQL plug-in surface: GraftExtensions registers graft_dot at
  * session build (TestSpark uses GraftSession.builder, so the extension
  * is installed here exactly as for an end user). */
class GraftExtensionsSpec extends SparkTestBase {

  test("graft_dot is SQL-callable and matches the kernel") {
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("graft_dot rejects wrong arity with an analysis error, not an index crash") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(e.getMessage.contains("graft_dot"), s"unhelpful message: ${e.getMessage}")
  }

  test("graft_hashed_shingles is SQL-callable and matches the md5-prefix composition") {
    val r = spark.sql(
      "SELECT graft_hashed_shingles(split('a b c d', ' '), 3) AS ids, " +
        "transform(transform(sequence(1, 2), i -> concat_ws(' ', slice(split('a b c d', ' '), i, 3))), " +
        "s -> cast(conv(substring(md5(cast(s as binary)), 1, 15), 16, 10) as bigint)) AS expect").head()
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("graft_hashed_shingles rejects a non-literal width with an analysis error") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT graft_hashed_shingles(split('a b c', ' '), cast(rand() * 3 as int))").collect()
    }
    assert(e.getMessage.contains("graft_hashed_shingles"), s"unhelpful message: ${e.getMessage}")
  }

  test("RedundantRoundRule drops a finer outer round and keeps an unsafe one") {
    import org.apache.spark.sql.functions._
    val df = Tables.load(spark, SF, "customer")
    def nRounds(p: org.apache.spark.sql.DataFrame): Int =
      "round\\(".r.findAllIn(p.queryExecution.optimizedPlan.toString.toLowerCase).length
    val redundant = df.select(round(round(col("c_acctbal") / 3.0, 2), 4).as("x"))
    assert(nRounds(redundant) == 1, s"outer round(.,4) over round(.,2) must fold:\n${redundant.queryExecution.optimizedPlan}")
    val unsafe = df.select(round(round(col("c_acctbal") / 3.0, 4), 2).as("x"))
    assert(nRounds(unsafe) == 2, "coarser outer round is double-rounding; must NOT fold")
    // semantics: the folded plan equals the unoptimized composition
    // (sorted — two separate collects carry no row-order guarantee)
    val a = redundant.collect().map(_.getDouble(0)).sorted
    val b = df.select(round(col("c_acctbal") / 3.0, 2).as("x")).collect().map(_.getDouble(0)).sorted
    assert(a.sameElements(b))
  }
}
