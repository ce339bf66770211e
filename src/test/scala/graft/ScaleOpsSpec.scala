package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

/** Specs for the scale techniques: salted aggregation equivalence and
  * partitioned-layout pruning (the behaviors that matter at 100 TB,
  * exercised at fixture scale). */
class ScaleOpsSpec extends SparkTestBase {

  test("salted aggregation equals plain groupBy sum") {
    val li = Tables.load(spark, SF, "lineitem")
    val plain = li.groupBy(col("l_returnflag").as("key"))
      .agg(round(sum("l_quantity"), 6).as("sum_v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = ScaleOps.saltedSum(li, col("l_returnflag"), col("l_quantity"))
      .select(col("key"), round(col("sum_v"), 6).as("sum_v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == plain)
  }

  test("partitioned layout enables static partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val orders = Tables.load(spark, SF, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    val reread = ScaleOps.writePartitioned(orders, dir, "o_year")
    val pruned = reread.filter(col("o_year") === 1996)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
      s"expected partition pruning in:\n$plan")
    // pruning must not change results
    val expected = orders.filter(col("o_year") === 1996).count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("dynamic partition pruning fires on a selective dim join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val orders = Tables.load(spark, SF, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    val fact = ScaleOps.writePartitioned(orders, dir, "o_year")
    val dim = Seq((1996, "pick")).toDF("d_year", "tag")
    val joined = fact.join(dim, col("o_year") === col("d_year"))
    val plan = joined.queryExecution.executedPlan.toString
    val expected = orders.filter(col("o_year") === 1996).count()
    assert(joined.count() == expected)
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters"),
      s"expected DPP or partition filters in:\n$plan")
  }
}
