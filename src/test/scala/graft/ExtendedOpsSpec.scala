package graft

import org.apache.spark.sql.functions._
import graft.operators.ExtendedOps

class ExtendedOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("scan_partitioned prunes at the partition level") {
    val df = ExtendedOps.scanPartitioned(spark, SF)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("l_returnflag"),
      s"no partition pruning in plan:\n$plan")
    // pruned read returns exactly the R rows of the source
    val expected = Tables.load(spark, SF, "lineitem")
      .filter(col("l_returnflag") === "R").count()
    assert(df.count() == expected)
  }

  test("scan_dpp: DynamicPruningExpression on the fact scan, partitions read < total") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = ExtendedOps.scanDpp(spark, SF)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // the partition filter must be DYNAMIC (runtime-fed by the dim scan),
    // not a statically-inferred IN-list
    val planStr = finalPlan.toString
    assert(planStr.contains("dynamicpruningexpression"),
      s"no DynamicPruningExpression in:\n$planStr")
    // runtime proof: the fact scan touched strictly fewer partitions than
    // the layout holds (region 0 = 5 of 25 nations). AQE wraps executed
    // stages in QueryStageExec leaves, so descend into them explicitly.
    def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case f: FileSourceScanExec => Seq(f)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
      }.flatten
    // match on the PARTITION column — column pruning (correctly) strips
    // c_custkey from the scan's output
    val scan = allScans(finalPlan)
      .find(_.output.exists(_.name == "c_nationkey"))
      .getOrElse(fail("no FileSourceScanExec over the partitioned fact"))
    val partsRead = scan.metrics("numPartitions").value
    val totalParts = new java.io.File(
      graft.TempDirs.cached("dppcust", SF)(_ => fail("dpp layout missing")))
      .listFiles().count(f => f.isDirectory && f.getName.startsWith("c_nationkey="))
    assert(partsRead > 0 && partsRead < totalParts,
      s"expected pruned read, got $partsRead of $totalParts partitions")
    // pruning must not change results
    val expected = Tables.load(spark, SF, "customer")
      .join(Tables.load(spark, SF, "nation").filter(col("n_regionkey") === 0),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == expected)
  }

  test("agg_topk_heap runs as 2-phase partial aggregation, not a window sort") {
    val plan = ExtendedOps.aggTopkHeap(spark, SF).queryExecution.executedPlan.toString
    // the bounded-heap claim rests on the PARTIAL ObjectHashAggregate
    // running before the custkey exchange; a Window node would mean the
    // whole input was shuffled and sorted instead
    assert(plan.contains("partial_topk"), s"no partial heap aggregation:\n$plan")
    assert(!plan.contains("Window"), s"top-k fell back to a window sort:\n$plan")
    // buffer bound holds end-to-end: no group emits more than k rows
    val maxPerGroup = ExtendedOps.aggTopkHeap(spark, SF)
      .groupBy("o_custkey").count().agg(max("count")).head.getLong(0)
    assert(maxPerGroup <= 3)
  }

  test("struct-ordered max_by breaks value ties deterministically on key") {
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 1.0)).toDF("k", "v")
    val out = df.agg(
      expr("max_by(k, struct(v, k))").as("best"),
      expr("min_by(k, struct(v, k))").as("worst")).head()
    assert(out.getAs[Long]("best") == 2L, "tie on v must resolve to larger k")
    assert(out.getAs[Long]("worst") == 3L)
  }

  test("unpivot conserves rows and values") {
    val wide = ExtendedOps.unpivotMelt(spark, SF)
    val nParts = Tables.load(spark, SF, "part").count()
    assert(wide.count() == 2 * nParts)
    val bySide = wide.groupBy("metric").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySide == Map("size" -> nParts, "retail" -> nParts))
  }

  test("map suite: construction, parsing, lookup, concat") {
    val rows = ExtendedOps.fnMapSuite(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("m_keys") == "seg,key")
      assert(r.getAs[String]("sm_id") == r.getAs[Long]("c_custkey").toString)
      assert(r.getAs[Int]("n_entries") == 3)
      assert(r.getAs[String]("m_seg") != null)
    }
  }

  test("typed pipeline matches the untyped aggregation") {
    import org.apache.spark.sql.functions._
    val typed = ExtendedOps.typedPipeline(spark, SF)
    val untyped = Tables.load(spark, SF, "orders")
      .filter(col("o_totalprice") > 100000.0)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_big"))
    assert(typed.count() == untyped.count())
    assert(typed.agg(sum("n_big")).head().getLong(0) ==
      untyped.agg(sum("n_big")).head().getLong(0))
  }

  test("higher-order suite matches a hand-computed row") {
    val row = ExtendedOps.fnHigherOrder(spark, SF).head()
    val first = Tables.load(spark, SF, "embeddings").orderBy("vec_id").head()
    val vec = first.getSeq[Float](first.fieldIndex("embedding")).map(_.toDouble)
    val ssq = BigDecimal(vec.map(x => x * x).sum)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("ssq") - ssq) <= 1e-4)
    assert(row.getAs[Int]("n_pos") == vec.count(_ > 0))
  }
}
