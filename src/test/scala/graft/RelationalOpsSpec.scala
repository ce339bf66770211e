package graft

import org.apache.spark.sql.functions._
import graft.operators.RelationalOps

class RelationalOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("fuzzy join's length precondition fails loudly on a mixed-length corpus") {
    // a 17-char name equal to an 18-char name with char 17 deleted is a
    // lev-1 pair NEITHER blocking pass can produce — the guard must trip
    // rather than silently miss it
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzylen").toString
    Seq((1L, "Customer#000000001"), (2L, "Customer#00000001"))
      .toDF("c_custkey", "c_name")
      .write.parquet(s"$dir/customer.parquet")
    // the guard lives IN the blocking-key expression (raise_error), so
    // it trips at execution — the builder itself stays declarative.
    // Exception class varies with WHERE the expression runs (executor
    // task failure wraps in SparkException; a driver-side/broadcast
    // evaluation throws SparkRuntimeException directly, which run order
    // across suites can flip) — the contract is the MESSAGE, not the
    // wrapper.
    val e = intercept[Exception] {
      RelationalOps.fuzzyJoinBlocked(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("18-char")), messages(e).mkString(" | "))
  }

  test("fuzzy join IGNORES null names instead of aborting with the length message") {
    // length(null) === 18 is null, so without an explicit null branch the
    // guard's `otherwise` fired raise_error on a merely-absent name; the
    // contract (matching the old driver-side require) is that null names
    // simply produce no pairs
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzynull").toString
    Seq((1L, "Customer#000000001"), (2L, null), (3L, "Customer#000000002"))
      .toDF("c_custkey", "c_name")
      .write.parquet(s"$dir/customer.parquet")
    val rows = RelationalOps.fuzzyJoinBlocked(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSet == Set((1L, 3L)), s"expected only the 1-3 pair: ${rows.mkString(", ")}")
  }

  test("decimal Q1: sums run in exact decimal and agree with the double path to the cent") {
    val dec = RelationalOps.aggGroupbyQ1Decimal(spark, SF).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val dbl = RelationalOps.aggGroupbyQ1(spark, SF).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(dec.keySet == dbl.keySet && dec.nonEmpty)
    // double accumulation error at fixture scale is far below a cent, so
    // the exact-decimal answer must round to the same 2-dp values
    dec.foreach { case (k, (a1, a2, a3, a4)) =>
      val (b1, b2, b3, b4) = dbl(k)
      Seq(a1 - b1, a2 - b2, a3 - b3, a4 - b4).foreach(d =>
        assert(math.abs(d) < 0.011, s"$k drifted by $d"))
    }
    // and the aggregation really is decimal: every pricing sum's input
    // is DecimalType (not a double that was cast after the fact)
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val agg = RelationalOps.aggGroupbyQ1Decimal(spark, SF)
      .queryExecution.analyzed.collectFirst { case a: Aggregate => a }.get
    val sumInputs = agg.aggregateExpressions.flatMap(_.collect {
      case s: org.apache.spark.sql.catalyst.expressions.aggregate.Sum => s.child.dataType
    })
    assert(sumInputs.nonEmpty &&
      sumInputs.forall(_.isInstanceOf[org.apache.spark.sql.types.DecimalType]),
      s"non-decimal sum inputs: $sumInputs")
  }

  test("fuzzy join emits a duplicate-name (lev 0) pair exactly ONCE") {
    // identical names match BOTH pass keys; the differ-at-17 filter on
    // pass A keeps the passes a true partition of the qualifying pairs
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzydup").toString
    Seq((1L, "Customer#000000001"), (2L, "Customer#000000001"), // exact dup
        (3L, "Customer#000000091"), // differs from #1 at pos 17 only
        (4L, "Customer#000000002")) // differs from #1 at pos 18 only
      .toDF("c_custkey", "c_name")
      .write.parquet(s"$dir/customer.parquet")
    val rows = RelationalOps.fuzzyJoinBlocked(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue))
    assert(rows.count { case (a, b, _) => (a, b) == (1L, 2L) } == 1,
      s"lev-0 pair must appear exactly once: ${rows.mkString(", ")}")
    assert(rows.toSet == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1),
      (1L, 4L, 1), (2L, 4L, 1)),
      s"qualifying pairs wrong: ${rows.sorted.mkString(", ")}")
  }

  test("datasketches HLL estimate within 5% of exact distinct counts") {
    import org.apache.spark.sql.functions._
    val est = RelationalOps.aggHllSketch(spark, SF).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, SF, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(est(k) - v) <= math.max(1, v * 0.05), s"flag $k: est ${est(k)} vs $v")
    }
  }

  test("HLL union-merge of per-group sketches estimates the GLOBAL distinct within 5%") {
    val row = RelationalOps.aggHllMerge(spark, SF).collect().head
    assert(row.getLong(row.fieldIndex("n_sketches")) == 3L)
    val est = row.getLong(row.fieldIndex("global_nd"))
    val exact = Tables.load(spark, SF, "lineitem")
      .agg(countDistinct("l_partkey")).collect().head.getLong(0)
    assert(math.abs(est - exact) <= math.max(1, exact * 0.05),
      s"merged estimate $est vs exact $exact")
  }

  test("portable HLL (graded agg_approx_hll): within 5% of exact per group") {
    val approx = RelationalOps.aggApproxHll(spark, SF).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, SF, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, nd) =>
      assert(math.abs(approx(k).toDouble - nd) / nd <= 0.05, s"group $k: ${approx(k)} vs $nd")
    }
  }

  test("portable HLL merge invariant: register-max merge == direct global sketch, bit-for-bit") {
    // The defining HLL property: union of per-group sketches must equal
    // the sketch of the unsplit data EXACTLY (max is associative), not
    // just approximately — this is what makes cross-day/cross-partition
    // merging lossless at 100 TB.
    val merged = RelationalOps.aggHllMerge(spark, SF).collect().head
    val direct = RelationalOps.aggApproxHll(
        spark, SF) // per-flag; rebuild the global sketch from raw rows
    val global = {
      import org.apache.spark.sql.functions._
      val li = Tables.load(spark, SF, "lineitem").withColumn("one", lit("g"))
      // reuse the graded path's register/estimate math via a single group
      val h = li.select(col("one"),
        conv(substring(md5(col("l_partkey").cast("string").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h60"))
      val regs = h.select(col("one"), col("h60").bitwiseAND(511L).as("reg"),
          shiftright(col("h60"), 9).as("w"))
        .select(col("one"), col("reg"),
          when(col("w") === 0L, 52).otherwise(lit(52) - length(bin(col("w")))).as("rank"))
        .groupBy("one", "reg").agg(max("rank").as("mr"))
      regs.groupBy("one")
        .agg(count(lit(1)).as("np"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), 52 - mr)")).as("sp"))
        .select((lit(8.497699123215257e20) /
            ((lit(512L) - col("np")) * lit(1L << 52) + col("sp")).cast("double")).as("raw"),
          (lit(512L) - col("np")).as("nv"))
        .select(floor(
            when(col("raw") <= 1280.0 && col("nv") > 0L,
              lit(512.0) * log(lit(512.0) / col("nv").cast("double")))
              .otherwise(col("raw")) + 0.5)
          .cast("long").as("est"))
        .collect().head.getLong(0)
    }
    assert(direct.count() == 3)
    assert(merged.getLong(merged.fieldIndex("global_nd")) == global,
      s"merged ${merged.getLong(1)} != direct-global $global")
  }

  test("approx_top_k (portable CMS) matches exact counts on the closed event_type domain") {
    val top = RelationalOps.aggApproxTopk(spark, SF).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, SF, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(top.size == 3)
    top.foreach { case (k, v) => assert(exact(k) == v, s"$k: $v vs ${exact(k)}") }
  }

  test("q1 pricing summary groups cover the filtered lineitem exactly") {
    val q1 = RelationalOps.aggGroupbyQ1(spark, SF).collect()
    assert(q1.length >= 4)
    val totalFromGroups = q1.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.load(spark, SF, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(totalFromGroups == expected)
  }

  test("scan_pruned pushes its filter into the parquet scan") {
    val plan = RelationalOps.scanPruned(spark, SF).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), s"no pushdown in plan:\n$plan")
    // column pruning: scan schema carries only the 3 projected columns
    assert(plan.contains("l_orderkey") && !plan.contains("l_extendedprice"))
  }

  test("join_broadcast_dims plans broadcast hash joins for the dims") {
    val plan = RelationalOps.joinBroadcastDims(spark, SF).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("semi and anti joins partition the customer table") {
    val semi = RelationalOps.joinSemi(spark, SF).count()
    val anti = RelationalOps.joinAnti(spark, SF).count()
    val all = Tables.load(spark, SF, "customer").count()
    assert(semi + anti == all)
  }

  test("filter composition: filter(p).filter(q) == filter(p && q)") {
    val o = Tables.load(spark, SF, "orders")
    val p = col("o_totalprice") > 100000
    val q = col("o_orderstatus") === "O"
    assert(o.filter(p).filter(q).count() == o.filter(p && q).count())
  }

  test("union all preserves cardinality") {
    val n = RelationalOps.setUnionAll(spark, SF).count()
    val c = Tables.load(spark, SF, "customer").count()
    val s = Tables.load(spark, SF, "supplier").count()
    assert(n == c + s)
  }

  test("sort is idempotent") {
    val once = RelationalOps.sortMulticol(spark, SF).collect()
    val twice = RelationalOps.sortMulticol(spark, SF)
      .orderBy(col("l_returnflag"), col("l_shipdate").desc, col("l_orderkey"), col("l_linenumber"))
      .collect()
    assert(once.toSeq == twice.toSeq)
  }

  test("topk_limit returns 10 rows in descending price order") {
    val rows = RelationalOps.topkLimit(spark, SF).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("stat functions: freqItems finds the frequent flags, sampleBy is seeded") {
    val li = Tables.load(spark, SF, "lineitem")
    val freq = li.stat.freqItems(Array("l_returnflag"), 0.4).head()
      .getSeq[String](0).toSet
    assert(freq.subsetOf(Set("A", "N", "R")) && freq.nonEmpty)
    val sampled = li.stat.sampleBy("l_returnflag",
      Map("A" -> 0.5, "N" -> 0.1, "R" -> 0.5), 42L)
    val again = li.stat.sampleBy("l_returnflag",
      Map("A" -> 0.5, "N" -> 0.1, "R" -> 0.5), 42L)
    assert(sampled.count() == again.count() && sampled.count() > 0)
  }

  test("map construction and higher-order functions (engine surface, no oracle)") {
    // str_to_map / transform / filter / aggregate are supported but carry
    // no DuckDB oracle (dialects differ) — SURVEY.md §2.H note.
    import spark.implicits._
    val df = Seq("a:1,b:2,c:3").toDF("s").selectExpr(
      "str_to_map(s, ',', ':') AS m",
      "transform(map_values(str_to_map(s, ',', ':')), v -> cast(v AS int) * 10) AS tens",
      "filter(map_keys(str_to_map(s, ',', ':')), k -> k != 'b') AS keys",
      "aggregate(transform(map_values(str_to_map(s, ',', ':')), v -> cast(v AS int)), 0, (acc, x) -> acc + x) AS total")
    val r = df.head()
    assert(r.getAs[Map[String, String]]("m") == Map("a" -> "1", "b" -> "2", "c" -> "3"))
    assert(r.getSeq[Int](r.fieldIndex("tens")).toSeq == Seq(10, 20, 30))
    assert(r.getSeq[String](r.fieldIndex("keys")).toSeq == Seq("a", "c"))
    assert(r.getAs[Int]("total") == 6)
  }

  test("portable histogram quantile (graded agg_approx_percentile) within 2% of exact") {
    val approx = RelationalOps.aggApproxPercentile(spark, SF).collect()
      .map(r => r.getAs[String]("o_orderstatus") -> (r.getAs[Double]("ap50"), r.getAs[Double]("ap90"))).toMap
    val exact = RelationalOps.aggPercentile(spark, SF).collect()
      .map(r => r.getAs[String]("o_orderstatus") -> (r.getAs[Double]("p50"), r.getAs[Double]("p90"))).toMap
    exact.foreach { case (st, (p50, p90)) =>
      val (a50, a90) = approx(st)
      assert(math.abs(a50 - p50) / p50 < 0.02, s"$st p50 $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 < 0.02, s"$st p90 $a90 vs $p90")
    }
  }

  test("rollup subtotals are consistent with the grand total") {
    val rows = RelationalOps.aggRollup(spark, SF).collect()
    val grand = rows.find(r => r.getAs[String]("rf") == "ALL" && r.getAs[String]("ls") == "ALL").get
    val leaves = rows.filter(r => r.getAs[String]("rf") != "ALL" && r.getAs[String]("ls") != "ALL")
    assert(leaves.map(_.getAs[Long]("cnt")).sum == grand.getAs[Long]("cnt"))
  }

  test("hll intersection: inclusion-exclusion identity and accuracy vs exact") {
    val r = RelationalOps.aggHllIntersect(spark, SF).collect()
    assert(r.length == 1)
    val (a, b, u, i, exact) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3), r(0).getLong(4))
    assert(i == a + b - u) // I-E is an exact integer identity over the estimates
    assert(u <= a + b && u >= math.max(a, b) * 98 / 100) // union sane vs parts
    // 512-register HLL: ~4.6% per estimate; I-E compounds three of them
    assert(exact > 0 && math.abs(i - exact).toDouble / exact < 0.15,
      s"est $i vs exact $exact")
  }

  test("weighted median satisfies its defining mass inequalities exactly") {
    val byFlag = Tables.load(spark, SF, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2).toLong))
      .groupBy(_._1)
    val got = RelationalOps.aggWeightedMedian(spark, SF).collect()
    assert(got.map(_.getString(0)).toSeq == byFlag.keys.toSeq.sorted)
    got.foreach { r =>
      val g = byFlag(r.getString(0))
      val med = r.getDouble(1); val tot = r.getLong(2)
      assert(tot == g.map(_._3).sum)
      val below = g.filter(_._2 < med).map(_._3).sum
      val atOrBelow = g.filter(_._2 <= med).map(_._3).sum
      // lower weighted median: strictly-below mass < half ≤ at-or-below mass
      assert(2 * below < tot, s"${r.getString(0)}: below=$below tot=$tot")
      assert(2 * atOrBelow >= tot, s"${r.getString(0)}: atOrBelow=$atOrBelow tot=$tot")
      // and the median is an observed price
      assert(g.exists(_._2 == med))
    }
  }
}
