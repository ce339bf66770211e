package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AdvancedOps

/** Plan + semantics tests for the round-5 scale operators. The DuckDB
  * oracle grades the values; these assert the SHAPE claims the Scaladoc
  * makes (bloom probe reaches the scan, SHJ actually plans, SCD2
  * intervals tile) that a hash-match cannot see. */
class AdvancedOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom prefilter: probe lands as a might_contain predicate and actually prunes") {
    val df = AdvancedOps.joinBloomPrefilter(spark, SF)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    // the probe must prune: survivors (incl. false positives) well under
    // the full fact table, at least the rows of the exact join result
    val total = Tables.load(spark, SF, "lineitem").count()
    val exact = Tables.load(spark, SF, "lineitem")
      .join(Tables.load(spark, SF, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey")).count()
    val bytes = Tables.load(spark, SF, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .agg(org.apache.spark.sql.graftnative.BloomBridge
        .bloomFilterAgg(col("o_orderkey"), 4000000L, 33554432L).as("bf"))
      .head.getAs[Array[Byte]](0)
    val survivors = Tables.load(spark, SF, "lineitem")
      .filter(org.apache.spark.sql.graftnative.BloomBridge
        .mightContain(bytes, col("l_orderkey"))).count()
    assert(survivors >= exact, "bloom produced a false negative")
    assert(survivors < total, "bloom pruned nothing")
    // and the prefiltered join result is bit-identical to the plain join
    val plain = Tables.load(spark, SF, "lineitem")
      .join(Tables.load(spark, SF, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("l_returnflag")
    assert(df.collect().toSeq == plain.collect().toSeq)
  }

  test("shuffle_hash hint plans a ShuffledHashJoin (not broadcast, not SMJ)") {
    val plan = AdvancedOps.joinShuffleHash(spark, SF)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected SHJ:\n$plan")
  }

  test("skew report: top-k via TakeOrderedAndProject, shares consistent") {
    val df = AdvancedOps.statSkewReport(spark, SF)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"full sort for a top-15:\n$plan")
    val rows = df.collect()
    val nKeys = Tables.load(spark, SF, "lineitem")
      .select("l_suppkey").distinct().count()
    assert(rows.length == math.min(15L, nKeys))
    // ordered by volume desc; shares positive and < 100
    val cnts = rows.map(_.getLong(1))
    assert(cnts.sameElements(cnts.sortBy(-_)))
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) < 100.0)
      assert(r.getDouble(3) > 0)
    }
  }

  test("weighted sample: skey matches a plain-Scala A-ES recomputation") {
    val rows = AdvancedOps.llmWeightedSample(spark, SF).collect()
    assert(rows.length == 20)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val (id, w, skey) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0d
      val want = math.floor(math.log(u) / w * 1e8 + 0.5) / 1e8
      // Spark's round() is HALF_UP on the same double — compare at 8 dp
      assert(math.abs(skey - want) < 1.5e-8, s"doc $id: $skey vs $want")
    }
    // keys are in descending order (it IS a top-k by skey)
    val keys = rows.map(_.getDouble(2))
    assert(keys.sameElements(keys.sortBy(-(_: Double))))
  }

  test("vt_compact: content survives, file count collapses 32 -> 2") {
    val before = graft.operators.TableOps.vtCompact(spark, SF) // builds fixture
    val t = graft.tables.VersionedTable.open(spark,
      TempDirs.cached("vtcompact", SF)(_ => ()) + "/t")
    // v0 (16 files) + v1 append (16 more) -> v2 compacted
    assert(t.versions == Seq(0, 1, 2))
    assert(t.read(Some(1)).inputFiles.length == 32)
    assert(t.read(Some(2)).inputFiles.length <= 2)
    // layout rewrite only: compacted content == pre-compaction content
    assert(t.read(Some(2)).count() == t.read(Some(1)).count())
    assert(before.collect().nonEmpty)
  }

  test("incremental rollup: the mid-month key merges partials, result = full recompute") {
    val inc = AdvancedOps.aggIncrementalRollup(spark, SF).collect()
    val full = Tables.load(spark, SF, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("ym").collect()
    assert(inc.toSeq == full.toSeq)
    // the cutoff month is genuinely split across the two partials
    val o = Tables.load(spark, SF, "orders")
    assert(o.filter(col("o_orderdate").between("1997-01-01", "1997-01-14")).count() > 0)
    assert(o.filter(col("o_orderdate").between("1997-01-15", "1997-01-31")).count() > 0)
  }

  test("MAD outliers: gate agrees with a plain-Scala recomputation per group") {
    val got = AdvancedOps.statOutlierMad(spark, SF).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val rows = Tables.load(spark, SF, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val want = rows.groupBy(_._1).map { case (k, vs) =>
      val xs = vs.map(_._2)
      val med = medianOf(xs)
      val mad = medianOf(xs.map(x => math.abs(x - med)))
      k -> xs.count(_ > med + 2.0 * mad).toLong
    }
    // groups with zero outliers drop out of the grouped-after-filter output
    assert(got == want.filter(_._2 > 0))
  }

  test("degree distribution: node counts per side sum to the node totals") {
    val rows = graft.operators.GraphOps.graphDegreeDist(spark, SF).collect()
    val custNodes = rows.filter(_.getString(0) == "customer").map(_.getLong(2)).sum
    val suppNodes = rows.filter(_.getString(0) == "supplier").map(_.getLong(2)).sum
    // every active customer/supplier appears exactly once in the histogram
    val li = Tables.load(spark, SF, "lineitem")
    val o = Tables.load(spark, SF, "orders")
    val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
    assert(custNodes == joined.select("o_custkey").distinct().count())
    assert(suppNodes == joined.select("l_suppkey").distinct().count())
  }

  test("scd2: intervals tile per user on a constructed change feed") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1: A A B B A  -> 3 change rows (A, B, A)
      (1L, ts(1), "A", 10L), (1L, ts(2), "A", 11L), (1L, ts(3), "B", 12L),
      (1L, ts(4), "B", 13L), (1L, ts(5), "A", 14L),
      // user 2: single state -> 1 open row
      (2L, ts(1), "X", 20L), (2L, ts(9), "X", 21L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    ev.createOrReplaceTempView("scd2_input")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val out = ev
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead("ts", 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"))
      .orderBy("user_id", "valid_from")
      .collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("A", "B", "A"))
    // intervals tile: each valid_to equals the next valid_from; last open
    u1.sliding(2).foreach {
      case Array(a, b) => assert(a.getTimestamp(3) == b.getTimestamp(2))
      case _ =>
    }
    assert(u1.last.getTimestamp(3) == null)
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2.head.getTimestamp(3) == null)
    // the graded op runs and all open intervals are flagged current
    val graded = AdvancedOps.scd2Build(spark, SF)
    assert(graded.filter(col("valid_to").isNull && !col("is_current")).isEmpty)
    assert(graded.count() > 0)
  }

  test("pareto frontier: equals brute-force dominance; never a pairwise join") {
    val df = AdvancedOps.paretoFrontier(spark, SF)
    val got = df.collect().map(r => (r.getDouble(0), r.getInt(1))).toSeq
    val pts = Tables.load(spark, SF, "part")
      .groupBy(col("p_retailprice").as("price")).agg(max("p_size").as("size"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    val brute = pts.filter { case (p, sz) =>
      !pts.exists { case (p2, s2) => p2 < p && s2 >= sz }
    }.sortBy(_._1).toSeq
    assert(got == brute, s"window skyline != dominance anti-join")
    assert(got.nonEmpty && got == got.sortBy(_._1))
    // frontier is strictly increasing in BOTH dims (the skyline shape)
    got.sliding(2).foreach {
      case Seq(a, b) => assert(a._1 < b._1 && a._2 < b._2)
      case _ =>
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pareto must stay window-based, not a dominance join:\n$plan")
  }

  test("rolling slope: closed form matches a direct in-memory least squares") {
    val got = AdvancedOps.winRollingSlope(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val orders = Tables.load(spark, SF, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1992-01-01")).cast("double"),
        col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    orders.groupBy(_._1).foreach { case (cust, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.indices.foreach { i =>
        val frame = sorted.slice(math.max(0, i - 4), i + 1)
        val n = frame.length.toDouble
        val (sx, sy) = (frame.map(_._3).sum, frame.map(_._4).sum)
        val (sxy, sxx) = (frame.map(r => r._3 * r._4).sum, frame.map(r => r._3 * r._3).sum)
        val den = n * sxx - sx * sx
        val want =
          if (n > 1 && den != 0.0)
            Some(BigDecimal((n * sxy - sx * sy) / den)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          else None
        val key = (cust, sorted(i)._2)
        (got(key), want) match {
          case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-9, s"$key: $g vs $w")
          case (None, None) =>
          case other => fail(s"$key: $other")
        }
      }
    }
  }

  test("chi-square: matches direct computation, zero-observed cells included") {
    val out = AdvancedOps.statChiSquare(spark, SF).collect()
    assert(out.length == 1)
    val (chi2, dof) = (out(0).getDouble(0), out(0).getLong(1))
    val obs = Tables.load(spark, SF, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).cast("double").as("o"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val langs = obs.keys.map(_._1).toSeq.distinct
    val srcs = obs.keys.map(_._2).toSeq.distinct
    val n = obs.values.sum
    val rt = langs.map(l => l -> obs.collect { case ((`l`, _), o) => o }.sum).toMap
    val ct = srcs.map(c => c -> obs.collect { case ((_, `c`), o) => o }.sum).toMap
    val want = (for { l <- langs; c <- srcs } yield {
      val e = rt(l) * ct(c) / n
      val o = obs.getOrElse((l, c), 0.0)
      (o - e) * (o - e) / e
    }).sum
    assert(dof == (langs.size - 1).toLong * (srcs.size - 1))
    assert(math.abs(chi2 - want) < 1e-4, s"$chi2 vs $want")
    // the zero-cell grid matters: at least as many grid cells as observed
    assert(langs.size * srcs.size >= obs.size)
  }

  test("KS statistic matches an exact plain-Scala ECDF walk") {
    val vals = Tables.load(spark, SF, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = vals.filter(_._1 == "purchase").map(_._2).sorted
    val b = vals.filter(_._1 == "click").map(_._2).sorted
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val dNum = (a ++ b).distinct.map { x =>
      math.abs(a.count(_ <= x) * nb - b.count(_ <= x) * na)
    }.max
    val row = AdvancedOps.statKsTest(spark, SF).collect()
    assert(row.length == 1)
    assert(row(0).getAs[Long]("na") == na && row(0).getAs[Long]("nb") == nb)
    assert(row(0).getAs[Long]("d_num") == dNum, s"got ${row(0)}, want $dNum")
    val d = row(0).getAs[Double]("d_stat")
    assert(d >= 0.0 && d <= 1.0)
    assert(math.abs(d - dNum.toDouble / (na * nb)) <= 5e-7)
  }

  test("Mann-Whitney U matches an exact midrank replay; U_a + U_b = na*nb") {
    val vals = Tables.load(spark, SF, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val pooled = vals.map(_._2).sorted
    // 2·midrank of v = positions-before·2 + count-of-v + 1 (exact int)
    def rank2(v: Double): Long =
      2L * pooled.count(_ < v) + pooled.count(_ == v) + 1L
    val a = vals.filter(_._1 == "purchase").map(_._2)
    val b = vals.filter(_._1 == "click").map(_._2)
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val u2a = a.map(rank2).sum - na * (na + 1)
    val u2b = b.map(rank2).sum - nb * (nb + 1)
    assert(u2a + u2b == 2 * na * nb) // the rank-sum identity, exactly
    val row = AdvancedOps.statMannWhitney(spark, SF).collect()
    assert(row.length == 1)
    assert(row(0).getAs[Long]("na") == na && row(0).getAs[Long]("nb") == nb)
    assert(row(0).getAs[Long]("u2_a") == u2a, s"got ${row(0)}, want $u2a")
    val z = row(0).getAs[Double]("z")
    val wantZ = (u2a / 2.0 - na.toDouble * nb / 2.0) /
      math.sqrt(na.toDouble * nb * (na + nb + 1.0) / 12.0)
    assert(math.abs(z - wantZ) <= 5e-7)
  }

  test("Welch t-test matches an exact cent-moment replay") {
    val vals = Tables.load(spark, SF, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100.0 + 0.5).toLong))
    def moments(t: String) = {
      val cs = vals.filter(_._1 == t).map(_._2)
      (cs.length.toLong, cs.sum, cs.map(c => c * c).sum)
    }
    val (na, sa1, sa2) = moments("purchase")
    val (nb, sb1, sb2) = moments("click")
    val va = (sa2.toDouble - sa1.toDouble * sa1 / na) / (na - 1.0)
    val vb = (sb2.toDouble - sb1.toDouble * sb1 / nb) / (nb - 1.0)
    val se2 = va / na + vb / nb
    val wantT = (sa1.toDouble / na - sb1.toDouble / nb) / math.sqrt(se2)
    val wantDf = se2 * se2 /
      ((va / na) * (va / na) / (na - 1.0) + (vb / nb) * (vb / nb) / (nb - 1.0))
    val row = AdvancedOps.statTtestWelch(spark, SF).collect()
    assert(row.length == 1)
    assert(row(0).getAs[Long]("na") == na && row(0).getAs[Long]("nb") == nb)
    assert(math.abs(row(0).getAs[Double]("t_stat") - wantT) <= 5e-7)
    assert(math.abs(row(0).getAs[Double]("df") - wantDf) <= 5e-7)
    // Welch df must land between min(na,nb)-1 and na+nb-2
    val df = row(0).getAs[Double]("df")
    assert(df >= math.min(na, nb) - 1.0 && df <= na + nb - 2.0, s"df $df")
  }

  test("PSI matches an exact integer replay; every bin term is >= 0 (Gibbs)") {
    // session tz is pinned UTC, so the split literal is this instant
    val splitMs = java.time.Instant.parse("2024-01-16T00:00:00Z").toEpochMilli
    val nb = Array.fill(20)(0L); val nc = Array.fill(20)(0L)
    Tables.load(spark, SF, "events")
      .filter(col("event_type") === "purchase")
      .select("ts", "value").collect()
      .foreach { r =>
        val bin = math.min(math.floor(r.getDouble(1) / 25.0), 19.0).toInt
        if (r.getTimestamp(0).getTime < splitMs) nb(bin) += 1 else nc(bin) += 1
      }
    val tb = nb.sum + 20; val tc = nc.sum + 20
    def flr6(x: Double) = (math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5)).toLong
    val psi12 = (0 until 20).map { i =>
      val xp = (nb(i) + 1) * tc; val xq = (nc(i) + 1) * tb
      flr6((xp - xq).toDouble / (tb * tc).toDouble) *
        flr6(math.log(xp.toDouble / xq.toDouble))
    }
    val got = AdvancedOps.statPsi(spark, SF).collect()
    assert(got.length == 20)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("bin") == i)
      assert(r.getAs[Long]("n_base") == nb(i) && r.getAs[Long]("n_cur") == nc(i))
      assert(r.getAs[Long]("psi12") == psi12(i), s"bin $i: ${r.getAs[Long]("psi12")} want ${psi12(i)}")
      // (p−q) and ln(p/q) always share sign, and sign-aware rounding
      // preserves sign-or-zero — so every contribution is ≥ 0
      assert(r.getAs[Long]("psi12") >= 0L)
      assert(r.getAs[Double]("psi_total") == psi12.sum.toDouble / 1e12)
    }
    // both halves are populated (the split actually splits the fixture)
    assert(nb.sum > 0 && nc.sum > 0)
  }

  test("cramers V shares the chi-square grid and lands in [0,1]") {
    val chi = AdvancedOps.statChiSquare(spark, SF).collect()(0)
    val v = AdvancedOps.statCramersV(spark, SF).collect()
    assert(v.length == 1)
    // shared grid: same cells, but the two keys aggregate under
    // different groupings, so summation order (not values) may differ
    // by ~1e-13 — assert at the rounding grain, not bitwise
    assert(math.abs(v(0).getAs[Double]("chi2") - chi.getAs[Double]("chi2")) <= 1e-6)
    assert(v(0).getAs[Long]("dof") == chi.getAs[Long]("dof"))
    val n = Tables.load(spark, SF, "documents").count()
    assert(v(0).getAs[Long]("n") == n)
    val cv = v(0).getAs[Double]("cramers_v")
    assert(cv >= 0.0 && cv <= 1.0, s"V $cv")
    // V consistent with the reported chi2 (rounded input → loose bound)
    val minDim = math.min(
      Tables.load(spark, SF, "documents").select("lang").distinct().count(),
      Tables.load(spark, SF, "documents").select("source").distinct().count()) - 1
    val approx = math.sqrt(chi.getAs[Double]("chi2") / (n * minDim))
    assert(math.abs(cv - approx) < 1e-5, s"V $cv vs $approx")
  }

  test("ANOVA F matches an exact moment replay; variance decomposition ties out") {
    val rows = Tables.load(spark, SF, "events")
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("day"), col("value")).collect()
      .map(r => ((r.getDate(0).toLocalDate.toEpochDay % 7 + 7) % 7,
        math.floor(r.getDouble(1) * 100.0 + 0.5).toLong))
    val g = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (dow, xs) =>
      val cs = xs.map(_._2)
      (dow, cs.length.toLong, cs.sum, cs.map(c => BigInt(c) * BigInt(c)).sum)
    }
    val k = g.length.toDouble
    val nn = g.map(_._2).sum.toDouble; val tt = g.map(_._3).sum.toDouble
    val qq = g.map(_._4).sum.toDouble
    val sbsum = g.map(x => x._3.toDouble * x._3.toDouble / x._2.toDouble)
      .foldLeft(0.0)(_ + _) // ordered fold, same as both engines
    val ssb = sbsum - tt * tt / nn
    val ssw = qq - sbsum
    val f = (ssb / (k - 1.0)) / (ssw / (nn - k))
    val row = AdvancedOps.statAnovaF(spark, SF).collect()
    assert(row.length == 1)
    assert(row(0).getAs[Long]("k") == g.length.toLong)
    assert(row(0).getAs[Long]("n") == g.map(_._2).sum)
    assert(math.abs(row(0).getAs[Double]("f_stat") - f) <= 5e-7)
    assert(math.abs(row(0).getAs[Double]("eta2") - ssb / (ssb + ssw)) <= 5e-7)
    // decomposition: SSB + SSW == SST from raw moments (fp tolerance)
    val sst = qq - tt * tt / nn
    assert(math.abs((ssb + ssw) - sst) / sst < 1e-9)
    assert(row(0).getAs[Double]("f_stat") >= 0.0)
  }

  test("benford audit matches a string-digit replay; shares are a distribution") {
    val prices = Tables.load(spark, SF, "orders").select("o_totalprice").collect()
      .map(r => math.floor(r.getDouble(0)).toLong.toString.take(1).toInt)
    val counts = prices.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = prices.length.toDouble
    val benford = Seq(0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
      0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
      0.05799194697768673, 0.05115252244738129, 0.04575749056067514)
    val got = AdvancedOps.statBenford(spark, SF).collect()
    assert(got.map(_.getInt(0)).toSeq == counts.keys.toSeq.sorted)
    got.foreach { r =>
      val d = r.getInt(0); val obs = counts(d)
      assert(d >= 1 && d <= 9)
      assert(r.getLong(1) == obs)
      assert(r.getDouble(2) == math.floor(obs / n * 10000.0 + 0.5) / 10000.0)
      assert(r.getDouble(3) == math.floor(benford(d - 1) * 10000.0 + 0.5) / 10000.0)
      val e = benford(d - 1) * n
      val want = math.floor((obs - e) * (obs - e) / e * 1000000.0 + 0.5) / 1000000.0
      assert(r.getDouble(4) == want, s"digit $d")
    }
    assert(math.abs(got.map(_.getDouble(2)).sum - 1.0) < 2e-3) // obs shares ≈ 1
  }

  test("poisson bootstrap: exact hash replay; replicate spread brackets the mean") {
    val purchases = Tables.load(spark, SF, "events")
      .filter(col("event_type") === "purchase")
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100.0 + 0.5).toLong))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val cdf = Array(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238462, 0.9963401531726563, 0.9994058151824183, 0.9998407620127588)
    val reps = (0 until 32).map { b =>
      var sw = 0L; var swx = 0L
      purchases.foreach { case (id, c) =>
        val h = java.lang.Long.parseLong(md5hex(s"$id:$b").take(15), 16)
        val u = h.toDouble / 1.152921504606846976e18
        val i = cdf.indexWhere(u < _); val k = if (i < 0) 7L else i.toLong
        sw += k; swx += k * c
      }
      (b, sw, math.floor(swx.toDouble / sw.toDouble * 10000.0 + 0.5) / 10000.0)
    }
    val got = AdvancedOps.statBootstrapCi(spark, SF).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == reps, s"got ${got.take(2)}... want ${reps.take(2)}...")
    // the replicate spread is a sampling distribution around the truth
    val trueMean = purchases.map(_._2).sum.toDouble / purchases.length
    val means = got.map(_._3)
    assert(means.min < trueMean && trueMean < means.max,
      s"[${means.min}, ${means.max}] must bracket $trueMean")
    assert(means.distinct.size > 1)
    // each replicate draws ~Poisson(n) rows in total
    val n = purchases.length.toDouble
    got.foreach { case (b, neff, _) =>
      assert(math.abs(neff - n) <= 5 * math.sqrt(n) + 5, s"replicate $b n_eff $neff vs $n")
    }
  }

  test("multivariate OLS: exact moment replay + residual orthogonality") {
    val rows = Tables.load(spark, SF, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_quantity", "l_discount").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100.0 + 0.5).toLong,
        r.getDouble(2).toLong, math.floor(r.getDouble(3) * 100.0 + 0.5).toLong))
    val got = AdvancedOps.aggRegressionMulti(spark, SF).collect()
    assert(got.map(_.getString(0)).toSeq == rows.map(_._1).distinct.sorted.toSeq)
    got.foreach { out =>
      val g = rows.filter(_._1 == out.getString(0))
      val n = g.length.toDouble
      assert(out.getAs[Long]("n") == g.length.toLong)
      val s1 = g.map(_._3).sum.toDouble; val s2 = g.map(_._4).sum.toDouble
      val sy = g.map(_._2).sum.toDouble
      val s11 = g.map(x => x._3 * x._3).sum.toDouble
      val s12 = g.map(x => x._3 * x._4).sum.toDouble
      val s22 = g.map(x => x._4 * x._4).sum.toDouble
      val s1y = g.map(x => x._3 * x._2).sum.toDouble
      val s2y = g.map(x => x._4 * x._2).sum.toDouble
      val syy = g.map(x => BigInt(x._2) * BigInt(x._2)).sum.toDouble
      val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
        s2 * (s1 * s12 - s11 * s2)
      val b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
        s2 * (s1y * s12 - s11 * s2y)) / det
      val b1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
        s2 * (s1 * s2y - s1y * s2)) / det
      val b2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
        sy * (s1 * s12 - s11 * s2)) / det
      assert(math.abs(out.getAs[Double]("intercept_c") - b0) <= 5e-5)
      assert(math.abs(out.getAs[Double]("b_qty_c") - b1) <= 5e-5)
      assert(math.abs(out.getAs[Double]("b_disc_c") - b2) <= 5e-5)
      val r2 = 1.0 - (syy - (b0 * sy + b1 * s1y + b2 * s2y)) / (syy - sy * sy / n)
      assert(math.abs(out.getAs[Double]("r2") - r2) <= 5e-7)
      assert(r2 > 0.0 && r2 < 1.0, s"r2 $r2") // qty genuinely predicts price
      // independent least-squares certificate (not a formula replay):
      // residuals are orthogonal to 1, x1, x2 up to float tolerance
      val res = g.map(x => x._2.toDouble - (b0 + b1 * x._3 + b2 * x._4))
      val scale = g.map(_._2.toDouble.abs).sum
      assert(math.abs(res.sum) / scale < 1e-9)
      assert(math.abs(res.zip(g).map { case (e, x) => e * x._3 }.sum) / (scale * 50) < 1e-9)
      assert(math.abs(res.zip(g).map { case (e, x) => e * x._4 }.sum) / (scale * 10) < 1e-9)
    }
  }

  test("giniFrame hits the analytic poles: perfect equality 0, one-owner (n-1)/n") {
    val equal = (1L to 40L).map(i => (i, 250L)).toDF("ck", "spend_c")
    val eq = AdvancedOps.giniFrame(equal, "ck", "spend_c").collect()(0)
    assert(eq.getLong(0) == 40L && eq.getLong(1) == 10000L)
    assert(eq.getDouble(2) == 0.0)
    // one customer owns everything: G = (n-1)/n exactly
    val onePct = (1L to 40L).map(i => (i, if (i == 40L) 7777L else 0L)).toDF("ck", "spend_c")
    val op = AdvancedOps.giniFrame(onePct, "ck", "spend_c").collect()(0)
    assert(op.getDouble(2) == math.floor(39.0 / 40.0 * 1e6 + 0.5) / 1e6)
    // and a hand-checkable middle case: x = (1,2,3,4) -> G = 0.25
    val mid = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("ck", "spend_c")
    assert(AdvancedOps.giniFrame(mid, "ck", "spend_c").collect()(0).getDouble(2) == 0.25)
  }
}
