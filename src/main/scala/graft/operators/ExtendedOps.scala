package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Second-wave surface coverage: argmax aggregates, boolean/bitwise
  * aggregates, distribution window functions, bitwise/hash/regex/interval
  * scalar suites, higher-order array functions, unpivot (melt), and a
  * partition-pruned scan.
  *
  * Scale posture: every op is a declarative single-pass plan — the scalar
  * suites are row-local projections (no shuffle), the aggregates are
  * 2-phase hash aggs, unpivot is a row-expanding projection (Expand node,
  * no shuffle), and scan_partitioned demonstrates the layout that makes
  * 100 TB scans cheap: directory partitioning + partition pruning, so a
  * selective filter reads only its partition's files.
  */
object ExtendedOps {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Typed row for the Dataset[T] pipeline (public: Spark encoder codegen
    * requires a public case class). */
  /** Exact cents with HALF-AWAY-FROM-ZERO rounding — the convention the
    * DuckDB oracle's round() uses. `math.round` is floor(x+0.5) (half
    * UP), which disagrees on negative half-cents (-2.5 → -2 vs -3);
    * safe-by-accident today only because fixture money is positive —
    * the same class AdvancedOps' sign-aware slope rounding fixes. */
  private def centsHalfAwayFromZero(x: Double): Long =
    (math.signum(x) * math.floor(math.abs(x * 100) + 0.5)).toLong

  final case class OrderRow(o_orderkey: Long, o_custkey: Long,
                            o_totalprice: Double, o_orderstatus: String)

  /** max_by/min_by with struct ordering — (price, key) lexicographic, so
    * ties on price break deterministically on key (plain max_by ties are
    * engine-arbitrary; SURVEY.md §5.3.1). */
  def aggMinmaxBy(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(
        expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("best_key"),
        expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("worst_key"),
        round(max("o_totalprice"), 2).as("max_price"),
        round(min("o_totalprice"), 2).as("min_price"))
      .orderBy("o_orderstatus")

  /** The salting skew technique as a GRADED op: the salted two-stage sum
    * must hash-match the plain GROUP BY oracle (sums rounded 2 dp absorb
    * the re-association). At 100 TB this is how a hot key's volume spreads
    * across reducers instead of serializing on one. */
  def aggSalted(s: SparkSession, d: String): DataFrame =
    // salt from the row-unique orderkey, NOT the quantity: a hot flag's
    // quantities are a ~50-value domain, which would under-spread it
    ScaleOps.saltedSum(t(s, d, "lineitem"), col("l_returnflag"), col("l_quantity"),
        saltSource = col("l_orderkey"))
      .select(col("key"), round(col("sum_v"), 2).as("sum_v"))
      .orderBy("key")

  /** Salted skewed JOIN graded end-to-end: lineitem ⋈ nation-sized dim
    * with the build side replicated per salt (ScaleOps.saltedJoin) — the
    * aggregated result must equal the plain join's (oracle is the plain
    * SQL join). Deterministic salt = hash(l_orderkey). */
  def joinSkewSalted(s: SparkSession, d: String): DataFrame = {
    val dim = t(s, d, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    ScaleOps.saltedJoin(t(s, d, "lineitem"), dim, "l_suppkey", "s_suppkey",
        saltSource = col("l_orderkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("s_nationkey")
  }

  /** Top-k per group via a BOUNDED-HEAP typed Aggregator
    * ([[graft.functions.TopK]]) instead of the window formulation: the
    * partial aggregation keeps only k rows per (group, task), so the
    * exchange carries ~k·groups rows where `win_topk_group`'s
    * row_number() shuffles and sorts the entire input. Same contract as
    * the window twin — the oracle IS the row_number formulation — so
    * both paths are proven equivalent, and a user picks by shape: window
    * when they need ranks over everything, heap-agg when k ≪ group size
    * (the 100 TB case). */
  def aggTopkHeap(s: SparkSession, d: String): DataFrame = {
    val top3 = udaf(graft.functions.TopK(3))
    t(s, d, "orders")
      .groupBy("o_custkey")
      .agg(top3(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top.items")))
      .select(col("o_custkey"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as("o_orderkey"),
        round(col("col.score"), 2).as("total_price"))
      .orderBy("o_custkey", "rnk")
  }

  /** Fixed-width histogram: computed bucket ids (floor division, top
    * bucket clamped), count + bounds per bucket — the numeric-profiling
    * shape (one hash aggregation; distinct from CASE-tier bucketing). */
  def aggHistogram(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .withColumn("bucket", least(floor(col("o_totalprice") / 50000), lit(9)).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min("o_totalprice"), 2).as("lo"),
        round(max("o_totalprice"), 2).as("hi"))
      .orderBy("bucket")

  /** Three-valued-logic truth table: all 9 combinations of
    * (true, false, NULL) × (true, false, NULL) through AND / OR / NOT /
    * equality — the NULL-semantics contract, enumerated exhaustively
    * (SQL-text entry; fixtures are null-free so the domain is literal). */
  def fnBoolLogic3vl(s: SparkSession, d: String): DataFrame =
    s.sql("""
      WITH v AS (SELECT * FROM VALUES (1, true), (2, false), (3, CAST(NULL AS BOOLEAN)) AS t(i, b))
      SELECT a.i AS ai, b.i AS bi,
             (a.b AND b.b) AS and_r, (a.b OR b.b) AS or_r,
             (NOT a.b) AS not_a, (a.b = b.b) AS eq_r,
             (a.b IS NOT DISTINCT FROM b.b) AS same_r
      FROM v a CROSS JOIN v b ORDER BY ai, bi""")

  /** Boolean + bitwise aggregates (bool_and/bool_or, bit_and/or/xor). */
  def aggBoolBit(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("bool_and(l_quantity >= 1.0)").as("all_qty"),
        expr("bool_or(l_discount > 0.09)").as("any_disc"),
        expr("bit_and(l_linenumber)").as("b_and"),
        expr("bit_or(l_linenumber)").as("b_or"),
        expr("bit_xor(l_linenumber)").as("b_xor"))
      .orderBy("l_returnflag")

  /** percent_rank / cume_dist / nth_value per brand — the ordering key
    * includes p_partkey so ranks are tie-free; nth_value takes the
    * explicit full frame (default frames differ across engines). */
  def winPercentCume(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        nth_value(col("p_partkey"), 2).over(full).as("second_key"))
      .orderBy("p_brand", "p_retailprice", "p_partkey")
  }

  /** Scalar bitwise suite: and/or/xor, shifts, popcount. */
  def fnBitwise(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(col("p_partkey"),
        (col("p_partkey").bitwiseAND(lit(255L))).as("b_and"),
        (col("p_partkey").bitwiseOR(lit(4096L))).as("b_or"),
        (col("p_partkey").bitwiseXOR(lit(85L))).as("b_xor"),
        shiftleft(col("p_partkey") % 16, 2).as("shl"),
        shiftright(col("p_partkey"), 3).as("shr"),
        bit_count(col("p_partkey")).as("pop"))
      .orderBy("p_partkey")

  /** Hash function suite — md5 + sha2-256 hex digests (both lowercase hex
    * on both engines; probed in SURVEY §5.2 style). */
  def fnHash(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(col("c_custkey"),
        md5(col("c_name").cast("binary")).as("h_md5"),
        sha2(col("c_name").cast("binary"), 256).as("h_sha256"))
      .orderBy("c_custkey")

  /** Regex suite: extract-all counts, rlike flags, global replace, group
    * extraction. DuckDB regexp_replace needs the 'g' flag to match
    * Spark's replace-all semantics. */
  def fnRegexSuite(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(col("p_partkey"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]+"), lit(0))).as("n_vowel_runs"),
        col("p_name").rlike("^[a-m]").as("starts_early"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        length(regexp_extract(col("p_name"), "^(\\w+)", 1)).as("first_word_len"))
      .orderBy("p_partkey")

  /** Interval / calendar arithmetic: quarter, ISO week, month-clamped
    * add_months, day subtraction, month-start construction. */
  def fnInterval(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("o_orderkey"),
        quarter(col("o_orderdate")).as("q"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        add_months(col("o_orderdate").cast("date"), 1).as("plus_month"),
        date_sub(col("o_orderdate").cast("date"), 15).as("minus_15d"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("month_start"))
      .orderBy("o_orderkey")

  /** Higher-order array functions over the embedding column — transform /
    * filter / aggregate lambdas, all codegen'd (no UDF). Elements are cast
    * to double BEFORE arithmetic on both engines (DuckDB computes in
    * float32 on FLOAT[] inputs). */
  def fnHigherOrder(s: SparkSession, d: String): DataFrame = {
    val arr = col("embedding").cast("array<double>")
    t(s, d, "embeddings")
      .select(col("vec_id"),
        round(aggregate(transform(arr, x => x * x), lit(0.0), (acc, x) => acc + x), 4).as("ssq"),
        size(filter(arr, x => x > 0)).as("n_pos"),
        round(array_max(transform(arr, x => abs(x))), 6).as("max_abs"))
      .orderBy("vec_id")
  }

  /** Unpivot (melt): wide per-part metrics to long (metric, val) rows.
    * Spark's Expand-based unpivot; the oracle is the UNION ALL spelling. */
  def unpivotMelt(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(col("p_partkey"), col("p_size").cast("double").as("size"),
        col("p_retailprice").as("retail"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retail")), "metric", "val")
      .orderBy("p_partkey", "metric")

  /** Partition-pruned scan: write lineitem partitioned by l_returnflag,
    * read back one partition. The filter prunes at the directory level —
    * the physical plan's PartitionFilters carries the predicate and only
    * 1/3 of the files are listed/read. This is the 100 TB layout: facts
    * partitioned by a low-cardinality routing column (date/lang/flag). */
  def scanPartitioned(s: SparkSession, d: String): DataFrame = {
    val tmp = graft.TempDirs.cached("part", d) { dir =>
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    }
    s.read.parquet(tmp)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")
  }

  /** The fact side for the dynamic-partition-pruning op: customer written
    * once per JVM partitioned by c_nationkey — 25 directory partitions,
    * the classic nation-routed fact layout. */
  def dppFact(s: SparkSession, d: String): DataFrame = {
    val tmp = graft.TempDirs.cached("dppcust", d) { dir =>
      t(s, d, "customer")
        .select("c_custkey", "c_acctbal", "c_nationkey")
        .write.mode("overwrite").partitionBy("c_nationkey").parquet(dir)
    }
    s.read.parquet(tmp)
  }

  /** Dynamic partition pruning as a GRADED op — the classic 100 TB
    * scan-killer: the fact is partitioned on the JOIN key (c_nationkey)
    * and the dim carries a filter on a NON-join column (n_regionkey = 0),
    * so the set of surviving partitions is only knowable at runtime.
    * Catalyst plants a DynamicPruningExpression in the fact scan's
    * PartitionFilters, fed by the dim's (reused) broadcast — the fact
    * reads 5 of 25 partitions instead of all 25, with zero rows scanned
    * from pruned directories. A static filter can't express this: the
    * qualifying nation keys come out of the dim scan. Plan-asserted
    * (dynamicpruningexpression present; partitions read < total) in
    * ExtendedOpsSpec. The filter must stay off the join column — a
    * predicate ON n_nationkey would constraint-propagate to a static
    * partition filter and bypass DPP entirely. */
  def scanDpp(s: SparkSession, d: String): DataFrame = {
    val dim = t(s, d, "nation").filter(col("n_regionkey") === 0)
    dppFact(s, d)
      .join(broadcast(dim), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("n_name")
  }

  /** Co-located bucketed join: lineitem and orders are written ONCE per
    * JVM as parquet tables bucketed (and sorted) by the join key with
    * matching bucket counts, then joined. The bucketed layout already IS
    * the hash partitioning a shuffle would produce, so the sort-merge join
    * plans with ZERO Exchange nodes on either side (asserted in
    * ScaleOpsSpec). At 100 TB this turns the recurring fact-fact join of
    * every downstream query into a scan-local merge — the shuffle cost is
    * paid once at ingest, not per query. The merge hint forces SMJ so the
    * co-location is exercised even at fixture scale where the orders side
    * would otherwise broadcast. */
  def joinBucketed(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // database name carries the sfDir hash: one bucketed layout per scale
    // dir, never cross-contaminated by mode("overwrite") across dirs.
    // The build cache is SESSION-scoped (like GraphOps' edge memos): the
    // saveAsTable registrations live in the session's catalog, so a JVM
    // cache alone would hand a restarted session a dir whose tables its
    // fresh catalog never heard of (TABLE_OR_VIEW_NOT_FOUND); re-paying
    // the one-time write per session is the correct price.
    val db = "graft_buckets_" + (d.hashCode.toLong & 0xffffffffL).toString
    val sid = org.apache.spark.sql.graftnative.SessionIds.uuid(s)
    graft.TempDirs.cached("bucketdb_" + sid, d) { dir =>
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$dir'")
      t(s, d, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.lineitem_b")
      t(s, d, "orders").select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b")
    }
    (s.table(s"$db.lineitem_b"), s.table(s"$db.orders_b"))
  }

  /** The graded query over the bucketed layout: exchange-free fact-fact
    * join feeding an aggregation. */
  def joinBucketedAgg(s: SparkSession, d: String): DataFrame = {
    val (li, ord) = joinBucketed(s, d)
    li.hint("merge")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority", "l_returnflag")
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_extendedprice")), 2).as("total"))
      .orderBy("o_orderpriority", "l_returnflag")
  }

  /** Z-order clustering key over (l_partkey, l_suppkey) — the graded half
    * of the multi-column data-skipping story ([[ScaleOps.zValue]]); the
    * layout/locality effect is asserted in ScaleOpsSpec. Pure integer
    * bit-interleave, row-local, cross-engine deterministic. */
  def zorderKey(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        ScaleOps.zValue(col("l_partkey"), col("l_suppkey")).as("z"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Population-moment statistics — var_pop/stddev_pop plus skewness and
    * excess kurtosis. Spark's skewness/kurtosis are POPULATION moments
    * (m3/m2^1.5, m4/m2²−3) while DuckDB's builtins are sample-adjusted
    * estimators, so the oracle recomputes the central moments explicitly. */
  def aggStatsPop(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(
        round(var_pop("o_totalprice"), 4).as("vp"),
        round(stddev_pop("o_totalprice"), 4).as("sp"),
        round(skewness(col("o_totalprice")), 4).as("skew"),
        round(kurtosis(col("o_totalprice")), 4).as("kurt"))
      .orderBy("o_orderstatus")

  /** OLS regression aggregates (regr_* family) — slope/intercept/R²/
    * count/mean-x of extendedprice ~ quantity per flag. */
  def aggRegression(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("icept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 4).as("r2"),
        expr("regr_count(l_extendedprice, l_quantity)").as("n"),
        round(expr("regr_avgx(l_extendedprice, l_quantity)"), 4).as("avgx"))
      .orderBy("l_returnflag")

  /** Distinct ordered string aggregation (collect_set twin of D10). */
  def aggCollectSet(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .groupBy("c_nationkey")
      .agg(concat_ws(",", sort_array(collect_set("c_mktsegment"))).as("segs"))
      .orderBy("c_nationkey")

  /** Array membership / position / ordering / set algebra — the second
    * array suite (fn_array_suite covers size/element access). */
  def fnArraySuite2(s: SparkSession, d: String): DataFrame = {
    val arr = array(col("p_size"), (col("p_partkey") % 10).cast("int"), lit(3))
    t(s, d, "part")
      .select(col("p_partkey"),
        array_contains(arr, 3).as("has3"),
        array_position(arr, lit(3)).as("pos3"),
        concat_ws(",", sort_array(arr)).as("sorted"),
        arrays_overlap(arr, array(lit(1), lit(2), lit(48))).as("ovl"),
        concat_ws(",", sort_array(array_union(arr, array(lit(1), lit(2))))).as("uni"))
      .orderBy("p_partkey")
  }

  /** try_-prefixed error-safe functions: division by a zero-able divisor
    * and casts of non-numeric strings yield NULL, never an exception.
    *
    * r15 perf note: try_cast evaluates through the ANSI path and CATCHES
    * the per-row conversion exception, and building each exception's
    * error-class message costs ~20µs — on a column where every value fails
    * (o_orderpriority is '1-URGENT'-shaped) that machinery dominated the
    * whole key (~3 s of a 3.2 s key at sf0.1 for a scan+project+sort
    * plan). The regex pre-guard short-circuits rows that cannot possibly
    * cast — the pattern accepts a SUPERSET of ANSI's string→int grammar
    * (optional ASCII-control/space padding, sign, digits; overflow still
    * reaches try_cast and yields NULL through the catch), so guarded and
    * unguarded results are identical on every string. Same-plan semantics,
    * exception-free hot path. */
  def fnTrySuite(s: SparkSession, d: String): DataFrame = {
    val intish = "^[\\x00-\\x20]*[+-]?[0-9]+[\\x00-\\x20]*$"
    t(s, d, "orders")
      .select(col("o_orderkey"),
        round(expr("try_divide(o_totalprice, o_custkey % 5)"), 6).as("td"),
        when(col("o_orderpriority").rlike(intish),
          expr("try_cast(o_orderpriority AS INT)")).as("tc_bad"),
        when(substring(col("o_orderpriority"), 1, 1).rlike(intish),
          expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")).as("tc_num"))
      .orderBy("o_orderkey")
  }

  /** posexplode generator — element index + value rows. */
  def genPosexplode(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 8)))
      .select(col("vec_id"), col("pos"),
        round(col("col").cast("double"), 6).as("val"))
      .orderBy("vec_id", "pos")

  /** explode_outer generator — empty arrays keep their parent row with a
    * NULL element (plain explode would drop it). */
  def genExplodeOuter(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), explode_outer(expr(
        "if(n_chars < 150, array(), slice(split(text, ' '), 1, 3))")).as("tok"))
      .orderBy(col("doc_id"), col("tok").asc_nulls_first)

  /** LATERAL correlated subquery (SQL-text entry point): per customer,
    * their 2 most expensive orders — the lateral per-row top-k shape
    * Catalyst decorrelates into a window/join plan. */
  def joinLateral(s: SparkSession, d: String): DataFrame = {
    Tables.view(s, d, "customer")
    Tables.view(s, d, "orders")
    s.sql("""
      SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_custkey = c.c_custkey AND o_totalprice > 400000
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
      ORDER BY c_custkey, o_orderkey""")
  }

  /** Typed Dataset pipeline: as[T] → typed filter → map → groupByKey →
    * mapGroups — the case-class API surface end-to-end. Prices are mapped
    * to integer cents before summing so the per-group fold is order-free
    * exact (groupByKey iterator order is nondeterministic; a double sum
    * would drift in the last ulp). */
  def typedPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .as[OrderRow]
      .filter(_.o_totalprice > 100000.0)
      .map(o => (o.o_custkey, centsHalfAwayFromZero(o.o_totalprice)))
      .groupByKey(_._1)
      .mapGroups { (custkey, rows) =>
        var n = 0L; var cents = 0L
        rows.foreach { r => n += 1; cents += r._2 }
        (custkey, n, cents)
      }
      .toDF("o_custkey", "n_big", "total_cents")
      .orderBy("o_custkey")
  }

  /** Typed joinWith: Dataset[(OrderRow, CustomerRow)] tuples instead of a
    * flattened row — graded on a flattened projection. */
  final case class CustomerRow(c_custkey: Long, c_name: String, c_acctbal: Double)

  def typedJoinWith(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val orders = t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus").as[OrderRow]
      .filter(_.o_totalprice > 450000.0)
    val cust = t(s, d, "customer")
      .select("c_custkey", "c_name", "c_acctbal").as[CustomerRow]
    orders.joinWith(cust, orders("o_custkey") === cust("c_custkey"))
      .map { case (o, c) => (o.o_orderkey, c.c_custkey, c.c_name, o.o_totalprice) }
      .toDF("o_orderkey", "c_custkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Typed cogroup: both sides grouped by the key, one function over the
    * two iterators — the general two-sided custom-merge shape (full outer
    * by construction: keys from either side appear). */
  def typedCogroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val orders = t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus").as[OrderRow]
      .groupByKey(_.o_custkey)
    val cust = t(s, d, "customer")
      .select("c_custkey", "c_name", "c_acctbal").as[CustomerRow]
      .groupByKey(_.c_custkey)
    orders.cogroup(cust) { (key, os, cs) =>
      var n = 0L; var cents = 0L
      os.foreach { o => n += 1; cents += centsHalfAwayFromZero(o.o_totalprice) }
      Iterator.single((key, n, cents, cs.nonEmpty))
    }
      .toDF("custkey", "n_orders", "total_cents", "known_customer")
      .orderBy("custkey")
  }

  /** from_json with an explicit schema — the structured twin of
    * get_json_object (A4): parse props into a typed struct, extract k. */
  def jsonFromStruct(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k").as("k"))
      .orderBy("event_id")

  /** VARIANT semi-structured type (Spark 4): parse props once into a
    * variant, then typed-path extraction — the open-schema ingestion
    * pattern (vs from_json's fixed schema). The extracted VALUE is
    * portable, so the oracle grades it even though the type is
    * Spark-specific. */
  def jsonVariant(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k"),
        expr("try_variant_get(parse_json(props), '$.missing', 'int')").as("missing"))
      .orderBy("event_id")

  /** Case-insensitive semantics via Spark 4 collations (UTF8_LCASE) —
    * the oracle expresses the same predicate with lower() (mechanism
    * differs, semantics identical). */
  def fnCollation(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(col("c_custkey"),
        expr("c_mktsegment = ucase(c_mktsegment) COLLATE UTF8_LCASE").as("eq_uc"),
        expr("startswith(c_name COLLATE UTF8_LCASE, 'CUSTOMER')").as("starts_ci"))
      .orderBy("c_custkey")

  /** MERGE-style upsert without a table format: base ⟗ updates with
    * per-row op semantics (update / insert / delete). The updates frame
    * is derived deterministically from the base. At 100 TB this is the
    * compaction shape: shuffle both sides on the key once, emit the
    * merged snapshot (Delta/Iceberg MERGE INTO compiles to the same
    * join). */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "customer").select("c_custkey", "c_name", "c_acctbal")
    val updates = base
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey").as("u_key"),
        when(col("c_custkey") % 30 === 0, lit("d")).otherwise(lit("u")).as("op"),
        (col("c_acctbal") + 100.0).as("u_acctbal"))
      // insert keys are NEGATED base keys: base keys are positive at every
      // scale factor, so synthetic inserts can never collide with a real
      // key (an additive offset would collide once the table outgrows it)
      .unionAll(base.filter(col("c_custkey") % 1000 === 1)
        .select((-col("c_custkey")).as("u_key"), lit("i").as("op"),
          lit(0.0).as("u_acctbal")))
    base.join(updates, col("c_custkey") === col("u_key"), "full")
      .filter(coalesce(col("op"), lit("keep")) =!= "d")
      .select(
        coalesce(col("c_custkey"), col("u_key")).as("key"),
        coalesce(col("c_name"), lit("NEW")).as("name"),
        round(when(col("op") === "u", col("u_acctbal"))
          .when(col("op") === "i", col("u_acctbal"))
          .otherwise(col("c_acctbal")), 2).as("acctbal"),
        coalesce(col("op"), lit("keep")).as("op"))
      .orderBy("key")
  }

  /** to_json serialization — struct rows back to canonical JSON strings
    * (both engines emit compact key:value with no whitespace). */
  def jsonToString(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_id"),
        // ignoreNullFields=false pins null-field parity with the DuckDB
        // twin: Spark's default OMITS null struct fields while DuckDB's
        // to_json emits "k":null — latent today only because the fixture
        // pins props.k non-null, a fixture regeneration away from a
        // silent hash mismatch
        to_json(struct(col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("k")),
          java.util.Map.of("ignoreNullFields", "false")).as("js"))
      .orderBy("event_id")

  /** Calendar-dimension generator: one row per month over a pinned span —
    * the date-dim builder (sequence + explode; no input table). */
  def genDateSeries(s: SparkSession, d: String): DataFrame =
    s.range(1)
      .select(explode(expr(
        "sequence(DATE'1995-01-01', DATE'1997-12-01', interval 1 month)")).as("month_start"))
      .select(col("month_start"),
        year(col("month_start")).as("y"),
        month(col("month_start")).as("m"),
        quarter(col("month_start")).as("q"))
      .orderBy("month_start")

  /** json_tuple generator — the multi-field JSON extraction surface
    * (one pass per row, N output columns; get_json_object re-parses per
    * field). */
  def jsonTuple(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_id"), json_tuple(col("props"), "k").as("k"))
      .select(col("event_id"), col("k").cast("int").as("k"))
      .orderBy("event_id")

  /** Trigonometric / angular function suite, rounded 6 dp for libm
    * last-ulp differences. */
  def fnTrig(s: SparkSession, d: String): DataFrame = {
    val x = col("p_retailprice") / 1000.0
    t(s, d, "part")
      .select(col("p_partkey"),
        round(sin(x), 6).as("sn"),
        round(cos(x), 6).as("cs"),
        round(tan(x), 6).as("tn"),
        round(atan(x), 6).as("at"),
        round(atan2(x, lit(2.0)), 6).as("at2"),
        round(degrees(x), 6).as("deg"),
        round(radians(x), 6).as("rad"))
      .orderBy("p_partkey")
  }

  /** Second string suite: repeat / reverse / translate / ascii / chr /
    * instr / left / right (fn_string_suite covers case, trim, pad,
    * substring, split). */
  def fnStringSuite2(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(col("c_custkey"),
        repeat(col("c_mktsegment"), 2).as("rep2"),
        reverse(col("c_name")).as("rev"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("tr"),
        ascii(col("c_mktsegment")).as("first_code"),
        chr(col("c_custkey") % 26 + 65).as("letter"),
        instr(col("c_name"), "#").as("hash_pos"),
        expr("left(c_name, 8)").as("l8"),
        expr("right(c_name, 3)").as("r3"))
      .orderBy("c_custkey")

  /** Edit-distance text similarity: levenshtein between each part name
    * and its devoweled form (identical DP definition on both engines). */
  def fnEditDistance(s: SparkSession, d: String): DataFrame = {
    val devowel = regexp_replace(col("p_name"), "[aeiou]", "")
    t(s, d, "part")
      .select(col("p_partkey"),
        levenshtein(col("p_name"), devowel).as("lev"),
        levenshtein(col("p_name"), reverse(col("p_name"))).as("lev_rev"))
      .orderBy("p_partkey")
  }

  /** MapType surface: map construction, str_to_map parsing, key listing,
    * lookup, and map_concat. Oracle-graded since round 7: the output is
    * all scalars whose values the map semantics determine analytically
    * (key order of a map() literal, str_to_map round-trip, map_concat
    * size), so the DuckDB twin states those expectations directly
    * without touching DuckDB's MAP dialect. */
  def fnMapSuite(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .filter(col("c_custkey") <= 100)
      .withColumn("m", map(lit("seg"), col("c_mktsegment"), lit("key"), col("c_custkey").cast("string")))
      .withColumn("sm", expr("str_to_map(concat('seg:', c_mktsegment, ',id:', c_custkey), ',', ':')"))
      .select(col("c_custkey"),
        concat_ws(",", map_keys(col("m"))).as("m_keys"),
        element_at(col("m"), "seg").as("m_seg"),
        element_at(col("sm"), "id").as("sm_id"),
        size(map_concat(col("m"), map(lit("extra"), lit("1")))).as("n_entries"))
      .orderBy("c_custkey")

  /** Text-source roundtrip: write the corpus as line-delimited text files,
    * read back via spark.read.text. Graded on order-free aggregates (line
    * files carry no row order). */
  def textRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = graft.TempDirs.cached("text", d) { dir =>
      // translate is a 1:1 char map: embedded newlines become spaces so
      // one document stays one line (the n_lines grade), while length —
      // the total_chars grade — is preserved exactly. Fixtures are
      // newline-free, so today this is an identity; it makes the op safe
      // for corpora that aren't.
      t(s, d, "documents")
        .select(translate(col("text"), "\n\r", "  ").as("text"))
        .write.mode("overwrite").text(dir)
    }
    s.read.text(tmp)
      .agg(count(lit(1)).as("n_lines"), sum(length(col("value"))).as("total_chars"))
  }

  /** Dataset profiler: per-column row/distinct/null counts and numeric
    * min/max for `orders`, computed in ONE aggregation pass (the five
    * count-distincts expand into the standard multi-distinct 2-phase
    * plan; string columns profile counts only, so the output schema stays
    * uniform). The per-column rows are exploded from the single result
    * row — at 100 TB this is one scan, not one scan per column. */
  def statProfile(s: SparkSession, d: String): DataFrame = {
    val numCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val strCols = Seq("o_orderstatus", "o_orderpriority")
    val aggs = numCols.flatMap(c => Seq(
        count(col(c)).as(s"cnt_$c"), countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"))) ++
      strCols.flatMap(c => Seq(
        count(col(c)).as(s"cnt_$c"), countDistinct(col(c)).as(s"nd_$c")))
    val row = t(s, d, "orders").agg(count(lit(1)).as("n_rows"), aggs: _*)
    val entries = numCols.map(c => struct(lit(c).as("col_name"),
        col("n_rows").as("n"), col(s"nd_$c").as("n_distinct"),
        (col("n_rows") - col(s"cnt_$c")).as("n_null"),
        col(s"min_$c").as("min_v"), col(s"max_$c").as("max_v"))) ++
      strCols.map(c => struct(lit(c).as("col_name"),
        col("n_rows").as("n"), col(s"nd_$c").as("n_distinct"),
        (col("n_rows") - col(s"cnt_$c")).as("n_null"),
        lit(null).cast("double").as("min_v"), lit(null).cast("double").as("max_v")))
    row.select(explode(array(entries: _*)).as("p")).select("p.*").orderBy("col_name")
  }

  val queries: Map[String, Q] = Map(
    "stat_profile" -> (statProfile _),
    "agg_stats_pop" -> (aggStatsPop _),
    "agg_regression" -> (aggRegression _),
    "agg_collect_set" -> (aggCollectSet _),
    "fn_array_suite2" -> (fnArraySuite2 _),
    "fn_try_suite" -> (fnTrySuite _),
    "gen_posexplode" -> (genPosexplode _),
    "gen_explode_outer" -> (genExplodeOuter _),
    "join_lateral" -> (joinLateral _),
    "typed_pipeline" -> (typedPipeline _),
    "typed_joinwith" -> (typedJoinWith _),
    "typed_cogroup" -> (typedCogroup _),
    "json_from_struct" -> (jsonFromStruct _),
    "json_tuple_gen" -> (jsonTuple _),
    "json_to_string" -> (jsonToString _),
    "gen_date_series" -> (genDateSeries _),
    "json_variant" -> (jsonVariant _),
    "fn_collation" -> (fnCollation _),
    "fn_trig" -> (fnTrig _),
    "fn_edit_distance" -> (fnEditDistance _),
    "fn_string_suite2" -> (fnStringSuite2 _),
    "fn_map_suite" -> (fnMapSuite _),
    "merge_upsert" -> (mergeUpsert _),
    "text_roundtrip" -> (textRoundtrip _),
    "agg_minmax_by" -> (aggMinmaxBy _),
    "agg_salted" -> (aggSalted _),
    "join_skew_salted" -> (joinSkewSalted _),
    "agg_histogram" -> (aggHistogram _),
    "agg_topk_heap" -> (aggTopkHeap _),
    "fn_bool_logic_3vl" -> (fnBoolLogic3vl _),
    "agg_bool_bit" -> (aggBoolBit _),
    "win_percent_cume" -> (winPercentCume _),
    "fn_bitwise" -> (fnBitwise _),
    "fn_hash" -> (fnHash _),
    "fn_regex_suite" -> (fnRegexSuite _),
    "fn_interval" -> (fnInterval _),
    "fn_higher_order" -> (fnHigherOrder _),
    "unpivot_melt" -> (unpivotMelt _),
    "scan_partitioned" -> (scanPartitioned _),
    "scan_dpp" -> (scanDpp _),
    "join_bucketed" -> (joinBucketedAgg _),
    "zorder_key" -> (zorderKey _),
  )

  val oracles: Map[String, String] = Map(
    "stat_profile" -> {
      val num = Seq("o_orderkey", "o_custkey", "o_totalprice").map(c =>
        s"SELECT '$c' AS col_name, count(*) AS n, count(DISTINCT $c) AS n_distinct, " +
          s"count(*) - count($c) AS n_null, CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v FROM orders")
      val str = Seq("o_orderstatus", "o_orderpriority").map(c =>
        s"SELECT '$c', count(*), count(DISTINCT $c), count(*) - count($c), " +
          "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM orders")
      (num ++ str).mkString("", " UNION ALL ", " ORDER BY col_name")
    },
    "agg_stats_pop" ->
      ("WITH m AS (SELECT o_orderstatus, avg(o_totalprice) AS mu FROM orders GROUP BY o_orderstatus) " +
        "SELECT o.o_orderstatus, round(var_pop(o_totalprice), 4) AS vp, round(stddev_pop(o_totalprice), 4) AS sp, " +
        "round(avg(pow(o_totalprice - mu, 3)) / pow(avg(pow(o_totalprice - mu, 2)), 1.5), 4) AS skew, " +
        "round(avg(pow(o_totalprice - mu, 4)) / pow(avg(pow(o_totalprice - mu, 2)), 2) - 3, 4) AS kurt " +
        "FROM orders o JOIN m ON o.o_orderstatus = m.o_orderstatus GROUP BY o.o_orderstatus, mu ORDER BY o.o_orderstatus"),
    "agg_regression" ->
      "SELECT l_returnflag, round(regr_slope(l_extendedprice, l_quantity), 4) AS slope, round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept, round(regr_r2(l_extendedprice, l_quantity), 4) AS r2, CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n, round(regr_avgx(l_extendedprice, l_quantity), 4) AS avgx FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "agg_collect_set" ->
      "SELECT c_nationkey, string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segs FROM customer GROUP BY c_nationkey ORDER BY c_nationkey",
    "fn_array_suite2" ->
      ("WITH p AS (SELECT p_partkey, [p_size, CAST(p_partkey % 10 AS INTEGER), 3] AS arr FROM part) " +
        "SELECT p_partkey, list_contains(arr, 3) AS has3, CAST(list_position(arr, 3) AS BIGINT) AS pos3, array_to_string(list_sort(arr), ',') AS sorted, len(list_intersect(arr, [1, 2, 48])) > 0 AS ovl, array_to_string(list_sort(list_distinct(arr || [1, 2])), ',') AS uni FROM p ORDER BY p_partkey"),
    "fn_try_suite" ->
      "SELECT o_orderkey, round(o_totalprice / nullif(o_custkey % 5, 0), 6) AS td, TRY_CAST(o_orderpriority AS INTEGER) AS tc_bad, TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS tc_num FROM orders ORDER BY o_orderkey",
    "gen_posexplode" ->
      "SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos, round(CAST(embedding[i] AS DOUBLE), 6) AS val FROM (SELECT vec_id, embedding, unnest(generate_series(1, 8)) AS i FROM embeddings WHERE vec_id < 10) ORDER BY vec_id, pos",
    "gen_explode_outer" ->
      ("WITH d AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 40) " +
        "SELECT doc_id, tok FROM (SELECT doc_id, unnest(ws[1:3]) AS tok FROM d WHERE n_chars >= 150 " +
        "UNION ALL SELECT doc_id, NULL FROM d WHERE n_chars < 150) ORDER BY doc_id, tok NULLS FIRST"),
    "join_lateral" ->
      "SELECT c.c_custkey, l.o_orderkey, l.o_totalprice FROM customer c, LATERAL (SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey = c.c_custkey AND o_totalprice > 400000 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l ORDER BY c_custkey, o_orderkey",
    "typed_pipeline" ->
      "SELECT o_custkey, count(*) AS n_big, CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents FROM orders WHERE o_totalprice > 100000.0 GROUP BY o_custkey ORDER BY o_custkey",
    "typed_joinwith" ->
      "SELECT o_orderkey, c_custkey, c_name, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_totalprice > 450000.0 ORDER BY o_orderkey",
    "typed_cogroup" ->
      ("WITH o AS (SELECT o_custkey AS custkey, count(*) AS n_orders, CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents FROM orders GROUP BY o_custkey) " +
        "SELECT coalesce(o.custkey, c.c_custkey) AS custkey, coalesce(o.n_orders, 0) AS n_orders, coalesce(o.total_cents, 0) AS total_cents, c.c_custkey IS NOT NULL AS known_customer " +
        "FROM o FULL JOIN customer c ON o.custkey = c.c_custkey ORDER BY custkey"),
    "json_from_struct" ->
      "SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k FROM events ORDER BY event_id",
    "json_tuple_gen" ->
      "SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k FROM events ORDER BY event_id",
    "json_to_string" ->
      "SELECT event_id, to_json(struct_pack(event_id := event_id, k := CAST(props->>'$.k' AS INTEGER))) AS js FROM events ORDER BY event_id",
    "gen_date_series" ->
      "SELECT CAST(ms AS DATE) AS month_start, CAST(year(ms) AS INTEGER) AS y, CAST(month(ms) AS INTEGER) AS m, CAST(quarter(ms) AS INTEGER) AS q FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '1997-12-01', INTERVAL 1 MONTH)) AS ms) ORDER BY month_start",
    "json_variant" ->
      "SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k, CAST(props->>'$.missing' AS INTEGER) AS missing FROM events ORDER BY event_id",
    "fn_collation" ->
      "SELECT c_custkey, lower(c_mktsegment) = lower(upper(c_mktsegment)) AS eq_uc, lower(c_name) LIKE 'customer%' AS starts_ci FROM customer ORDER BY c_custkey",
    "fn_trig" ->
      "SELECT p_partkey, round(sin(p_retailprice / 1000.0), 6) AS sn, round(cos(p_retailprice / 1000.0), 6) AS cs, round(tan(p_retailprice / 1000.0), 6) AS tn, round(atan(p_retailprice / 1000.0), 6) AS at, round(atan2(p_retailprice / 1000.0, 2.0), 6) AS at2, round(degrees(p_retailprice / 1000.0), 6) AS deg, round(radians(p_retailprice / 1000.0), 6) AS rad FROM part ORDER BY p_partkey",
    "fn_edit_distance" ->
      "SELECT p_partkey, CAST(levenshtein(p_name, regexp_replace(p_name, '[aeiou]', '', 'g')) AS INTEGER) AS lev, CAST(levenshtein(p_name, reverse(p_name)) AS INTEGER) AS lev_rev FROM part ORDER BY p_partkey",
    // round-7 promotion: the op exercises MapType internally but its
    // OUTPUT is all scalars with analytically-determined values (map()
    // preserves literal key order; str_to_map round-trips the id;
    // map_concat adds one key), so the oracle states the expected
    // semantics directly — no DuckDB MAP dialect involved.
    "fn_map_suite" ->
      "SELECT c_custkey, 'seg,key' AS m_keys, c_mktsegment AS m_seg, CAST(c_custkey AS VARCHAR) AS sm_id, CAST(3 AS INTEGER) AS n_entries FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey",
    "fn_string_suite2" ->
      "SELECT c_custkey, repeat(c_mktsegment, 2) AS rep2, reverse(c_name) AS rev, translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr, CAST(ascii(c_mktsegment) AS INTEGER) AS first_code, chr(CAST(c_custkey % 26 + 65 AS INTEGER)) AS letter, CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos, left(c_name, 8) AS l8, right(c_name, 3) AS r3 FROM customer ORDER BY c_custkey",
    "merge_upsert" ->
      ("WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer), " +
        "u AS (SELECT c_custkey AS u_key, CASE WHEN c_custkey % 30 = 0 THEN 'd' ELSE 'u' END AS op, c_acctbal + 100.0 AS u_acctbal FROM base WHERE c_custkey % 10 = 0 " +
        "UNION ALL SELECT -c_custkey, 'i', 0.0 FROM base WHERE c_custkey % 1000 = 1), " +
        "m AS (SELECT * FROM base FULL JOIN u ON c_custkey = u_key) " +
        "SELECT coalesce(c_custkey, u_key) AS key, coalesce(c_name, 'NEW') AS name, round(CASE WHEN op IN ('u', 'i') THEN u_acctbal ELSE c_acctbal END, 2) AS acctbal, coalesce(op, 'keep') AS op FROM m WHERE coalesce(op, 'keep') <> 'd' ORDER BY key"),
    "text_roundtrip" ->
      "SELECT count(*) AS n_lines, CAST(sum(length(text)) AS BIGINT) AS total_chars FROM documents",
    "agg_minmax_by" ->
      "SELECT o_orderstatus, (max(struct_pack(p := o_totalprice, k := o_orderkey))).k AS best_key, (min(struct_pack(p := o_totalprice, k := o_orderkey))).k AS worst_key, round(max(o_totalprice), 2) AS max_price, round(min(o_totalprice), 2) AS min_price FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    "agg_salted" ->
      "SELECT l_returnflag AS key, round(sum(l_quantity), 2) AS sum_v FROM lineitem GROUP BY l_returnflag ORDER BY key",
    "join_skew_salted" ->
      ("SELECT s_nationkey, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "GROUP BY s_nationkey ORDER BY s_nationkey"),
    "agg_histogram" ->
      "SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INTEGER) AS bucket, count(*) AS n, round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi FROM orders GROUP BY 1 ORDER BY bucket",
    // the window formulation IS the oracle for the heap aggregator —
    // proving the two top-k paths equivalent on the same data.
    "agg_topk_heap" ->
      ("WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk FROM orders) " +
        "SELECT o_custkey, CAST(rnk AS INTEGER) AS rnk, o_orderkey, round(o_totalprice, 2) AS total_price " +
        "FROM r WHERE rnk <= 3 ORDER BY o_custkey, rnk"),
    "fn_bool_logic_3vl" ->
      ("WITH v AS (SELECT * FROM (VALUES (1, true), (2, false), (3, CAST(NULL AS BOOLEAN))) t(i, b)) " +
        "SELECT a.i AS ai, b.i AS bi, (a.b AND b.b) AS and_r, (a.b OR b.b) AS or_r, (NOT a.b) AS not_a, (a.b = b.b) AS eq_r, (a.b IS NOT DISTINCT FROM b.b) AS same_r FROM v a CROSS JOIN v b ORDER BY ai, bi"),
    "agg_bool_bit" ->
      "SELECT l_returnflag, bool_and(l_quantity >= 1.0) AS all_qty, bool_or(l_discount > 0.09) AS any_disc, bit_and(l_linenumber) AS b_and, bit_or(l_linenumber) AS b_or, bit_xor(l_linenumber) AS b_xor FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "win_percent_cume" ->
      "SELECT p_partkey, p_brand, p_retailprice, round(percent_rank() OVER w, 6) AS pr, round(cume_dist() OVER w, 6) AS cd, nth_value(p_partkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key FROM part WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) ORDER BY p_brand, p_retailprice, p_partkey",
    "fn_bitwise" ->
      "SELECT p_partkey, p_partkey & 255 AS b_and, p_partkey | 4096 AS b_or, xor(p_partkey, 85) AS b_xor, (p_partkey % 16) << 2 AS shl, p_partkey >> 3 AS shr, CAST(bit_count(p_partkey) AS INTEGER) AS pop FROM part ORDER BY p_partkey",
    "fn_hash" ->
      "SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256 FROM customer ORDER BY c_custkey",
    "fn_regex_suite" ->
      "SELECT p_partkey, CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS INTEGER) AS n_vowel_runs, regexp_matches(p_name, '^[a-m]') AS starts_early, regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled, CAST(length(regexp_extract(p_name, '^(\\w+)', 1)) AS INTEGER) AS first_word_len FROM part ORDER BY p_partkey",
    "fn_interval" ->
      "SELECT o_orderkey, CAST(quarter(o_orderdate) AS INTEGER) AS q, CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week, CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus_month, CAST(o_orderdate AS DATE) - 15 AS minus_15d, make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 1) AS month_start FROM orders ORDER BY o_orderkey",
    "fn_higher_order" ->
      "SELECT vec_id, round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 4) AS ssq, CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS INTEGER) AS n_pos, round(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 6) AS max_abs FROM embeddings ORDER BY vec_id",
    "unpivot_melt" ->
      "SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part UNION ALL SELECT p_partkey, 'retail', p_retailprice FROM part ORDER BY p_partkey, metric",
    "scan_partitioned" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem WHERE l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber, l_quantity",
    "scan_dpp" ->
      ("SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE n_regionkey = 0 GROUP BY n_name ORDER BY n_name"),
    "join_bucketed" ->
      ("SELECT o_orderpriority, l_returnflag, count(*) AS n_items, round(sum(l_extendedprice), 2) AS total " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "zorder_key" ->
      (s"SELECT l_orderkey, l_linenumber, ${ScaleOps.zSql("l_partkey", "l_suppkey")} AS z " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
  )
}
