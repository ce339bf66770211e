package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.DataQualityOps

/** The dq_* audit keys on the sf0.001 fixtures (golden shapes + the one
  * genuine fixture defect they must surface), plus planted-dirty frames
  * through the package-visible rule kernels — proving each rule FIRES,
  * not just that clean data audits clean. */
class DataQualityOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("dq_uniqueness surfaces the fixture's real composite-key duplicates") {
    val rows = DataQualityOps.dqUniqueness(spark, SF).collect()
    assert(rows.length == 7)
    val byKey = rows.map(r => r.getString(0) -> r).toMap
    // single-column PKs are clean in the fixture
    Seq("orders.o_orderkey", "customer.c_custkey", "part.p_partkey",
      "supplier.s_suppkey", "events.event_id", "documents.doc_id").foreach { k =>
      assert(byKey(k).getLong(3) == 0L, s"$k expected unique")
    }
    // the composite lineitem key is genuinely violated (6000 rows,
    // 4599 distinct pairs at sf0.001) — the audit must say so
    val li = byKey("lineitem.(l_orderkey,l_linenumber)")
    assert(li.getLong(1) == 6000L && li.getLong(2) == 4599L && li.getLong(3) == 1401L)
  }

  test("composite-key distinct keeps NULL-component rows (the oracle's row-value semantics)") {
    // DuckDB: count(DISTINCT (a,b)) over {(1,1),(1,NULL),(NULL,2),(1,1)} = 3;
    // Spark's multi-arg countDistinct would return 1 — the struct path
    // must match the oracle, not that
    val dirty = Seq((Some(1L), Some(1L)), (Some(1L), None), (None, Some(2L)),
      (Some(1L), Some(1L))).toDF("a", "b")
    val r = DataQualityOps.uniq(dirty, "t", Seq("a", "b")).head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 3L && r.getLong(3) == 1L)
  }

  test("nullsDistinct mode: each NULL key row is its own key (SQL UNIQUE semantics)") {
    // planted NULL-PK table: {1, 1, NULL, NULL, 2}
    val dirty = Seq(Some(1L), Some(1L), None, None, Some(2L)).toDF("k")
    // default count(DISTINCT) semantics: 2 keys, every NULL row a "dup"
    val std = DataQualityOps.uniq(dirty, "t", Seq("k")).head()
    assert(std.getLong(1) == 5L && std.getLong(2) == 2L && std.getLong(3) == 3L)
    // NULLS DISTINCT: the two NULL rows are two distinct keys — only the
    // genuine duplicate 1 remains
    val nd = DataQualityOps.uniq(dirty, "t", Seq("k"), nullsDistinct = true).head()
    assert(nd.getLong(1) == 5L && nd.getLong(2) == 4L && nd.getLong(3) == 1L)
    // composite: any-NULL-component rows are each distinct under the mode
    val comp = Seq((Some(1L), Some(1L)), (Some(1L), None), (Some(1L), None),
      (Some(1L), Some(1L))).toDF("a", "b")
    val cStd = DataQualityOps.uniq(comp, "t", Seq("a", "b")).head()
    assert(cStd.getLong(2) == 2L && cStd.getLong(3) == 2L) // row-value: (1,NULL) groups
    val cNd = DataQualityOps.uniq(comp, "t", Seq("a", "b"), nullsDistinct = true).head()
    assert(cNd.getLong(2) == 3L && cNd.getLong(3) == 1L)
    // empty table: both modes report clean zeros, no NULL sums
    val empty = Seq.empty[Option[Long]].toDF("k")
    Seq(false, true).foreach { m =>
      val e = DataQualityOps.uniq(empty, "t", Seq("k"), nullsDistinct = m).head()
      assert(e.getLong(1) == 0L && e.getLong(2) == 0L && e.getLong(3) == 0L)
    }
  }

  test("dq_freshness is session-timezone independent (NTZ wall clock read as UTC)") {
    val utc = DataQualityOps.dqFreshness(spark, SF).collect().map(_.toSeq).toSeq
    // a non-UTC embedder: same context, separate session conf — exactly
    // the integration GraftSession cannot control
    val tokyo = spark.newSession()
    tokyo.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    val shifted = DataQualityOps.dqFreshness(tokyo, SF).collect().map(_.toSeq).toSeq
    assert(utc == shifted,
      s"freshness audit drifted with the session timezone:\n$utc\nvs\n$shifted")
  }

  test("zoneFreeMicros: NTZ, TIMESTAMP, and DATE spellings of one instant agree; other types fail loudly") {
    import org.apache.spark.sql.functions.col
    // 2024-03-15 00:00:00 UTC = 1710460800 s; midnight so the DATE
    // spelling carries the identical instant
    val us = 1710460800L * 1000000L
    def micros(df: org.apache.spark.sql.DataFrame): Long =
      df.select(DataQualityOps.zoneFreeMicros(df, "t")).head().getLong(0)
    val ntz = Seq(java.time.LocalDateTime.of(2024, 3, 15, 0, 0, 0)).toDF("t")
    val ts = Seq(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1710460800L))).toDF("t")
    val dt = Seq(java.sql.Date.valueOf("2024-03-15")).toDF("t")
    assert(micros(ntz) == us, s"NTZ: ${micros(ntz)}")
    assert(micros(dt) == us, s"DATE: ${micros(dt)}")
    // the TIMESTAMP spelling reads the stored instant zone-free even
    // from a non-UTC session (unix_micros is zone-independent)
    assert(micros(ts) == us, s"TIMESTAMP: ${micros(ts)}")
    // a string column is not silently coerced into a zone-dependent read
    val bad = Seq("2024-03-15").toDF("t")
    val e = intercept[IllegalStateException](DataQualityOps.zoneFreeMicros(bad, "t"))
    assert(e.getMessage.contains("unsupported time type"))
  }

  test("dq_referential: fixture star schema has zero orphans; planted orphans counted") {
    assert(DataQualityOps.dqReferential(spark, SF).collect()
      .forall(_.getLong(2) == 0L))
    val child = Seq(1L, 2L, 3L, 99L, 98L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("p")
    val r = DataQualityOps.refCheck(child, "k", parent, "p", "t").head()
    assert(r.getLong(1) == 5L && r.getLong(2) == 2L)
    // a NULL child key is an orphan (matches the oracle's NOT EXISTS)
    val withNull = Seq(Some(1L), None).toDF("k")
    assert(DataQualityOps.refCheck(withNull, "k", parent, "p", "t")
      .head().getLong(2) == 1L)
  }

  test("dq_completeness: fixture is fully populated; planted nulls/blanks tallied") {
    val rows = DataQualityOps.dqCompleteness(spark, SF).collect()
    assert(rows.length == 8)
    assert(rows.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L &&
      r.getDouble(4) == 0.0))
    val dirty = Seq(
      (Some("ok"), Some(1L)), (None, Some(2L)), (Some("  "), None), (Some(""), Some(4L))
    ).toDF("s", "v")
    val audit = DataQualityOps.completenessFor(dirty, "t", Seq("s"), Seq("v"))
      .collect().map(r => r.getString(1) -> r).toMap
    val sRow = audit("t.s")
    assert(sRow.getLong(0) == 4L && sRow.getLong(2) == 1L && sRow.getLong(3) == 2L)
    assert(audit("t.v").getLong(2) == 1L && audit("t.v").getLong(3) == 0L)
  }

  test("dq_accepted_values / dq_bounds: fixture conforms; planted violations fire") {
    assert(DataQualityOps.dqAcceptedValues(spark, SF).collect()
      .forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
    assert(DataQualityOps.dqBounds(spark, SF).collect()
      .forall(_.getLong(2) == 0L))
    // planted: 2 out-of-domain values (one twice) + a NULL → 4 violations,
    // 2 distinct bad values (NULL excluded from the distinct tally)
    val dirty = Seq(Some("ok"), Some("bad1"), Some("bad1"), Some("bad2"), None)
      .toDF("v")
    val r = DataQualityOps.ruleAudit(dirty,
      Seq(("r", col("v").isin("ok"), Some(col("v"))))).head()
    assert(r.getLong(0) == 5L && r.getLong(2) == 4L && r.getLong(3) == 2L)
    // bounds: NULL counts as a violation even without a watched column
    val nums = Seq(Some(1.0), Some(-1.0), None).toDF("x")
    val b = DataQualityOps.ruleAudit(nums, Seq(("b", col("x") > 0.0, None))).head()
    assert(b.getLong(2) == 2L)
  }

  test("dq_freshness spans are non-negative integer microseconds") {
    val rows = DataQualityOps.dqFreshness(spark, SF).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("events.ts", "orders.o_orderdate"))
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      assert(r.getLong(3) == (r.getLong(2) - r.getLong(1)) / 86400000000L)
    }
  }

  test("dq_volume_anomaly: flags agree with the driver-recomputed integer 3-sigma test") {
    val rows = DataQualityOps.dqVolumeAnomaly(spark, SF).collect()
    assert(rows.nonEmpty)
    val cs = rows.map(_.getLong(1))
    val nd = BigInt(cs.length); val sv = cs.map(BigInt(_)).sum
    val q = cs.map(c => BigInt(c) * BigInt(c)).sum
    rows.foreach { r =>
      val dev = nd * BigInt(r.getLong(1)) - sv
      val want = if (dev * dev > 9 * (nd * q - sv * sv)) 1L else 0L
      assert(r.getLong(2) == want, s"day ${r.get(0)}: flag ${r.getLong(2)} != $want")
    }
  }

  test("audit history rides the versioned table: quality drift is time-travelable") {
    // the operational loop a 100 TB pipeline runs: each ingest's audit
    // row-set appends to a graft-vt table, so "when did quality regress"
    // is a time-travel read, not a log archaeology session
    val root = java.nio.file.Files.createTempDirectory("dq-vt").toString + "/audits"
    def audit(df: org.apache.spark.sql.DataFrame, ver: Long) =
      DataQualityOps.ruleAudit(df, Seq(("bounds:x>0", col("x") > 0.0, None)))
        .select(lit(ver).as("audit_v"), col("rule_name"), col("n_rows"), col("n_violations"))
    val clean = Seq(Some(1.0), Some(2.0)).toDF("x")
    val t = graft.tables.VersionedTable.create(spark, root, audit(clean, 1L))
    val dirty = Seq(Some(1.0), Some(-5.0), None).toDF("x") // a regression lands
    t.append(audit(dirty, 2L))
    // v0 = the clean era; HEAD shows the drift, rule kernel unchanged
    assert(t.read(Some(0)).count() == 1L)
    val head = t.read().orderBy("audit_v").collect()
    assert(head.length == 2)
    assert(head(0).getLong(3) == 0L, s"clean audit flagged: ${head(0)}")
    assert(head(1).getLong(3) == 2L, s"dirty audit missed: ${head(1)}")
  }

  test("single-scan shape: one audit pass plans exactly one scan per table") {
    // the stack-over-1-row-aggregate form must not fan one scan per metric
    Seq(DataQualityOps.dqBounds(spark, SF),
        DataQualityOps.dqAcceptedValues(spark, SF)).foreach { df =>
      val scans = "FileScan parquet".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
      assert(scans == 4, s"expected 4 table scans (one per audited table), got $scans")
    }
  }
}
