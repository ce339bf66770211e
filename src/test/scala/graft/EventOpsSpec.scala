package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.EventOps

class EventOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("sessionize: gap > 30min splits, events are conserved, sessions don't overlap") {
    val sessions = EventOps.sessionize(Tables.load(spark, SF, "events")).collect()
    val total = Tables.load(spark, SF, "events").count()
    assert(sessions.map(_.getAs[Long]("n_events")).sum == total)
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("sess_id"))
      sorted.foreach(r => assert(!r.getAs[Timestamp]("session_start").after(r.getAs[Timestamp]("session_end"))))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        val gapMs = b.getAs[Timestamp]("session_start").getTime - a.getAs[Timestamp]("session_end").getTime
        assert(gapMs > 30 * 60 * 1000L, s"adjacent sessions closer than the gap: $gapMs ms")
      }
    }
  }

  test("sessionize on constructed input: 0,10,50min -> two sessions") {
    val df = Seq(
      (1L, ts(0), 7L), (2L, ts(10), 7L), (3L, ts(50), 7L)
    ).toDF("event_id", "ts", "user_id")
    val out = EventOps.sessionize(df).orderBy("sess_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2 && out(1).getAs[Long]("n_events") == 1)
  }

  test("dedupEvents keeps one deterministic survivor per event_id") {
    val df = Seq(
      (1L, ts(5), 7L, "view", 2.0),
      (1L, ts(3), 9L, "click", 1.0), // duplicate id, earlier ts, other cols
      (2L, ts(8), 7L, "view", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.dedupEvents(df).orderBy("event_id").collect()
    assert(out.length == 2)
    // Survivor is a REAL row — the full (ts, user_id, event_type, value)
    // tuple of the earliest duplicate, never a column-wise mix.
    val r1 = out(0)
    assert(r1.getAs[Timestamp]("ts") == ts(3) && r1.getAs[Long]("user_id") == 9L &&
      r1.getAs[String]("event_type") == "click" && r1.getAs[Double]("value") == 1.0)
  }

  test("tumbling windows conserve events and align to the hour") {
    val out = EventOps.streamTumbling(spark, SF).collect()
    val total = Tables.load(spark, SF, "events").count()
    assert(out.map(_.getAs[Long]("cnt")).sum == total)
    out.foreach { r =>
      val start = r.getAs[Timestamp]("hour_start").getTime
      assert(start % (3600 * 1000L) == 0, s"window start not hour-aligned: $start")
    }
  }

  test("sliding 1h/30min windows count each event exactly twice") {
    val slidingTotal = EventOps.streamSliding(spark, SF).agg(sum("cnt")).head().getLong(0)
    val total = Tables.load(spark, SF, "events").count()
    assert(slidingTotal == 2 * total)
  }

  test("attribution matches a plain-Scala per-user replay") {
    val raw = Tables.load(spark, SF, "events")
      .select("event_id", "user_id", "event_type", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getAs[Timestamp](3).getTime -> r.getLong(0)))
    // replay: per user in (ts, event_id) order, track first/last touch
    type Touch = Option[(Long, String)]
    val want: Map[Long, (Touch, Touch)] =
      raw.groupBy(_._2).toSeq.flatMap { case (_, es) =>
        var firstT: Touch = None
        var lastT: Touch = None
        es.sortBy(_._4).toSeq.flatMap { case (id, _, tpe, _) =>
          val out: Option[(Long, (Touch, Touch))] =
            if (tpe == "purchase") Some(id -> ((firstT, lastT))) else None
          if (tpe == "click" || tpe == "view") {
            if (firstT.isEmpty) firstT = Some((id, tpe))
            lastT = Some((id, tpe))
          }
          out
        }
      }.toMap
    val got = EventOps.eventAttribution(spark, SF).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (f, l) = want(r.getAs[Long]("purchase_id"))
      assert(Option(r.getAs[java.lang.Long]("first_touch_id")).map(_.toLong) == f.map(_._1))
      assert(Option(r.getAs[String]("first_touch_type")) == f.map(_._2))
      assert(Option(r.getAs[java.lang.Long]("last_touch_id")).map(_.toLong) == l.map(_._1))
      assert(Option(r.getAs[String]("last_touch_type")) == l.map(_._2))
    }
    // organic purchases (no prior touch) exist and keep NULL attribution
    assert(got.exists(_.isNullAt(3)) == want.values.exists(_._1.isEmpty))
  }

  test("ts_interpolate: dense grid, obs endpoints, exact obs cents, linear gaps") {
    // independent daily-cents replay (Spark's own to_date on both sides,
    // so the check is tz-representation-agnostic)
    val daily: Map[(Long, String), Long] = Tables.load(spark, SF, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"), col("value"))
      .collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .map { case (k, rs) =>
        k -> rs.map(r => math.floor(r.getDouble(2) * 100.0 + 0.5).toLong).sum
      }
    val out = EventOps.tsInterpolate(spark, SF).collect()
    assert(out.nonEmpty && out.exists(_.getString(2) == "gap"))
    out.groupBy(_.getLong(0)).foreach { case (u, rs0) =>
      val rs = rs0.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      // dense: exactly one row per day of the user's observed span
      rs.map(_.getDate(1).toLocalDate.toEpochDay).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b == a + 1, s"user $u grid gap")
        case _ =>
      }
      assert(rs.head.getString(2) == "obs" && rs.last.getString(2) == "obs")
      val obsIdx = rs.indices.filter(i => rs(i).getString(2) == "obs")
      rs.indices.foreach { i =>
        val r = rs(i)
        val key = (u, r.getDate(1).toString)
        if (r.getString(2) == "obs") {
          assert(daily(key).toDouble == r.getDouble(3), s"user $u day $key")
        } else {
          assert(!daily.contains(key))
          // linear between the neighboring observed days, same rounding
          val p = obsIdx.filter(_ < i).max; val nx = obsIdx.filter(_ > i).min
          val pv = daily((u, rs(p).getDate(1).toString)).toDouble
          val nv = daily((u, rs(nx).getDate(1).toString)).toDouble
          val want = math.floor((pv + (nv - pv) * ((i - p).toDouble / (nx - p).toDouble)) * 10000.0 + 0.5) / 10000.0
          assert(r.getDouble(3) == want, s"user $u idx $i: ${r.getDouble(3)} want $want")
        }
      }
    }
  }

  test("ts_ewma: BIT-EXACT equality with the textbook recurrence") {
    val out = EventOps.tsEwma(spark, SF).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (u, rs0) =>
      val rs = rs0.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      assert(rs.length <= 31, s"user $u span ${rs.length} exceeds fixture month")
      var sPrev = 0.0
      rs.zipWithIndex.foreach { case (r, k) =>
        val x = r.getLong(2).toDouble
        val sK = if (k == 0) x else 0.5 * x + 0.5 * sPrev
        // exact == : power-of-two weights over integer cents never round
        assert(r.getDouble(3) == sK, s"user $u k=$k: ${r.getDouble(3)} != $sK")
        sPrev = sK
      }
    }
  }

  private def dailyCentsReplay(): Seq[(String, Long)] =
    Tables.load(spark, SF, "events")
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).cast("string").as("day"), col("value")).collect()
      .groupBy(_.getString(0))
      .map { case (d, rs) =>
        d -> rs.map(r => math.floor(r.getDouble(1) * 100.0 + 0.5).toLong).sum
      }.toSeq.sortBy(_._1)

  test("cohort LTV matches a first-week replay; revenue is conserved") {
    val rows = Tables.load(spark, SF, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").cast("string").as("w"),
        col("event_type"), col("value")).collect()
    val cohort: Map[Long, String] = rows.groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(_.getString(1)).min }
    val cells = scala.collection.mutable.Map.empty[(String, Int), (Set[Long], Long)]
    rows.filter(_.getString(2) == "purchase").foreach { r =>
      val u = r.getLong(0)
      val cw = cohort(u)
      val age = ((java.time.LocalDate.parse(r.getString(1)).toEpochDay -
        java.time.LocalDate.parse(cw).toEpochDay) / 7).toInt
      val c = math.floor(r.getDouble(3) * 100.0 + 0.5).toLong
      val (us, rev) = cells.getOrElse((cw, age), (Set.empty[Long], 0L))
      cells((cw, age)) = (us + u, rev + c)
    }
    val want = cells.toSeq.map { case ((cw, a), (us, rev)) => (cw, a, us.size.toLong, rev) }
      .sortBy(x => (x._1, x._2))
    val got = EventOps.eventCohortLtv(spark, SF).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"got ${got.take(3)} want ${want.take(3)}")
    got.foreach { case (_, age, nb, rev) => assert(age >= 0 && nb > 0 && rev > 0) }
    // conservation: matrix total == all purchase cents (every buyer has a cohort)
    val totalCents = rows.filter(_.getString(2) == "purchase")
      .map(r => math.floor(r.getDouble(3) * 100.0 + 0.5).toLong).sum
    assert(got.map(_._4).sum == totalCents)
  }

  test("event_rfm: metric replay, balanced quintiles, segment ladder consistency") {
    val pur = Tables.load(spark, SF, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"), col("value"))
      .collect().groupBy(_.getLong(0))
    val lastDayAll = pur.values.flatten.map(_.getString(1)).max
    val got = EventOps.eventRfm(spark, SF).collect()
    assert(got.length == pur.size)
    got.foreach { r =>
      val g = pur(r.getLong(0))
      assert(r.getLong(2) == g.size.toLong) // frequency
      assert(r.getLong(3) == g.map(x => math.floor(x.getDouble(2) * 100.0 + 0.5).toLong).sum)
      val lastDay = g.map(_.getString(1)).max
      val wantRec = java.time.LocalDate.parse(lastDayAll).toEpochDay -
        java.time.LocalDate.parse(lastDay).toEpochDay
      assert(r.getLong(1) == wantRec, s"user ${r.getLong(0)} recency")
      val (rs, fs, ms) = (r.getInt(4), r.getInt(5), r.getInt(6))
      val want =
        if (rs >= 4 && fs >= 4 && ms >= 4) "champion"
        else if (rs >= 4 && fs >= 3) "loyal"
        else if (rs >= 4) "recent"
        else if (rs <= 2 && fs >= 4) "at_risk"
        else if (rs <= 2 && fs <= 2) "hibernating"
        else "regular"
      assert(r.getString(7) == want)
    }
    // ntile(5) balance: bucket sizes differ by at most one
    Seq(4, 5, 6).foreach { c =>
      val sizes = got.groupBy(_.getInt(c)).view.mapValues(_.size).toMap
      assert(sizes.keySet == (1 to 5).toSet)
      assert(sizes.values.max - sizes.values.min <= 1, s"col $c: $sizes")
    }
  }

  test("ts_autocorr matches an exact moment replay over lag pairs") {
    val xs = dailyCentsReplay().map(_._2)
    val got = EventOps.tsAutocorr(spark, SF).collect()
    assert(got.length == 7)
    got.foreach { row =>
      val k = row.getInt(0)
      val pairs = xs.dropRight(k).zip(xs.drop(k))
      val n = pairs.length.toDouble
      val sa = pairs.map(_._1).sum.toDouble; val sb = pairs.map(_._2).sum.toDouble
      val saa = pairs.map(p => p._1 * p._1).sum.toDouble
      val sbb = pairs.map(p => p._2 * p._2).sum.toDouble
      val sab = pairs.map(p => p._1 * p._2).sum.toDouble
      val r = (n * sab - sa * sb) / math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
      assert(row.getLong(1) == pairs.length.toLong)
      assert(math.abs(row.getDouble(2) - r) <= 5e-7, s"lag $k")
      assert(row.getDouble(2) >= -1.0 && row.getDouble(2) <= 1.0)
    }
  }

  test("ts_changepoint matches an exact integer CUSUM replay") {
    val xs = dailyCentsReplay()
    val n = xs.length.toLong; val tt = xs.map(_._2).sum
    var p = 0L
    val scans = xs.dropRight(1).zipWithIndex.map { case ((d, x), i) =>
      p += x; (d, i + 1L, math.abs(n * p - (i + 1L) * tt), p)
    }
    // maxBy keeps the FIRST max in ascending-day order = earliest tie-break
    val best = scans.maxBy(_._3)
    val row = EventOps.tsChangepoint(spark, SF).collect()
    assert(row.length == 1)
    assert(row(0).getDate(0).toString == best._1, s"${row(0)} vs $best")
    assert(row(0).getLong(1) == best._2 && row(0).getLong(2) == n)
    assert(row(0).getLong(3) == best._3)
    val mb = math.floor(best._4.toDouble / best._2.toDouble * 10000.0 + 0.5) / 10000.0
    val ma = math.floor((tt - best._4).toDouble / (n - best._2).toDouble * 10000.0 + 0.5) / 10000.0
    assert(row(0).getDouble(4) == mb && row(0).getDouble(5) == ma)
  }

  test("event_streaks matches a direct gaps-and-islands replay") {
    val byUser: Map[Long, Seq[Long]] = Tables.load(spark, SF, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) =>
        u -> rs.map(_.getDate(1).toLocalDate.toEpochDay).sorted.toSeq
      }
    val got = EventOps.eventStreaks(spark, SF).collect()
    assert(got.length == byUser.size)
    got.foreach { r =>
      val days = byUser(r.getLong(0))
      // split into consecutive runs
      val runs = days.foldLeft(List.empty[List[Long]]) {
        case (acc @ (h :: t), d2) if h.head == d2 - 1 => (d2 :: h) :: t
        case (acc, d2) => List(d2) :: acc
      }.map(_.reverse).reverse
      assert(r.getAs[Long]("n_active_days") == days.length.toLong)
      assert(r.getAs[Long]("n_streaks") == runs.length.toLong)
      val mx = runs.map(_.length).max
      assert(r.getAs[Long]("max_streak") == mx.toLong)
      val wantStart = runs.filter(_.length == mx).map(_.head).min
      assert(r.getDate(4).toLocalDate.toEpochDay == wantStart)
      // streak partition invariants
      assert(runs.map(_.length).sum == days.length)
    }
  }

  test("event_path_topk matches a direct in-memory path count") {
    val raw = Tables.load(spark, SF, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0),
        (r.getAs[Timestamp](1).getTime, r.getAs[Timestamp](1).getNanos, r.getLong(2)),
        r.getString(3)))
    val counts: Map[String, Long] = raw.groupBy(_._1).map { case (_, es) =>
      es.sortBy(_._2).take(4).map(_._3).mkString(">")
    }.groupBy(identity).map { case (p, ps) => p -> ps.size.toLong }
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(25)
    val got = EventOps.eventPathTopk(spark, SF).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"got ${got.take(3)}... want ${want.take(3)}...")
    // path strings are 1..4 known event types joined by '>'
    val tpe = "(click|error|purchase|signup|view)"
    got.foreach { case (p, n) =>
      assert(p.matches(s"$tpe(>$tpe){0,3}"), p); assert(n >= 1L)
    }
  }

  test("distNtile is bit-identical to the built-in global ntile (n%k!=0, heavy ties, n<k)") {
    import org.apache.spark.sql.expressions.Window
    // n=23, k=5 -> base 4, rem 3: first 3 buckets take 5 rows; ties on the
    // metric (m = i%4) force the user_id tiebreak to decide bucket edges
    val df = (1 to 23).map(i => (i % 4, f"u$i%03d")).toDF("m", "uid")
    val got = graft.operators.ScalePrimitives.distNtile(df, 5, "t", col("m"), col("uid"))
      .orderBy("uid").collect().toSeq
    val want = df.withColumn("t", ntile(5).over(Window.orderBy(col("m"), col("uid"))))
      .orderBy("uid").collect().toSeq
    assert(got == want)
    // n < k: every occupied bucket holds exactly one row
    val small = Seq((9, "a"), (1, "b"), (5, "c")).toDF("m", "uid")
    val gotS = graft.operators.ScalePrimitives.distNtile(small, 5, "t", col("m").desc, col("uid"))
      .orderBy("uid").collect().toSeq
    val wantS = small.withColumn("t",
        ntile(5).over(Window.orderBy(col("m").desc, col("uid"))))
      .orderBy("uid").collect().toSeq
    assert(gotS == wantS)
  }

  test("distNtileBy is bit-identical to the built-in per-group ntile (uneven groups, ties, n<k)") {
    import org.apache.spark.sql.expressions.Window
    // groups of size 23, 7, 2 (one smaller than k=3), ties on the metric
    // so the uid tiebreak decides bucket edges; column order differs from
    // the window form's output, so compare (uid -> bucket) maps
    // includes a NULL group: the built-in treats NULL as its own
    // partition, and distNtileBy must keep (not drop) those rows
    val rows = (1 to 23).map(i => ("ga", i % 4, f"a$i%03d")) ++
      (1 to 7).map(i => ("gb", i % 2, f"b$i%03d")) ++
      (1 to 2).map(i => ("gc", 0, f"c$i%03d")) ++
      (1 to 5).map(i => (null.asInstanceOf[String], i % 3, f"n$i%03d"))
    val df = rows.toDF("g", "m", "uid")
    val got = graft.operators.ScalePrimitives
      .distNtileBy(df, "g", 3, "t", col("m"), col("uid"))
      .select("uid", "t").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val want = df.withColumn("t",
        ntile(3).over(Window.partitionBy("g").orderBy(col("m"), col("uid"))))
      .select("uid", "t").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == want)
  }

  test("peak concurrency on constructed sessions: overlap of 2 found at the right instant") {
    // u7: events at 0 and 10 min (one session [0,10]); u8: one event at
    // 5 min (session [5,5]); u9: one at 60 min. Live counts: 2 on [5,5],
    // 1 elsewhere -> peak 2 at 00:05, 3 sessions total.
    val df = Seq(
      (1L, ts(0), 7L), (2L, ts(10), 7L), (3L, ts(5), 8L), (4L, ts(60), 9L)
    ).toDF("event_id", "ts", "user_id")
    val sess = EventOps.sessionize(df)
    val bounds = sess.select(col("session_start").as("ts"), lit(1L).as("delta"))
      .unionAll(sess.select(
        (col("session_end") + expr("INTERVAL 1 MICROSECOND")).as("ts"), lit(-1L).as("delta")))
      .groupBy("ts").agg(sum("delta").as("delta"))
    val run = graft.operators.ScalePrimitives
      .distRunning(bounds, Seq(col("ts")), "__rnk", Seq("delta"), Seq("conc"))
    val top = run.orderBy(col("conc").desc, col("ts")).limit(1).collect()(0)
    assert(top.getAs[Long]("conc") == 2L)
    assert(top.getAs[Timestamp]("ts") == ts(5))
    assert(sess.count() == 3L)
  }

  test("distRunning rank + running sums equal the unpartitioned-window reference") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 37).map(i => ((i * 7) % 11, i.toLong, (i % 5).toLong)).toDF("ord", "a", "b")
    val got = graft.operators.ScalePrimitives
      .distRunning(df, Seq(col("ord"), col("a")), "rk", Seq("a", "b"), Seq("ca", "cb"))
      .orderBy("rk").collect().toSeq
    val w = Window.orderBy(col("ord"), col("a"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("ca", sum("a").over(cum))
      .withColumn("cb", sum("b").over(cum))
      .orderBy("rk").collect().toSeq
    assert(got == want)
  }

  test("distRunningBy per-group rank + running sums equal the partitioned-window reference") {
    import org.apache.spark.sql.expressions.Window
    // groups of very different sizes (one spans many range partitions at
    // 32 shuffle partitions, one holds a single row) plus a NULL group —
    // the built-in window treats NULL as its own partition and
    // distRunningBy must too. Double values are integer-valued, so the
    // running double sums must be BIT-identical under any association.
    val rows = (1 to 41).map(i => ("ga", i.toLong, (i % 7).toLong, (i % 5).toDouble)) ++
      (1 to 9).map(i => ("gb", i.toLong, (i % 3).toLong, (2 * i % 4).toDouble)) ++
      Seq(("gc", 1L, 5L, 3.0)) ++
      (1 to 4).map(i => (null.asInstanceOf[String], i.toLong, 1L, 1.0))
    val df = rows.toDF("g", "id", "a", "x")
    val got = graft.operators.ScalePrimitives
      .distRunningBy(df, "g", Seq(col("id")), "rk", Seq("a"), Seq("ca"), Seq("x"), Seq("cx"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    val w = Window.partitionBy("g").orderBy("id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("ca", sum("a").over(cum))
      .withColumn("cx", sum("x").over(cum))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    assert(got == want)
    // non-integer doubles: sequential-vs-boundary reassociation stays
    // inside 1e-12 relative (the documented double contract)
    val df2 = (1 to 50).map(i => (s"g${i % 3}", i.toLong, math.log(i + 1.0))).toDF("g", "id", "x")
    val got2 = graft.operators.ScalePrimitives
      .distRunningBy(df2, "g", Seq(col("id")), "rk", dblCols = Seq("x"), dblOuts = Seq("cx"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4)).toMap
    val want2 = df2.withColumn("cx", sum("x").over(
        Window.partitionBy("g").orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    got2.foreach { case (k, v) =>
      assert(math.abs(v - want2(k)) <= 1e-12 * math.max(1.0, math.abs(want2(k))),
        s"$k: $v vs ${want2(k)}")
    }
    // edge shapes: an EMPTY input (no partitions carry rows — the driver
    // chain must handle all-empty infos) and a single-row group
    val empty = Seq.empty[(String, Long, Long, Double)].toDF("g", "id", "a", "x")
    assert(graft.operators.ScalePrimitives
      .distRunningBy(empty, "g", Seq(col("id")), "rk", Seq("a"), Seq("ca"), Seq("x"), Seq("cx"))
      .count() == 0L)
    val one = Seq(("g", 1L, 7L, 2.5)).toDF("g", "id", "a", "x")
    val r1 = graft.operators.ScalePrimitives
      .distRunningBy(one, "g", Seq(col("id")), "rk", Seq("a"), Seq("ca"), Seq("x"), Seq("cx"))
      .collect()(0)
    assert(r1.getLong(4) == 1L && r1.getLong(5) == 7L && r1.getDouble(6) == 2.5)
  }

  test("distQuantilesBy equals the built-in percentile per group (ties, n=1, endpoints)") {
    // group sizes 1, 2, 23, 40 with heavy value ties; dyadic quantiles
    // over integer-valued doubles interpolate EXACTLY on both
    // formulations, so equality is bit-level; the non-dyadic 0.9 gets a
    // 1e-9 tolerance (lo + t·(hi−lo) vs the built-in's two-sided form
    // differ only in final-ulp rounding)
    val rows = Seq(("g1", 7.0)) ++
      Seq(("g2", 3.0), ("g2", 9.0)) ++
      (1 to 23).map(i => ("g3", (i % 5).toDouble)) ++
      (1 to 40).map(i => ("g4", (i % 7 * 3).toDouble))
    val df = rows.toDF("g", "x")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = graft.operators.ScalePrimitives.distQuantilesBy(df, "g", "x", ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val want = df.groupBy("g")
      .agg(expr(s"percentile(x, array(${ps.mkString(",")}))").as("qs"))
      .collect().flatMap { r =>
        r.getSeq[Double](1).zip(ps).map { case (q, p) => (r.getString(0), p) -> q }
      }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      val tol = if (k._2 == 0.9) 1e-9 else 0.0
      assert(math.abs(v - want(k)) <= tol, s"$k: $v vs ${want(k)}")
    }
  }

  test("event_rfm plans no unpartitioned window — the user-grain quintiles ride distNtile") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    val qe = EventOps.eventRfm(spark, SF).queryExecution
    val global = qe.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty,
      s"unpartitioned window(s) would sort the whole user grain on one task:\n${global.mkString("\n")}")
    // and the physical plan carries no single-partition WindowExec either
    val winExec = qe.executedPlan.toString.linesIterator
      .filter(_.contains("Window ")).toSeq
    assert(winExec.isEmpty, s"unexpected WindowExec nodes:\n${winExec.mkString("\n")}")
  }

  test("stat_seasonality_strength equals the variance ratio of the decomposition frame") {
    val f = EventOps.tsSeasonalDow(spark, SF).collect()
    val n = BigInt(f.length)
    val sr = f.map(r => BigInt(r.getLong(2))).sum
    val srr = f.map(r => BigInt(r.getLong(2)) * BigInt(r.getLong(2))).sum
    val se = f.map(r => BigInt(r.getLong(4))).sum
    val see = f.map(r => BigInt(r.getLong(4)) * BigInt(r.getLong(4))).sum
    val st = 1.0 - (n * see - se * se).toDouble / (n * srr - sr * sr).toDouble
    val want = math.signum(st) * math.floor(math.abs(st) * 1e6 + 0.5) / 1e6 + 0.0
    val r = EventOps.statSeasonalityStrength(spark, SF).head()
    assert(r.getLong(0) == f.length.toLong && r.getDouble(1) == want)
  }

  test("ts_holtwinters: integer recursion matches a hand-rolled fold; DIV truncates like //") {
    // the cross-engine contract the oracle relies on: Spark DIV truncates
    // toward zero on negatives, same as DuckDB's // (verified there)
    assert(spark.sql("SELECT -7 DIV 2").head().getLong(0) == -3L)
    val rows = EventOps.tsHoltWinters(spark, SF).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0)).values
    // forecast is definitionally level + trend on every row
    rows.foreach(r => assert(r.getLong(4) == r.getLong(2) + r.getLong(3)))
    // seed rows (each user's first day) carry trend 0 and level = v·10⁶:
    // recompute the daily inputs and check the seeds exactly
    val daily = graft.Tables.load(spark, SF, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("v"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    byUser.foreach { rs =>
      val sorted = rs.sortBy(_.getDate(1).toString)
      val head = sorted.head
      assert(head.getLong(3) == 0L)
      assert(head.getLong(2) == daily((head.getLong(0), head.getDate(1).toString)) * 1000000L)
      // and every later row obeys the two-halving recursion exactly
      sorted.sliding(2).foreach {
        case Array(p, c) =>
          val x = daily((c.getLong(0), c.getDate(1).toString)) * 1000000L
          val l = (x + p.getLong(2) + p.getLong(3)) / 2
          val b = (l - p.getLong(2) + p.getLong(3)) / 2
          assert(c.getLong(2) == l && c.getLong(3) == b)
        case _ => ()
      }
    }
  }

  test("event_lifecycle: the growth-accounting identities hold on every week") {
    val rows = EventOps.eventLifecycle(spark, SF).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // total new across all weeks = distinct users in the corpus
    val users = graft.Tables.load(spark, SF, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum == users)
    // churned(w) = actives(w-1) - retained(w), for consecutive weeks
    val byWk = rows.map(r => r._1 -> r).toMap
    rows.foreach { case (wk, _, ret, _, churned) =>
      val prev = java.time.LocalDate.parse(wk).minusDays(7).toString
      byWk.get(prev).foreach { case (_, pn, pr, ps, _) =>
        assert(churned == (pn + pr + ps) - ret,
          s"week $wk: churn $churned != actives(prev) ${pn + pr + ps} - retained $ret")
      }
    }
  }

  test("event_funnel_time: converting-user counts match event_funnel; gap stats are consistent") {
    val ft = EventOps.eventFunnelTime(spark, SF).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ft.keySet == Set("signup->view", "view->purchase"))
    val fc = EventOps.eventFunnel(spark, SF).head()
    assert(ft("signup->view").getLong(1) == fc.getLong(1))   // n_view_after
    assert(ft("view->purchase").getLong(1) == fc.getLong(2)) // n_purchase_after
    ft.values.foreach { r =>
      if (r.getLong(1) > 0) {
        assert(r.getLong(2) > 0L) // step gaps are strictly-after, so > 0
        assert(r.getLong(2) <= r.getLong(4) && r.getLong(4) <= r.getLong(3),
          s"mean outside [min, max]: $r")
      }
    }
  }

  test("event_attribution_decay: integer weight masses match a driver-side replay") {
    val rows = EventOps.eventAttributionDecay(spark, SF).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("click", "view"))
    // replay: first purchase per user, then 2^(30-d) per prior touch
    val ev = graft.Tables.load(spark, SF, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val fp = ev.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    def day(t: java.sql.Timestamp) = t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
    val want = ev.filter(e => Set("click", "view")(e._2))
      .flatMap { case (u, ty, ts) =>
        fp.get(u).filter(ts.before(_)).map { f =>
          val d = java.time.temporal.ChronoUnit.DAYS.between(day(ts), day(f)).toInt
          ty -> (if (d <= 30) 1L << (30 - d) else 0L)
        }
      }.groupBy(_._1).map { case (ty, xs) => ty -> (xs.length.toLong, xs.map(_._2).sum) }
    rows.foreach { r =>
      val (n, w) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == w, s"${r.getString(0)}: $r != ($n, $w)")
    }
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) <= 2e-6)
  }

  test("ts_seasonal_dow: weekday means decompose daily revenue additively") {
    val rows = EventOps.tsSeasonalDow(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) - r.getLong(3) == r.getLong(4))
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 7)
    }
    // each weekday's mean is the truncating integer mean of its days
    val byDow = rows.groupBy(_.getInt(1))
    byDow.foreach { case (_, rs) =>
      val mean = rs.map(_.getLong(2)).sum / rs.length
      assert(rs.forall(_.getLong(3) == mean))
    }
  }
}
