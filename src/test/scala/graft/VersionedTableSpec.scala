package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.tables.VersionedTable

/** Specs for the versioned table format: ACID commit protocol, MERGE,
  * file-pruned copy-on-write DELETE, time travel, compaction, and the
  * optimistic-concurrency retry path. */
class VersionedTableSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_vt").resolve("t").toString

  private def sampleDf(ids: Range) =
    ids.map(i => (i.toLong, s"name_$i", i * 10.0)).toDF("id", "name", "score")

  test("create + append + time travel reads each version's exact snapshot") {
    val t = VersionedTable.create(spark, freshRoot(), sampleDf(0 until 100))
    assert(t.currentVersion == 0)
    t.append(sampleDf(100 until 150))
    assert(t.currentVersion == 1)
    assert(t.read(Some(0)).count() == 100)
    assert(t.read().count() == 150)
    // old snapshot is IMMUTABLE: re-reading v0 after more commits
    t.append(sampleDf(150 until 160))
    assert(t.read(Some(0)).count() == 100)
    assert(t.read(Some(1)).count() == 150)
    assert(t.history.map(_._1) == Seq(0, 1, 2))
  }

  test("merge upserts matched rows and inserts new ones") {
    val t = VersionedTable.create(spark, freshRoot(), sampleDf(0 until 10))
    val updates = Seq((5L, "UPDATED", -1.0), (42L, "INSERTED", 420.0),
      (7L, null.asInstanceOf[String], 7.0))
      .toDF("id", "name", "score")
    t.merge(updates, "id")
    val out = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 11) // 10 originals (2 updated in place) + 1 insert
    assert(out(5L) == "UPDATED")
    assert(out(42L) == "INSERTED")
    assert(out(3L) == "name_3") // untouched row survives
    // an update row must be able to SET NULL (coalesce-based merges
    // silently keep the stale value here)
    assert(out(7L) == null, s"update-to-NULL ignored: ${out(7L)}")
    // and the pre-merge snapshot still shows the old value
    val old = t.read(Some(0)).filter(col("id") === 5).head()
    assert(old.getString(1) == "name_5")
  }

  test("delete is copy-on-write with FILE pruning: untouched files survive by path") {
    val root = freshRoot()
    val t = VersionedTable.create(spark, root, sampleDf(0 until 50).repartition(4))
    val v0Files = t.read(Some(0)).select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0).stripPrefix("file://").stripPrefix("file:")).toSet
    assert(v0Files.size == 4)
    // delete one specific id -> exactly ONE file contains it
    t.delete(col("id") === 7)
    val v1Files = t.read().select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0).stripPrefix("file://").stripPrefix("file:")).toSet
    // the 3 untouched files carry over verbatim; 1 file was rewritten
    assert((v0Files & v1Files).size == 3, s"expected 3 carried files:\n$v0Files\n$v1Files")
    assert(t.read().count() == 49)
    assert(!t.read().collect().exists(_.getLong(0) == 7L))
    // deleting nothing is a metadata no-op (no new version)
    val v = t.currentVersion
    assert(t.delete(col("id") === 9999) == v)
    assert(t.currentVersion == v)
  }

  test("compaction rewrites files without changing data, old versions intact") {
    val t = VersionedTable.create(spark, freshRoot(), sampleDf(0 until 40).repartition(8))
    val before = t.read().orderBy("id").collect().map(_.toString).toSeq
    t.compact(target = 1)
    assert(t.history.last._2 == 1, s"history ${t.history}")
    val after = t.read().orderBy("id").collect().map(_.toString).toSeq
    assert(after == before, "compaction changed data")
    assert(t.read(Some(0)).count() == 40)
  }

  test("file skipping: range reads list only overlapping files, stats survive CoW") {
    val t = VersionedTable.create(spark, freshRoot(),
      sampleDf(0 until 100).repartitionByRange(4, col("id")), statsCol = Some("id"))
    assert(t.statsCol.contains("id"))
    // range-partitioned layout -> disjoint id ranges -> a narrow range
    // touches exactly one of four files
    val pruned = t.pruneFiles(10.0, 12.0)
    assert(pruned.size == 1, s"expected 1 of 4 files, got ${pruned.size}")
    // skipping must not change results
    val viaSkip = t.readWhere(10.0, 12.0).orderBy("id").collect().map(_.getLong(0)).toSeq
    val viaScan = t.read().filter(col("id").between(10, 12))
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(viaSkip == viaScan && viaSkip == Seq(10L, 11L, 12L))
    // stats follow the table through append and CoW delete: carried files
    // inherit entries (no rescan), fresh files get scanned once
    t.append(sampleDf(100 until 200).repartitionByRange(4, col("id")))
    assert(t.pruneFiles(150.0, 152.0).size == 1, "appended files not skippable")
    t.delete(col("id") === 11)
    val afterDelete = t.readWhere(10.0, 12.0).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(afterDelete == Seq(10L, 12L), s"got $afterDelete")
    assert(t.pruneFiles(150.0, 152.0).size == 1, "carried stats lost by delete")
    // no-stats table refuses readWhere loudly
    val plain = VersionedTable.create(spark, freshRoot(), sampleDf(0 until 10))
    intercept[IllegalStateException] { plain.readWhere(1, 2) }
  }

  test("bloom skipping: point lookups prune files even on a HASH layout") {
    // hash layout: every file's [min,max] id range spans the whole key
    // domain, so min/max stats can never skip — the case blooms exist for
    val t = VersionedTable.create(spark, freshRoot(),
      sampleDf(0 until 4000).repartition(8, col("id")),
      statsCol = Some("id"), bloomCol = Some("id"))
    assert(t.bloomCol.contains("id"))
    assert(t.pruneFiles(17.0, 17.0).size == 8, "hash layout must defeat range stats")
    val pruned = t.pruneFilesEq(17L)
    assert(pruned.size < 8, s"bloom should skip most of 8 files, got ${pruned.size}")
    assert(pruned.nonEmpty, "the owning file can never be skipped (no false negatives)")
    // skipping loses nothing
    val viaSkip = t.readWhereEq(17L).collect().map(_.getLong(0)).toSeq
    assert(viaSkip == Seq(17L))
    // absent key: exact emptiness regardless of bloom false positives
    assert(t.readWhereEq(999999L).count() == 0)
    // blooms follow the table through append: carried files inherit
    // entries, fresh files are scanned once
    t.append(sampleDf(4000 until 4100).repartition(2, col("id")))
    assert(t.pruneFilesEq(17L).size < 10, "carried blooms lost by append")
    assert(t.readWhereEq(4050L).collect().map(_.getLong(0)).toSeq == Seq(4050L))
    // a bloom-less table refuses the point-lookup path loudly
    val plain = VersionedTable.create(spark, freshRoot(), sampleDf(0 until 10))
    intercept[IllegalStateException] { plain.readWhereEq(1L) }
    // false-negative audit across the whole key domain: every present
    // key's owning file survives pruning (sampled every 97th key)
    (0 until 4000 by 97).foreach { k =>
      assert(t.readWhereEq(k.toLong).count() == 1L, s"key $k lost by skipping")
    }
  }

  test("change feed: addedBetween returns exactly the appended rows") {
    val t = VersionedTable.create(spark, freshRoot(), sampleDf(0 until 30))
    t.append(sampleDf(30 until 45))
    t.append(sampleDf(45 until 50))
    val delta01 = t.addedBetween(0, 1).collect().map(_.getLong(0)).sorted.toSeq
    assert(delta01 == (30L until 45L), s"got $delta01")
    val delta02 = t.addedBetween(0, 2).count()
    assert(delta02 == 20)
    assert(t.addedBetween(2, 2).count() == 0)
    // a CoW delete surfaces the rewritten file(s), never silently nothing
    t.delete(col("id") === 0)
    val delta23 = t.addedBetween(2, 3).collect().map(_.getLong(0)).toSet
    assert(delta23.nonEmpty && !delta23.contains(0L))
  }

  test("idempotent appends: a replayed txn is a no-op (exactly-once contents)") {
    val t = VersionedTable.create(spark, freshRoot(), sampleDf(0 until 10))
    val v1 = t.appendIdempotent(sampleDf(10 until 20), "q:0")
    assert(t.read().count() == 20)
    // at-least-once delivery replays the same batch id -> must not double
    val v2 = t.appendIdempotent(sampleDf(10 until 20), "q:0")
    assert(v2 == v1 && t.read().count() == 20, "replayed txn duplicated rows")
    t.appendIdempotent(sampleDf(20 until 25), "q:1")
    assert(t.read().count() == 25)
    assert(t.committedTxns == Set("q:0", "q:1"))
  }

  test("streaming foreachBatch sink lands micro-batches exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = VersionedTable.create(spark, freshRoot(),
      Seq.empty[(Long, Long)].toDF("event_id", "user_id"))
    val sink = StreamingOps.versionedTableSink(t, "evsink")
    val input = MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("event_id", "user_id")
      .writeStream.foreachBatch(sink).start()
    try {
      input.addData((1L, 10L), (2L, 10L))
      q.processAllAvailable()
      input.addData((3L, 11L))
      q.processAllAvailable()
      assert(t.read().count() == 3)
      // simulate a post-crash batch replay: same (query, batchId) again
      sink(Seq((3L, 11L)).toDF("event_id", "user_id"), 1L)
      assert(t.read().count() == 3, "replayed micro-batch duplicated rows")
    } finally q.stop()
  }

  test("commit races: a loser retries onto the next version instead of clobbering") {
    val t = VersionedTable.create(spark, freshRoot(), sampleDf(0 until 10))
    // simulate a concurrent winner: pre-create the v1 manifest the next
    // append would claim (same content as v0 = a no-op commit)
    val v0 = Paths.get(t.root, "_manifests", "v00000000.json")
    val v1 = Paths.get(t.root, "_manifests", "v00000001.json")
    Files.copy(v0, v1)
    val committed = t.append(sampleDf(10 until 12))
    assert(committed == 2, s"loser must land on v2, got v$committed")
    assert(t.read().count() == 12)
    assert(t.versions == Seq(0, 1, 2))
  }

  test("optimizeLayout turns a random layout into a skipping-effective one") {
    import org.apache.spark.sql.functions.rand
    // shuffle ids across writers so every file's [min,max] spans ~everything
    val shuffled = sampleDf(0 until 200).orderBy(rand(42)).repartition(4)
    val t = VersionedTable.create(spark, freshRoot(), shuffled, statsCol = Some("id"))
    // a random file can coincidentally miss a narrow range; the point is
    // the layout prunes (almost) nothing before clustering
    val before = t.pruneFiles(10.0, 12.0).size
    assert(before >= 3, s"random layout should prune ~nothing, pruned to $before")
    t.optimizeLayout("id", numFiles = 4)
    val after = t.pruneFiles(10.0, 12.0).size
    assert(after == 1, s"clustered layout should prune to 1 file, got $after")
    assert(t.readWhere(10.0, 12.0).count() == 3)
    assert(t.read().count() == 200, "optimize changed data")
  }

  test("vacuum reclaims unreferenced files and drops aged versions") {
    val t = VersionedTable.create(spark, freshRoot(), sampleDf(0 until 40))
    t.append(sampleDf(40 until 60))
    t.merge(Seq((0L, "X", 0.0)).toDF("id", "name", "score"), "id") // rewrites ALL files
    assert(t.versions == Seq(0, 1, 2))
    // default retention spares freshly-written files — the in-flight
    // writer guard (a concurrent commit's files are unreferenced until
    // its manifest rename lands)
    assert(t.vacuum(keepVersions = 1) == 0, "retention must spare fresh files")
    val deleted = t.vacuum(keepVersions = 1, retentionMs = 0L)
    assert(deleted > 0, "merge left no reclaimable files?")
    assert(t.versions == Seq(2), s"aged manifests survive: ${t.versions}")
    // the surviving snapshot is intact
    assert(t.read().count() == 60)
    intercept[IllegalArgumentException] { t.read(Some(0)).count() } // horizon gone
    // idempotent: nothing left to reclaim
    assert(t.vacuum(keepVersions = 1, retentionMs = 0L) == 0)
  }

  test("reader-vs-vacuum race: a plan on a vacuumed version fails loudly, never torn") {
    val t = VersionedTable.create(spark, freshRoot(), sampleDf(0 until 40))
    t.compact(2) // v1 = new files; v0's files become vacuum-reclaimable
    // the race: a reader PLANS (and even executes once) against v0...
    val planned = t.read(Some(0))
    assert(planned.count() == 40)
    // ...then a concurrent maintenance job vacuums past the horizon
    assert(t.vacuum(keepVersions = 1, retentionMs = 0L) > 0)
    // executing the already-planned DataFrame must now fail LOUDLY — a
    // FileNotFoundException in the cause chain — never return a torn
    // subset of v0's rows (the silent outcome ignoreMissingFiles=true
    // would produce; snapshotRead pins that conf off, checked below)
    val thrown =
      try { val n = planned.count(); fail(s"torn read returned $n rows instead of failing") }
      catch { case e: Throwable => e }
    val causes = Iterator.iterate(thrown)(_.getCause).takeWhile(_ != null).take(20).toSeq
    assert(causes.exists(c => c.isInstanceOf[java.io.FileNotFoundException] ||
      Option(c.getMessage).exists(_.contains("FileNotFoundException"))),
      s"expected FileNotFoundException in the cause chain, got: $thrown")
    // the conf guard: with ignoreMissingFiles on, the same race would be
    // SILENT (partial rows), so planning a read under it must refuse
    spark.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    try intercept[IllegalArgumentException] { t.read() }
    finally spark.conf.unset("spark.sql.files.ignoreMissingFiles")
    assert(t.read().count() == 40) // guard lifted, current snapshot intact
  }

  test("exactly-once survives vacuum: dropped manifests' txns checkpoint forward") {
    val root = freshRoot()
    val t = VersionedTable.create(spark, root, sampleDf(0 until 10))
    t.appendIdempotent(sampleDf(10 until 20), "q:7")
    t.append(sampleDf(20 until 30)) // head manifest carries NO txn
    t.vacuum(keepVersions = 1, retentionMs = 0L)
    assert(t.committedTxns.contains("q:7"), "txn lost by vacuum")
    // a replay after vacuum — and from a FRESH instance (checkpoint read,
    // not in-memory cache) — must still be a no-op
    assert(t.appendIdempotent(sampleDf(10 until 20), "q:7") == t.currentVersion)
    val reopened = VersionedTable.open(spark, root)
    reopened.appendIdempotent(sampleDf(10 until 20), "q:7")
    assert(reopened.read().count() == 30, "replayed txn duplicated after vacuum")
  }

  test("concurrent appenders: rebase-retry loses no writer's rows") {
    // 4 threads x 5 appends racing on one table: every lost commit race
    // must REBASE on the winner's manifest — republishing a stale file
    // list would silently drop the winner's rows. 210 rows and 21
    // contiguous versions prove no commit clobbered another.
    val t = VersionedTable.create(spark, freshRoot(), sampleDf(0 until 10))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val tasks = (0 until 4).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = (0 until 5).foreach { i =>
            val lo = 1000 + w * 100 + i * 10
            t.append(sampleDf(lo until lo + 10))
          }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(t.read().count() == 10 + 4 * 5 * 10, "rows lost in commit races")
    assert(t.versions == (0 to 20), s"non-contiguous versions ${t.versions}")
    // replaying one of the same ranges idempotently must still dedup
    val v = t.appendIdempotent(sampleDf(5000 until 5010), "cc:1")
    assert(t.appendIdempotent(sampleDf(5000 until 5010), "cc:1") == v)
    assert(t.read().count() == 220)
  }

  test("delete and merge are total on an EMPTY snapshot (CDC first-batch shape)") {
    val root = freshRoot()
    val t = VersionedTable.create(spark, root, sampleDf(0 until 0))
    assert(t.read().count() == 0)
    // delete on empty: no-op, no crash on the zero-path parquet read
    assert(t.delete(col("score") > 0) == 0)
    // merge into empty: pure insert (the full-outer join has no anchor)
    t.merge(sampleDf(0 until 5), "id")
    assert(t.read().count() == 5)
    // and the normal merge path works from then on
    t.merge(sampleDf(3 until 8), "id")
    assert(t.read().count() == 8)
  }

  test("URI-encodable chars in the table root: delete and file skipping still work") {
    // input_file_name() returns a percent-encoded URI; the manifest holds
    // raw paths — a space in the root made delete's touched set miss
    // every file (delete unusable) and stats keys never match (skipping
    // silently off)
    val root = Files.createTempDirectory("graft_vt sp ace").resolve("t").toString
    assert(root.contains(" "))
    val t = VersionedTable.create(spark, root,
      sampleDf(0 until 100).repartitionByRange(4, col("score")),
      statsCol = Some("score"))
    // stats pruning: keys were computed from input_file_name — they must
    // match manifest paths or every range read degrades to a full scan
    assert(t.pruneFiles(0.0, 100.0).size <
      t.pruneFiles(Double.NegativeInfinity, Double.PositiveInfinity).size,
      "stats keys missed the manifest paths: skipping disabled")
    // delete: touched paths must map back to real files
    t.delete(col("id") < 10)
    assert(t.read().count() == 90)
    assert(t.read().filter(col("id") < 10).count() == 0)
  }

  test("graft-vt relation pins its snapshot: a concurrent append cannot split one query") {
    val root = freshRoot()
    val t = VersionedTable.create(spark, root, sampleDf(0 until 50))
    val df = spark.read.format("graft-vt").option("path", root).load()
    t.append(sampleDf(50 until 80))
    // the relation was created BEFORE the append: both scans of the same
    // DataFrame (self-join) and a plain count must read the pinned v0
    assert(df.count() == 50, "relation read a version newer than its pin")
    val selfJoin = df.as("a").join(df.as("b"), col("a.id") === col("b.id")).count()
    assert(selfJoin == 50, s"self-join mixed snapshots: $selfJoin")
    // a FRESH load sees the appended version
    assert(spark.read.format("graft-vt").option("path", root).load().count() == 80)
  }

  test("vt_changes: the change feed ties out against the commit recipe") {
    import org.apache.spark.sql.functions.col
    val feed = graft.operators.TableOps.vtChanges(spark, SF).collect()
    val cust = Tables.load(spark, SF, "customer")
    val negatives = cust.filter(col("c_acctbal") < 0).count()
    val rich = cust.filter(col("c_acctbal") > 9000).count()
    val by = feed.groupBy(_.getAs[String]("change")).view.mapValues(_.length.toLong).toMap
    assert(by.getOrElse("insert", 0L) == 1L) // the -1 sentinel
    assert(by.getOrElse("delete", 0L) == negatives)
    assert(by.getOrElse("update", 0L) == rich)
    feed.foreach { r =>
      r.getAs[String]("change") match {
        case "insert" =>
          assert(r.getAs[Long]("id") == -1L && r.isNullAt(2))
        case "delete" =>
          assert(r.isNullAt(3) && r.getAs[Double]("old_acctbal") < 0)
        case "update" =>
          assert(r.getAs[Double]("old_acctbal") > 9000 &&
            r.getAs[Double]("new_acctbal") == 0.0)
      }
    }
  }
}
