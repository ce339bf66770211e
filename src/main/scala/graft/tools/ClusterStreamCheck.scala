package graft.tools

import org.apache.spark.sql.functions._

/** Streaming under real executor JVMs — the state-surface companion to
  * [[ClusterCheck]]. The batch sweep proves every registry key is
  * executor-placement independent, but Structured Streaming crosses one
  * more boundary local mode blurs: STATE STORES LIVE ON EXECUTORS (the
  * RocksDB provider opens its instance files in each executor process,
  * not the driver), watermark progress is aggregated from executor-side
  * event-time stats, and every micro-batch re-serializes the stateful
  * processor (the transformWithState handle) to wherever its partition
  * lands. This tool drives three stateful kernels (plus the curation
  * sink, whose cross-trigger state is a versioned table) through a REAL
  * file-source multi-batch execution under `local-cluster[2,4,2048]`
  * with the RocksDB provider pinned, and asserts each agrees exactly
  * with its batch twin computed in the same session:
  *
  *   1. tumblingCounts (windowed agg, complete mode) — every
  *      (window, type) group equals the batch aggregation group-for-group.
  *   2. dedupStream (dropDuplicatesWithinWatermark, append mode) — emits
  *      exactly the batch-distinct event_id set, each id once.
  *   3. runningCountsTws (transformWithState, update mode) — the final
  *      per-user running count equals the batch per-user count for
  *      EVERY user (max over update-mode emissions joined against the
  *      batch groupBy).
  *   4. substringDedupSink (foreachBatch onto two versioned tables) —
  *      fresh documents delivered as real micro-batches, each profiled
  *      against the hash table state the PREVIOUS batches advanced;
  *      the union of streamed profiles equals the per-batch batch
  *      twins recomputed in delivery order. The state here is not a
  *      state store but the versioned table itself — the commit path
  *      (executor-written parquet, driver manifest rename) crossing
  *      executor JVMs per trigger.
  *
  * Same environment contract as [[ClusterCheck]] (SPARK_SCALA_VERSION,
  * writable SPARK_HOME shim).
  *
  * Usage: sbt "runMain graft.tools.ClusterStreamCheck [sfDir]"
  */
object ClusterStreamCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val jar = getClass.getProtectionDomain.getCodeSource.getLocation.getPath
    val spark = graft.GraftSession.builder(master = "local-cluster[2,4,2048]",
        shufflePartitions = 8)
      .config("spark.executor.extraClassPath", jar)
      // the 100 TB state posture, opened inside each EXECUTOR process
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    import spark.implicits._
    try {
      spark.sparkContext.setLogLevel("WARN")
      LogHygiene.suppressBoundedGrainWindowWarn()
      spark.range(0L, 1000000L, 1L, 8).selectExpr("sum(id)").collect()
      require(spark.sparkContext.getExecutorMemoryStatus.size >= 3,
        "local-cluster did not register 2 executors")

      // fixture events split into 8 parquet files = 8 real micro-batches
      // (maxFilesPerTrigger=1); arbitrary event-time order across batches
      // exercises watermark bookkeeping, not just happy-path monotone time
      val src = java.nio.file.Files
        .createTempDirectory("graft_clusterstream").toString + "/events"
      val ev = graft.Tables.load(spark, sfDir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      ev.repartition(8).write.mode("overwrite").parquet(src)
      val batch = spark.read.parquet(src)
      def stream = spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      def runAvailable(df: org.apache.spark.sql.DataFrame, name: String,
          mode: String): org.apache.spark.sql.DataFrame = {
        val q = df.writeStream.format("memory").queryName(name)
          .outputMode(mode)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        spark.table(name)
      }

      // 1. windowed agg: stream (complete) == batch, group-for-group
      val tumbled = runAvailable(
        graft.streaming.StreamingOps.tumblingCounts(stream),
        "cs_tumbling", "complete")
      val tumbledBatch = graft.streaming.StreamingOps.tumblingCounts(batch)
      val diff1 = tumbled.union(tumbledBatch)
        .groupBy("hour_start", "event_type", "cnt")
        .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
      require(diff1 == 0L,
        s"tumbling: streaming state diverged from batch on $diff1 groups")
      println(s"[cluster-stream] tumbling    MATCH groups=${tumbled.count()}")

      // 2. watermark dedup: watermark wider than the fixture's event-time
      // span so no row can be late-dropped — the output must be exactly
      // the batch-distinct id set, each id exactly once
      val deduped = runAvailable(
        graft.streaming.StreamingOps.dedupStream(stream, "100000 hours"),
        "cs_dedup", "append")
      val expectIds = batch.select("event_id").distinct().count()
      val emitted = deduped.count()
      val distinctEmitted = deduped.select("event_id").distinct().count()
      require(emitted == expectIds && distinctEmitted == expectIds,
        s"dedup: emitted $emitted / distinct $distinctEmitted vs batch $expectIds")
      println(s"[cluster-stream] dedup       MATCH ids=$expectIds")

      // 3. transformWithState on RocksDB: final running count per user
      // (max over update-mode emissions) == batch count for EVERY user
      val counts = runAvailable(
        graft.streaming.StreamingOps.runningCountsTws(
          stream.as[graft.streaming.StreamingOps.Event]).toDF(),
        "cs_tws", "update")
      val finalCounts = counts.groupBy("user_id")
        .agg(max("count").as("streamed"))
      val batchCounts = batch.groupBy("user_id")
        .agg(count(lit(1)).as("expected"))
      val diff3 = finalCounts.join(batchCounts, Seq("user_id"), "full")
        .filter(col("streamed").isNull || col("expected").isNull ||
          col("streamed") =!= col("expected")).count()
      require(diff3 == 0L,
        s"transformWithState: $diff3 users' running counts diverged from batch")
      println(s"[cluster-stream] tws_counts  MATCH users=${batchCounts.count()}")

      // 4. the curation sink: incremental substring dedup with the
      // known-hash table advanced between real micro-batches
      val docsAll = graft.Tables.load(spark, sfDir, "documents")
        .select("doc_id", "text")
      val existingDocs = docsAll.filter(col("doc_id") % 10 < 8)
      val freshDocs = docsAll.filter(col("doc_id") % 10 >= 8)
      val dsrc = java.nio.file.Files
        .createTempDirectory("graft_cs_subsrc").toString + "/docs"
      freshDocs.repartition(2).write.mode("overwrite").parquet(dsrc)
      val dschema = spark.read.parquet(dsrc).schema
      val vroot = java.nio.file.Files.createTempDirectory("graft_cs_subvt").toString
      val hashT = graft.tables.VersionedTable.create(spark, vroot + "/h",
        graft.operators.LlmTextOps.newHashesAgainst(
          Seq.empty[String].toDF("eh"), existingDocs))
      val outT = graft.tables.VersionedTable.create(spark, vroot + "/o",
        Seq.empty[(Long, Long, Long, Long, Double)].toDF("doc_id", "n_windows",
          "n_known_windows", "n_batch_removable_windows", "cut_frac"))
      val sink = graft.streaming.StreamingOps.substringDedupSink(hashT, outT, "cs_sub")
      // record each batch's doc ids (driver-side, trigger-bounded) so the
      // per-batch twins can be recomputed in delivery order afterwards
      val delivered = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
      val q4 = spark.readStream.schema(dschema).option("maxFilesPerTrigger", 1)
        .parquet(dsrc).writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          delivered += id -> df.select("doc_id").as[Long].collect().toSeq
          sink(df, id)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q4.awaitTermination()
      require(delivered.size >= 2, s"expected >= 2 micro-batches, got ${delivered.size}")
      def profRows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      var known = existingDocs
      var want = Set.empty[(Long, Long, Long, Long, Double)]
      for ((_, ids) <- delivered.sortBy(_._1)) {
        val b = freshDocs.filter(col("doc_id").isin(ids: _*))
        want ++= profRows(graft.operators.LlmTextOps.substringIncremental(known, b))
        known = known.unionByName(b)
      }
      val got = profRows(outT.read())
      require(got == want && got.size == freshDocs.count(),
        s"substring sink diverged: got ${got.size} rows, want ${want.size}")
      println(s"[cluster-stream] substring   MATCH docs=${got.size} batches=${delivered.size}")

      println(s"""[cluster-stream-summary] {"checks":4,"mismatches":0,""" +
        s""""stateStore":"rocksdb","sf":"$sfDir"}""")
    } finally spark.stop()
  }
}
