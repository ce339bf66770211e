package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central fixture loader. Every operator goes through [[load]]/[[view]] so
  * per-table normalization lives in exactly one place — notably the
  * `events.ts` timestamp normalization: fixture generations have shipped the
  * column as INT64 TIMESTAMP(NANOS) (pre-2026-08-13) and as TIMESTAMP(MICROS)
  * (current). We branch on the dtype the reader actually produced —
  * schema-on-read, not a frozen assumption — so both generations load:
  *   - LongType (nanosAsLong path): ns longs, truncate to µs (matches
  *     DuckDB's own ns→µs truncation).
  *   - TIMESTAMP_NTZ (µs fixtures, no tz in footer): cast to TimestampType;
  *     the session is pinned UTC so NTZ ≡ LTZ wall-clock.
  *   - TimestampType: pass through.
  *
  * 100 TB notes: at scale these become partitioned table layouts (date/lang
  * partition columns) registered in a catalog; schema-on-read from parquet
  * footers either way. The ts normalization is a pure projection, so filter
  * pushdown and column pruning pass straight through it.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Engine-wide optimizer tuning, applied once per session on first load.
    * InferFiltersFromGenerate synthesizes a `size(e) > 0 AND isnotnull(e)`
    * pre-filter under every explode — for our text operators `e` is an
    * interpreted higher-order shingle expression, so the inferred filter
    * TRIPLES its evaluation (twice in the filter, once in the project) and
    * prunes nothing (fixture arrays are never empty, and no join pushdown
    * depends on it). Measured on llm_ngram_jaccard at sf0.1: 4.5 s → 1.9 s
    * warm with the rule excluded. */
  private val ExcludedRule =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  private def tune(spark: SparkSession): Unit = {
    // Read-modify-write: callers (tests, users) may have excluded their own
    // rules — merge instead of clobbering, and skip the conf write once
    // present (conf sets invalidate cached plans).
    val cur = spark.conf.getOption("spark.sql.optimizer.excludedRules")
      .map(_.trim).filter(_.nonEmpty)
    if (!cur.exists(_.split(",").map(_.trim).contains(ExcludedRule)))
      spark.conf.set("spark.sql.optimizer.excludedRules",
        (cur.toSeq :+ ExcludedRule).mkString(","))
  }

  /** Analyzed-plan memo (r15): `spark.read.parquet` re-lists the path and
    * re-reads parquet footers for schema inference on EVERY call, and the
    * bench invokes each key's builder twice — thousands of redundant
    * footer reads per full run. A DataFrame is an immutable logical plan,
    * so the resolved frame is reusable verbatim; this caches the PLAN,
    * never data or results (every execution still scans parquet). Keyed
    * by session uuid so a fresh session (new confs) re-resolves; bounded
    * so long-lived multi-session processes (the test suites) can't leak. */
  private val planMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), DataFrame]()

  /** Load one table as a DataFrame, applying per-table normalization. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    tune(spark)
    val sid = org.apache.spark.sql.graftnative.SessionIds.uuid(spark)
    if (planMemo.size > 512) planMemo.clear()
    planMemo.computeIfAbsent((sid, sfDir, name), _ => loadRaw(spark, sfDir, name))
  }

  private def loadRaw(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      // nanosAsLong must be set before the FIRST read of events.parquet in
      // the session (the footer is parsed at read time). Harmless when the
      // file carries µs timestamps — it only changes how TIMESTAMP(NANOS)
      // footers are surfaced (as raw int64). Guarded like tune(): conf
      // sets invalidate cached plans, and this runs on EVERY events load.
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      raw.schema("ts").dataType match {
        case LongType => // ns fixtures surfaced as int64 via nanosAsLong
          raw.withColumn("ts", expr("timestamp_micros(cast(ts div 1000 as long))"))
        case TimestampNTZType => // µs fixtures without tz annotation
          // wall clock read AS UTC regardless of the session zone — the
          // bare cast(TimestampType) interprets it in the SESSION zone,
          // shifting every event instant for a non-UTC embedder
          // (spec-asserted in DataQualityOpsSpec's timezone test)
          raw.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              GraftFunctions.ntzUtcMicros(col("ts"))))
        case TimestampType =>
          raw
        case other =>
          throw new IllegalStateException(
            s"events.ts has unsupported parquet type $other — expected " +
              "int64 (TIMESTAMP(NANOS) via nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP")
      }
    case n =>
      spark.read.parquet(s"$sfDir/$n.parquet")
  }

  /** Load + register as a temp view named `name`. Returns the DataFrame. */
  def view(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = load(spark, sfDir, name)
    df.createOrReplaceTempView(name)
    df
  }

  /** Register every fixture table as a temp view (for SQL-text entry points). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(view(spark, sfDir, _))
}
