package graft.tools

/** Bounded least-recently-used memo for rebuildable derived values (the
  * pipeline-stage caches in LlmTextOps: shingle index, SimHash sketches,
  * cluster labels, IVF lists).
  *
  * Why not clear()-on-bound: wiping the whole map when one session crosses
  * the limit silently drops every LIVE session's memo too — correctness-
  * safe (entries rebuild) but a full re-index of every corpus in flight.
  * LRU evicts exactly one cold entry per insert past capacity, so entries
  * a live consumer keeps touching are never dropped.
  *
  * Concurrency: all access synchronizes on the underlying map. Builds run
  * inside the lock, which (a) guarantees each key builds exactly once and
  * (b) is REENTRANT — a build may itself call get() for a prerequisite key
  * (the cluster-label memo builds on the shingle-index memo), which a
  * ConcurrentHashMap.computeIfAbsent would reject as a recursive update.
  * Builds here are driver-side plan construction plus one eager
  * localCheckpoint job; serializing them across threads is the same order
  * of contention as the shared SparkContext scheduler they all queue on.
  */
object LruMemo {
  /** Memo for CHECKPOINTED DataFrames: capacity eviction and the
    * registry-triggered family-boundary clear both free the frames'
    * blocks through CheckpointRelease, and the registry hookup happens
    * here — one constructor call per derived-table cache instead of the
    * 4-line memo+register pattern repeated (and kept consistent by hand)
    * at every site. */
  def checkpointed[K](capacity: Int, tag: String): LruMemo[K, org.apache.spark.sql.DataFrame] = {
    val release = org.apache.spark.sql.graftnative.CheckpointRelease.release _
    // rebuild-on-miss: a hit whose checkpoint blocks are no longer all
    // resident (an executor died — routine at 1000 executors; a local
    // checkpoint has no lineage to recompute from) is dropped and
    // rebuilt instead of being handed to a consumer whose action would
    // fail unrecoverably. The probe is driver-side block-manager
    // metadata (CheckpointRelease.isLive), no job per hit.
    val m = new LruMemo[K, org.apache.spark.sql.DataFrame](capacity, release, tag,
      revalidate = org.apache.spark.sql.graftnative.CheckpointRelease.isLive)
    MemoRegistry.register(() => m.clear(release))
    m
  }
}

/** @param tag the memo's name in [[MemoRegistry.BuildLog]] — BENCH_FULL's
  *            memo_builds records WHICH memo each build belongs to, so
  *            an n=2 under one bench key reads as either two distinct
  *            prerequisite indexes (two tags) or one eviction rebuild
  *            (same tag twice). Memos whose key already carries a stage
  *            name pass it per-call via [[LruMemo.getAs]] instead.
  * @param revalidate hit-time liveness probe: a cached value this
  *            returns false for is released (via `onEvict`) and REBUILT
  *            instead of returned — the executor-loss recovery path for
  *            checkpointed frames, whose blocks die with their executor
  *            and cannot recompute (no lineage). Must be cheap (runs
  *            under the memo lock on every hit) and side-effect free;
  *            default accepts every hit. */
final class LruMemo[K, V](val capacity: Int, onEvict: V => Unit = (_: V) => (),
                          tag: String = "memo",
                          revalidate: V => Boolean = (_: V) => true) {
  require(capacity > 0, "LruMemo capacity must be positive")

  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean = {
      val evict = this.size() > capacity
      // Capacity eviction releases the value the same way clear() does —
      // otherwise an evicted checkpointed frame's blocks stay pinned
      // until the ContextCleaner happens to collect the GC'd RDD, the
      // exact leak the drop hooks exist to close. Runs inside the map
      // lock, same as clear(); NonFatal only, fatal errors propagate.
      if (evict) try onEvict(e.getValue) catch {
        case scala.util.control.NonFatal(ex) =>
          System.err.println(s"[graft] memo evict hook failed: $ex")
      }
      evict
    }
  }

  /** The memoized value for `k`, building (and caching) it on first use.
    * Touching a key marks it most-recently-used.
    *
    * RETENTION CONTRACT (same one clear() carries): when `onEvict`
    * releases resources — the checkpointed-DataFrame memos release the
    * frame's blocks — a caller must not retain a returned value across
    * more than `capacity` further inserts. An evicted checkpointed frame
    * is a LAZY plan over truncated lineage: its blocks are gone and
    * cannot be recomputed, so a later action on the stale reference fails
    * unrecoverably with missing-checkpoint-block errors. Use the value
    * promptly (or re-get() it, which re-memoizes), and size capacities
    * comfortably above the per-run key working set — each shipped cache
    * does (capacities 4-64, all several× their family's live key count). */
  def get(k: K)(build: => V): V = getAs(tag, k)(build)

  /** [[get]] with a per-call BuildLog tag, for memos whose key already
    * names the stage being built (the LLM stageMemo keys on
    * (session, corpus, stage)) — the instance tag would collapse every
    * stage into one log line and re-create the n-ambiguity the tags fix. */
  def getAs(buildTag: String, k: K)(build: => V): V = map.synchronized {
    val hit = map.get(k)
    if (hit != null && revalidate(hit)) hit
    else {
      if (hit != null) {
        // stale survivor (an executor died with this checkpointed
        // frame's blocks): release what remains and fall through to the
        // rebuild — the BuildLog then shows a same-tag n=2, which is
        // exactly the signal an operator should see for executor churn
        map.remove(k)
        try onEvict(hit) catch {
          case scala.util.control.NonFatal(ex) =>
            System.err.println(s"[graft] memo revalidate-drop hook failed: $ex")
        }
      }
      // report the build's wall seconds to the attribution log — this is
      // how Bench knows which registry key paid for a shared family index
      // (including LRU-eviction REBUILDS, which land on arbitrary keys).
      // enter/exit bracket so a nested prerequisite build records SELF
      // time, not double-counted wall (see BuildLog).
      val t0 = System.nanoTime()
      MemoRegistry.BuildLog.enter()
      var ok = false
      val v = try { val r = build; ok = true; r }
              finally MemoRegistry.BuildLog.exit(
                buildTag, (System.nanoTime() - t0) / 1e9, ok)
      map.put(k, v)
      v
    }
  }

  def contains(k: K): Boolean = map.synchronized(map.containsKey(k))
  def size: Int = map.synchronized(map.size())

  /** Drop every entry, invoking `onDrop` on each value first (e.g. to
    * unpersist a checkpointed DataFrame's blocks). Entries rebuild on next
    * get(); callers must not retain previously returned values across a
    * clear. This is for explicit lifecycle points (Bench between key
    * families) — steady-state eviction stays LRU-per-insert. */
  def clear(onDrop: V => Unit = (_: V) => ()): Int = map.synchronized {
    val n = map.size()
    // NonFatal only — see MemoRegistry.releaseAll: fatal errors (OOM,
    // InterruptedException) must propagate, not vanish in a drop hook.
    map.values().forEach(v => try onDrop(v) catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] memo drop hook failed: $e")
    })
    map.clear()
    n
  }
}
