package graft.tools

/** Process-wide list of memo release hooks.
  *
  * Each operator family that memoizes a derived artifact (shingle index,
  * edge list, PQ codebooks — all [[LruMemo]]s over localCheckpoint'd frames)
  * registers a release closure here at init. A long single-JVM sweep over
  * the whole registry (Bench's 240+-key run, Verify's full dump) otherwise
  * accumulates every family's checkpoint blocks for the entire run: by the
  * tail, queries pay GC and block-eviction pressure for state no later
  * query will ever read. Round-5 measurements put that inflation at 5-20×
  * on tail keys (stat_crosstab 29.4 s driver-run vs 1.5 s isolated).
  *
  * [[releaseAll]] is called at family boundaries; memos rebuild on next
  * use, so this is purely a memory/GC lifecycle hook, never a correctness
  * one. On a real cluster the analogue is per-pipeline session teardown.
  */
object MemoRegistry {
  /** The ONE family-boundary release walker Bench and Verify share: keys
    * arrive sorted, so a family's memoized indexes are dead the moment
    * the `takeWhile('_')` prefix changes. Previously each tool inlined
    * its own copy of this walk — a change to the family convention had
    * to be made twice or the tools silently released at different
    * boundaries. `gcSettle` adds Bench's collect-now bracket so the
    * dead blocks' GC doesn't land inside the next key's timing window. */
  final class FamilyReleaser(gcSettle: Boolean) {
    private var prev = ""
    def onKey(name: String): Unit = {
      val fam = name.takeWhile(_ != '_')
      if (prev.nonEmpty && fam != prev) {
        releaseAll()
        if (gcSettle) { System.gc(); Thread.sleep(150) }
      }
      prev = fam
    }
  }

  private val hooks = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  def register(release: () => Unit): Unit = synchronized { hooks += release }

  def releaseAll(): Unit = synchronized {
    // NonFatal only: a release hook dying of OOM/StackOverflow must not
    // have its first symptom swallowed by the very hook meant to relieve
    // memory pressure. Non-fatal drop failures are logged, not rethrown —
    // release stays a lifecycle hint, never a correctness gate.
    hooks.foreach(h => try h() catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] memo release hook failed: $e")
    })
  }
}
