package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.LruMemo

/** The stage-memo eviction contract (LlmTextOps caches derived tables in
  * an LruMemo): crossing the capacity bound evicts cold entries one at a
  * time — a live consumer's hot entry is never dropped, unlike the
  * previous clear-all-on-bound behavior. */
class LruMemoSpec extends AnyFunSuite {

  test("exceeding the bound evicts only the coldest entry, never a hot one") {
    val m = new LruMemo[Int, String](3)
    var builds = 0
    def b(i: Int): String = m.get(i) { builds += 1; s"v$i" }
    b(1); b(2); b(3)
    assert(builds == 3 && m.size == 3)
    b(1) // touch: access order is now 2, 3, 1
    b(4) // past capacity: evicts 2 (coldest)
    assert(m.contains(1) && !m.contains(2) && m.contains(3) && m.contains(4))
    b(1)
    assert(builds == 4, "hot entry was rebuilt after unrelated churn")
    // churn far past capacity, touching key 1 before every insert: the
    // live key survives the entire churn
    (10 to 80).foreach { i => b(1); b(i) }
    assert(m.contains(1) && m.size == 3)
  }

  test("capacity eviction fires the onEvict hook exactly once per evicted value") {
    val dropped = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = new LruMemo[Int, String](2, dropped += _)
    def b(i: Int): String = m.get(i)(s"v$i")
    b(1); b(2)
    assert(dropped.isEmpty)
    b(3) // evicts 1
    assert(dropped.toSeq == Seq("v1"))
    b(2) // hit — no eviction
    b(4) // evicts 3 (2 was just touched)
    assert(dropped.toSeq == Seq("v1", "v3"))
    // clear releases the remainder through ITS hook; onEvict is not re-run
    val cleared = scala.collection.mutable.ArrayBuffer.empty[String]
    m.clear(cleared += _)
    assert(cleared.sorted == Seq("v2", "v4") && dropped.size == 2)
  }

  test("a throwing onEvict hook does not break the insert that triggered it") {
    val m = new LruMemo[Int, String](1, _ => sys.error("drop hook boom"))
    m.get(1)("v1")
    assert(m.get(2)("v2") == "v2") // eviction hook throws; insert survives
    assert(!m.contains(1) && m.contains(2))
  }

  test("reentrant build: a build may memoize a prerequisite key") {
    // the cluster-label memo builds on the shingle-index memo; a
    // ConcurrentHashMap.computeIfAbsent would throw on this nesting
    val m = new LruMemo[String, Int](4)
    val r = m.get("outer")(m.get("inner")(21) * 2)
    assert(r == 42 && m.contains("inner") && m.contains("outer"))
  }

  test("each key builds exactly once under concurrent access") {
    val m = new LruMemo[Int, Int](8)
    val builds = new java.util.concurrent.atomic.AtomicInteger
    val threads = (1 to 8).map(_ => new Thread(() =>
      (1 to 100).foreach(i => m.get(i % 4) { builds.incrementAndGet(); i % 4 })))
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(builds.get == 4, s"expected 4 builds, got ${builds.get}")
  }
}
