package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed inventory can never drift from the registries again:
  * round-4 review caught docs/COVERAGE.md one key behind SparkEntry
  * (llm_dedup_incremental_near registered but absent from the table).
  * This pins the committed file to the generator's output byte-for-byte —
  * adding a query without re-running `sbt "runMain graft.CoverageDoc"`
  * fails the build. */
class CoverageDocSpec extends AnyFunSuite {

  test("committed docs/COVERAGE.md matches the live registries byte-for-byte") {
    val committed = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("docs/COVERAGE.md")), "UTF-8")
    val generated = CoverageDoc.render
    assert(committed == generated,
      "docs/COVERAGE.md is stale — regenerate with: sbt \"runMain graft.CoverageDoc\"")
  }

  test("every query key appears in the doc; totals line matches the registry") {
    val doc = CoverageDoc.render
    assert(doc.contains(
      s"Totals: ${SparkEntry.queries.size} queries, ${SparkEntry.oracleSql.size} with oracles."))
    SparkEntry.queries.keys.foreach(k => assert(doc.contains(s"| `$k` |"), s"key $k missing"))
    // every oracle key must be a declared query (no orphaned oracles)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
