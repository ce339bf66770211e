package graft

import org.scalatest.funsuite.AnyFunSuite

/** The band math behind BENCH_ADJUDICATIONS.json verdicts — the one
  * piece of the adjudication tool that must not drift from BASELINE.md's
  * documented discipline (`min ≤ max(2× prior, prior + 0.15 s)`). */
class BenchAdjudicateSpec extends AnyFunSuite {
  import BenchAdjudicate.verdict

  test("steady: within 10% of the prior floor, including improvements") {
    assert(verdict(prior = 1.0, min = 0.4) == "steady")
    assert(verdict(prior = 1.0, min = 1.0) == "steady")
    assert(verdict(prior = 1.0, min = 1.10) == "steady")
  }

  test("host_band: inside the documented 2x-or-0.15s envelope") {
    assert(verdict(prior = 1.0, min = 1.11) == "host_band")
    assert(verdict(prior = 1.0, min = 2.0) == "host_band")
    // sub-second floors: the +0.15s absolute term governs, so a 0.05s
    // key reading 0.18s is band, not a 3.6x "regression"
    assert(verdict(prior = 0.05, min = 0.18) == "host_band")
  }

  test("regression_confirmed: beyond the band") {
    assert(verdict(prior = 1.0, min = 2.01) == "regression_confirmed")
    assert(verdict(prior = 0.05, min = 0.21) == "regression_confirmed")
  }
}
