package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the BASELINE.md record-merge protocol (r13 verdict #2): the
  * committed BENCH_DETAIL.json is the per-query RECORD and an
  * unattended run on a loaded host must not regress it — while a plan
  * change (job-count delta) must take the new timing even when slower,
  * so the record always describes the CURRENT plan. */
class BenchMergeSpec extends AnyFunSuite {
  private val priorSecs = Map("q" -> 2.0)
  private val priorJobs = Map("q" -> 5.0)

  test("same plan, faster run improves the record") {
    assert(Bench.mergeRecord("q", 1.5, 5, priorSecs, priorJobs) == 1.5)
  }

  test("same plan, slower run (host drift) keeps the record") {
    assert(Bench.mergeRecord("q", 40.0, 5, priorSecs, priorJobs) == 2.0)
  }

  test("changed job count takes the new timing even when slower") {
    // the plan changed — the old record no longer describes this query
    assert(Bench.mergeRecord("q", 3.5, 6, priorSecs, priorJobs) == 3.5)
  }

  test("changed job count takes the new timing when faster too") {
    assert(Bench.mergeRecord("q", 0.5, 4, priorSecs, priorJobs) == 0.5)
  }

  test("no prior entry takes the new timing") {
    assert(Bench.mergeRecord("new", 7.0, 3, priorSecs, priorJobs) == 7.0)
  }

  test("prior seconds missing but jobs matching still takes the new timing") {
    // a hand-edited detail file with a jobs entry but no seconds entry
    // must not throw and must record the observed run
    assert(Bench.mergeRecord("q", 4.0, 5, Map.empty, priorJobs) == 4.0)
  }

  // --- stdout per-query fallback encoding (r19): name-sorted integer-ms
  // array. The order contract is the caller's (results are already sorted
  // by full query name); this pins the value encoding itself.
  test("msArray encodes seconds as rounded integer milliseconds in order") {
    assert(Bench.msArray(Seq(Right(0.052), Right(0.8284), Right(2.4494)))
      == "[52,828,2449]")
  }

  test("msArray encodes a failure as -1, not a timing") {
    assert(Bench.msArray(Seq(Right(0.1), Left("SparkException"), Right(0.2004)))
      == "[100,-1,200]")
  }

  test("msArray at 199 suite-scale entries stays far inside the stdout window") {
    // the reason the array exists: 199 map entries measured 2062 chars even
    // at integer-ms precision; the array must leave the ~1900-char consumer
    // tail window comfortable headroom even with every query spiked 10x
    val noisy = Seq.tabulate(199)(i => Right(10.0 + i * 0.037): Either[String, Double])
    assert(Bench.msArray(noisy).length < 1400)
  }
}
