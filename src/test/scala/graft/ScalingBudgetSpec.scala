package graft

import org.scalatest.funsuite.AnyFunSuite

/** Completeness lint for the scaling regression gate (SCALING_BUDGET
  * .json + `graft.Scaling --gate`): the d10/s05 regime bugs survived
  * ten rounds of green fixed-SF benches, so the scale-step gate only
  * protects if every driver query stays classified and the budget
  * cannot drift from the query inventory. */
class ScalingBudgetSpec extends AnyFunSuite {

  test("SCALING_BUDGET.json parses, resolves, and classifies every driver query") {
    val b = Scaling.loadBudget()
    val qs = SparkEntry.queries.keySet
    val stale = b.queries.keySet.diff(qs)
    assert(stale.isEmpty, s"budget entries name no driver query: $stale")
    assert(Scaling.classCaps.contains(b.default), s"bad default ${b.default}")
    for (q <- qs)
      assert(Scaling.classCaps.contains(b.classOf(q)),
        s"$q resolves to unknown class ${b.classOf(q)}")
  }

  test("the brute class stays the declared audit-arm set") {
    // brute's loose 50x cap exists for DECLARED |Q| x N audit arms
    // whose scale twin is separately gated; an operator classified
    // brute to dodge its real budget would silently lose gate
    // protection — additions must be justified here.
    val b = Scaling.loadBudget()
    val brutes = b.queries.filter(_._2 == "brute").keySet
    val declared = Set("s01_ann_bruteforce", "s06_range_search",
      "s08_ann_filtered", "s09_knn_classifier", "s13_mmr_rerank")
    assert(brutes == declared,
      s"brute class changed: ${brutes.diff(declared)} added, " +
        s"${declared.diff(brutes)} removed — update the justification")
  }
}
