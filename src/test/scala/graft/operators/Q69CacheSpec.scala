package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Pins the r15 fix for q69's leaked DISK_ONLY persist (r14 verdict
  * "What's wrong" #2): the corpus-sized (order, brand) input frame must
  * not outlive its invocation — the leak accumulated one disk block set
  * per call for the session lifetime, and CacheManager's analyzed-plan
  * matching let a warm bench run read the previous run's blocks,
  * flattering the recorded time by the input build it prices at 3x the
  * basket stage. */
class Q69CacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q69 leaves no cache entry and repeat invocations are cold") {
    // run on a clean cache so any surviving entry is q69's
    spark.sharedState.cacheManager.clearCache()
    val r1 = SparkEntry.queries("q69_market_basket")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    assert(spark.sharedState.cacheManager.isEmpty,
      "q69 left a cache entry alive after returning")
    // a second invocation recomputes from scratch (nothing cached to
    // flatter it) and agrees exactly
    val r2 = SparkEntry.queries("q69_market_basket")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    assert(spark.sharedState.cacheManager.isEmpty)
    assert(r1 == r2 && r1.nonEmpty)
  }
}
