package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Plan-shape assertions: correctness is gated by the DuckDB oracle
  * (tools/check.py / the driver); these tests pin the PHYSICAL plan
  * properties that matter at 100 TB — filter pushdown, broadcast
  * selection, partial aggregation — so a regression in plan quality
  * fails CI even while results stay right. */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("flagship entry returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01: filter is pushed into the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q04: dimension join is broadcast, not shuffle") {
    val p = plan("q04_brand_volume")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q05: star join broadcasts the small dims") {
    val p = plan("q05_nation_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q06: column pruning reaches the scan") {
    val p = plan("q06_revenue_delta")
    // only the needed columns in ReadSchema
    assert(p.contains("l_extendedprice"), p)
    assert(!p.contains("l_partkey"), p)
  }

  test("q07: semi join planned (no full materialization)") {
    assert(plan("q07_orders_with_bulk_items").contains("LeftSemi"))
  }

  test("q09: single window, no extra shuffles") {
    val p = plan("q09_top2_orders_per_customer")
    assert(p.contains("Window"), p)
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("queries and oracle keys line up") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size == SparkEntry.all.size) // no dup names
  }

  test("t09: repetition signals are a shuffle-free scan+project") {
    // the whole point of the MaxShingleCount kernel: per-document stats
    // must never exchange data (the oracle's explode+groupBy would)
    val p = plan("t09_repetition")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("t10: vocab top-k is partial-agg + TakeOrdered, no global sort") {
    val p = plan("t10_vocab_topk")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // map-side combine
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q47: one shuffle for the range-frame window") {
    val p = plan("q47_range_frame")
    assert(p.contains("Window"), p)
    assert("Exchange".r.findAllIn(p).size <= 1, p)
  }

  test("q55: moment-based stats are one partial+final aggregation") {
    val p = plan("q55_stat_aggs")
    // all eight moments + booleans accumulate in a single map-side
    // combine -> one shuffle on the group key; a builtin-stats plan or
    // a second pass would add exchanges
    assert("Exchange".r.findAllIn(p).size <= 1, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q50: EXCLUDE-frame compilation stays one window pass") {
    val p = plan("q50_frame_exclude")
    assert("Window".r.findAllIn(p).size <= 1, p)
    assert("Exchange".r.findAllIn(p).size <= 1, p)
  }

  test("t21: per-source cap is exactly the two phase shuffles") {
    val p = plan("t21_per_source_cap")
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("q53 compilation matches hand-computed GROUPS frame semantics") {
    // both engines run the SAME dense_rank + RANGE text, so the gate
    // cannot catch a wrong compilation — pin it to the definition here.
    // values [1,1,2,4,4,7]: peer groups {1,1} {2} {4,4} {7}; GROUPS
    // BETWEEN 1 PRECEDING AND 1 FOLLOWING counts adjacent-group rows
    import spark.implicits._
    val df = Seq(1, 1, 2, 4, 4, 7).toDF("v")
    df.createOrReplaceTempView("groups_probe")
    val got = spark.sql(
      """WITH g AS (SELECT v, DENSE_RANK() OVER (ORDER BY v) AS dr
           FROM groups_probe)
         SELECT v, COUNT(*) OVER (ORDER BY dr
           RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS n
         FROM g""")
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1, 3L), (1, 3L), (2, 5L), (4, 4L), (4, 4L), (7, 3L)),
      s"got $got")
  }
}
