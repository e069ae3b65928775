package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Engine, TestSpark}

/** a01/a02 are the suite's two rows-only correctness entries: their
  * values pass through sketch-library internals (DataSketches HLL
  * compaction, HLL++ registers, GK quantile summaries) that no DuckDB
  * SQL can restate. This spec pins them MECHANICALLY instead: the same
  * aggregation over the same rows under different input partitionings
  * must produce byte-identical output. That is the mergeability
  * contract the 100 TB design rests on — merge(sketch(A), sketch(B))
  * must not depend on how the executor split A from B:
  *  - HLL / HLL++ merge is a per-register max — commutative and
  *    associative, so any partitioning yields identical registers;
  *  - a02's approx_percentile (GK summaries at accuracy 10000) holds
  *    every value exactly while groups stay under the accuracy bound —
  *    true at gate scale, so its merges are lossless here (at corpus
  *    scale the estimate may legitimately drift with partitioning; the
  *    EXACT arm rides alongside precisely to keep a partition-stable
  *    answer in the output);
  *  - the exact arms (countDistinct, percentilesFromCounts) are
  *    invariant by construction.
  * If a library upgrade ever breaks this, the entry needs the
  * documented normalization wrapper before it can ship.
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toIndexedSeq

  private def li(n: Int): DataFrame =
    Engine.table(spark, TestSpark.sf, "lineitem").repartition(n)

  test("a01 sketch distinct-counts are partition-count invariant (7 vs 13)") {
    def run(n: Int): Seq[String] = canon(li(n)
      .groupBy("l_returnflag")
      .agg(
        expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("approx_parts"),
        expr("approx_count_distinct(l_suppkey)").as("approx_supps"),
        countDistinct(col("l_partkey")).as("exact_parts")))
    assert(run(7) == run(13))
  }

  test("a02 percentile sketches are partition-count invariant (7 vs 13)") {
    def run(n: Int): Seq[String] = {
      val l = li(n)
      val sk = l.groupBy("l_returnflag")
        .agg(expr(
          "approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)")
          .as("pcts"))
      val pc = l.groupBy(col("l_returnflag"), col("l_extendedprice").as("v"))
        .agg(count(lit(1)).as("c"))
      val ex = Percentiles.percentilesFromCounts(pc, Seq("l_returnflag"),
        "v", "c", Seq(0.5 -> "exact_p50"))
      canon(sk.join(broadcast(ex.select(col("l_returnflag"), col("exact_p50"))),
          "l_returnflag")
        .select(col("l_returnflag"),
          element_at(col("pcts"), 1).as("approx_p25"),
          element_at(col("pcts"), 2).as("approx_p50"),
          element_at(col("pcts"), 3).as("approx_p75"),
          col("exact_p50")))
    }
    assert(run(7) == run(13))
  }
}
