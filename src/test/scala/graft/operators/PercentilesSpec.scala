package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the bounded count-by-value percentile rollup BIT-EXACT against
  * Spark's own collecting `percentile()` aggregate — the equivalence
  * that let q61/e17/e21/e25/q28/a02 drop the OOM-class buffer while
  * keeping their hash-grade oracles. Randomized values with heavy ties,
  * single-element groups, and the fraction set every call site uses.
  */
class PercentilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val fracs = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75",
    0.9 -> "p90", 0.95 -> "p95")

  test("percentilesFromCounts matches percentile() bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // groups of wildly different sizes incl. n=1 and n=2; integer-ish
    // domain with heavy ties (the rollup's whole point)
    val rows = (0 until 8).flatMap { g =>
      val n = Seq(1, 2, 3, 10, 97, 500, 1000, 4096)(g)
      (0 until n).map(_ => (s"g$g", rnd.nextInt(50).toDouble / 4))
    }
    val df = rows.toDF("k", "v")
    val aggs = fracs.map { case (p, name) => expr(s"percentile(v, $p)").as(name) }
    val exact = df.groupBy("k").agg(aggs.head, aggs.tail: _*)
    val cnt = df.groupBy("k", "v").agg(count(lit(1)).as("c"))
    val rolled = Percentiles.percentilesFromCounts(cnt, Seq("k"), "v", "c", fracs)
    val e = exact.collect().map(r => r.getString(0) -> r).toMap
    val got = rolled.collect()
    assert(got.length == 8)
    for (r <- got; ((_, name), i) <- fracs.zipWithIndex) {
      val want = e(r.getString(0)).getDouble(1 + i)
      val have = r.getDouble(2 + i) // keys, n_rows, then fractions
      assert(java.lang.Double.doubleToRawLongBits(want)
          == java.lang.Double.doubleToRawLongBits(have),
        s"${r.getString(0)} $name: percentile()=$want rollup=$have")
    }
  }

  test("global (keyless) rollup matches percentile() and counts rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 999).map(_ => rnd.nextInt(100).toDouble).toDF("v")
    val exact = df.agg(expr("percentile(v, 0.5)").as("p50"),
      expr("percentile(v, 0.9)").as("p90")).collect()(0)
    val cnt = df.groupBy("v").agg(count(lit(1)).as("c"))
    val r = Percentiles.percentilesFromCounts(cnt, Seq.empty, "v", "c",
      Seq(0.5 -> "p50", 0.9 -> "p90")).collect()(0)
    assert(r.getLong(0) == 999L)
    assert(r.getDouble(1) == exact.getDouble(0) && r.getDouble(2) == exact.getDouble(1))
  }

  test("percentileDiscFromCounts matches percentile_disc across sizes and fractions") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // sweep group sizes incl. every p*n-integral double-rounding
    // boundary for these fractions (n divisible by 4, 20, 100)
    val rows = (0 until 12).flatMap { g =>
      val n = Seq(1, 2, 3, 4, 5, 19, 20, 21, 40, 100, 500, 999)(g)
      (0 until n).map(_ => (s"g$g", rnd.nextInt(40).toLong))
    }
    val df = rows.toDF("k", "v")
    val fr = Seq(0.05 -> "p05", 0.25 -> "p25", 0.5 -> "p50",
      0.75 -> "p75", 0.95 -> "p95", 0.99 -> "p99")
    val aggs = fr.map { case (p, name) =>
      expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY v)").as(name) }
    val exact = df.groupBy("k").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getString(0) -> r).toMap
    val cnt = df.groupBy("k", "v").agg(count(lit(1)).as("c"))
    val got = Percentiles.percentileDiscFromCounts(cnt, Seq("k"), "v", "c", fr)
      .collect()
    assert(got.length == 12)
    for (r <- got; ((_, name), i) <- fr.zipWithIndex)
      assert(r.getDouble(2 + i) == exact(r.getString(0)).getDouble(1 + i),
        s"${r.getString(0)} $name")
  }

  test("rollup plans no collecting percentile and spillable stages only") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v")
    val cnt = df.groupBy("k", "v").agg(count(lit(1)).as("c"))
    val p = Percentiles.percentilesFromCounts(cnt, Seq("k"), "v", "c",
      Seq(0.5 -> "p50")).queryExecution.executedPlan.toString
    assert(!p.contains("percentile("))
    assert(p.contains("Window")) // cumulative counts ride the spillable window
  }
}
