package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, GQ}
import graft.GQ.osum

/** Analytic extensions of the declared surface: cube grouping, full
  * window-function family, ordered string aggregation, exact interpolated
  * percentiles, and mergeable HLL sketches (the 100 TB distinct-count
  * pattern: sketch partial-aggregates combine associatively, so the same
  * query runs unchanged on any partition count).
  */
object Analytics {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Engine.table(s, d, n)

  val defs: Seq[GQ] = Seq(

    GQ("q25_cube_volume",
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          ${osum("l_extendedprice")} AS sum_price
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""),
      (s, d) => t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), Engine.dsum(col("l_extendedprice")).as("sum_price"))),

    GQ("q26_window_analytics",
      Some("""SELECT o_custkey, o_orderkey,
          lag(o_orderkey) OVER w AS prev_order,
          lead(o_orderkey) OVER w AS next_order,
          dense_rank() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderpriority, o_orderkey) AS prio_rank,
          ntile(4) OVER w AS quartile,
          first_value(o_orderkey) OVER w AS first_order,
          CAST(date_diff('day',
            CAST(lag(o_orderdate) OVER w AS DATE),
            CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""),
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        val wp = Window.partitionBy("o_custkey").orderBy("o_orderpriority", "o_orderkey")
        t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          lag("o_orderkey", 1).over(w).as("prev_order"),
          lead("o_orderkey", 1).over(w).as("next_order"),
          dense_rank().over(wp).as("prio_rank"),
          ntile(4).over(w).as("quartile"),
          first(col("o_orderkey")).over(w).as("first_order"),
          datediff(col("o_orderdate").cast(DateType),
            lag(col("o_orderdate"), 1).over(w).cast(DateType))
            .cast(IntegerType).as("days_since_prev"))
      }),

    GQ("q27_string_agg",
      Some("""SELECT n_regionkey,
          string_agg(n_name, ',' ORDER BY n_name) AS nations,
          COUNT(*) AS n
        FROM nation GROUP BY n_regionkey"""),
      (s, d) => t(s, d, "nation")
        .groupBy("n_regionkey")
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))),

    GQ("q28_percentiles",
      Some("""SELECT l_returnflag,
          quantile_cont(l_quantity, 0.25) AS p25,
          quantile_cont(l_quantity, 0.5) AS p50,
          quantile_cont(l_quantity, 0.75) AS p75,
          quantile_cont(l_extendedprice, 0.9) AS price_p90,
          min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        FROM lineitem GROUP BY l_returnflag"""),
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          expr("percentile(l_extendedprice, 0.9)").as("price_p90"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))),

    // Mergeable-sketch distinct count (HLL, Apache DataSketches builtin).
    // Estimates are sketch-library-specific -> rows-only gate; relative
    // error vs exact is asserted in AnalyticsSpec.
    GQ("a01_hll_distinct", None,
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("approx_parts"),
          expr("approx_count_distinct(l_suppkey)").as("approx_supps"),
          countDistinct(col("l_partkey")).as("exact_parts")))
  )
}
