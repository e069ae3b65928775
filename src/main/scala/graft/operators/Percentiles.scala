package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact interpolated percentiles from a WEIGHTED value rollup — the
  * bounded-state replacement for Spark's exact `percentile()` aggregate
  * (which collects every group value into one aggregation buffer:
  * per-group state linear in group size, an OOM class at 100 TB; q59's
  * `madOutliers` documents the same trade for the median-only case).
  *
  * Input is a rollup of (keys..., v, w): one row per DISTINCT value per
  * group with its occurrence count, so per-group state is bounded by the
  * value-domain cardinality, and every stage (agg, window sort) spills.
  * The interpolation replicates Spark's `Percentile.getPercentile`
  * bit-for-bit so converted queries stay hash-identical to the collecting
  * form they replace: 0-indexed position = (n-1)*p (Long*Double),
  * lower/higher = floor/ceil (Longs), and the blend
  * `(higher-pos)*v_lo + (pos-lower)*v_hi` in that operand order.
  * v_k is read from the cumulative weight as "min v whose cumulative
  * count reaches k+1" — exact order statistics, no per-row sort state.
  *
  * The value column must already be the FINAL double the percentile is
  * taken over (e.g. gap_us/1e6): interpolation is linear but floating-
  * point division is not, so transforming after the blend would diverge
  * from the collecting aggregate by an ulp. Callers group by the exact
  * integer domain and divide in the rollup select — injective while the
  * quotient spacing exceeds the double ulp (all call sites are micros or
  * day counts, far inside that bound).
  */
object Percentiles {

  /** @param cnt  rollup rows (keys..., v, w) — one per distinct value
    * @param keys group-by columns (empty = one global group)
    * @param v    value column (numeric; cast to double at emission)
    * @param w    weight column (Long count of occurrences of v)
    * @param ps   (fraction, output-column-name) pairs
    * @return one row per group: keys..., n_rows (total weight), ps...
    */
  def percentilesFromCounts(cnt: DataFrame, keys: Seq[String], v: String,
      w: String, ps: Seq[(Double, String)],
      extraAggs: Seq[Column] = Seq.empty): DataFrame = {
    val kcols = keys.map(col)
    val cum = cumulative(cnt, keys, v, w)
    // Per-row rank thresholds: n is a per-group constant broadcast onto
    // every row by the window above, so each percentile's lower/higher
    // order statistics reduce with plain min(when(...)) aggregates.
    val aggCols = (ps.flatMap { case (p, name) =>
      val pos = (col("n") - lit(1L)).cast(DoubleType) * lit(p)
      Seq(
        min(when(col("cum") > floor(pos), col(v))).as(name + "_lo"),
        min(when(col("cum") > ceil(pos), col(v))).as(name + "_hi"))
    } :+ max(col("n")).as("n_rows")) ++ extraAggs
    val agged = (if (keys.isEmpty) cum.groupBy() else cum.groupBy(kcols: _*))
      .agg(aggCols.head, aggCols.tail: _*)
    // extras (same-pass sibling aggregates) keep whatever .as name the
    // caller gave them: everything past keys/lo-hi pairs/n_rows
    val internal = (keys :+ "n_rows").toSet ++
      ps.flatMap(p => Seq(p._2 + "_lo", p._2 + "_hi"))
    val extraCols = agged.columns.filterNot(internal).map(col)
    val outCols = kcols ++ Seq(col("n_rows")) ++ ps.map { case (p, name) =>
      val pos = (col("n_rows") - lit(1L)).cast(DoubleType) * lit(p)
      val lo = floor(pos)
      val hi = ceil(pos)
      when(col(name + "_lo").isNull, lit(null).cast(DoubleType))
        // integral position, or both ranks in one value bucket: return the
        // key directly — Spark's Percentile shortcuts both cases, and the
        // (1-f)*k + f*k blend is NOT bit-exact k in floating point
        .when(lo === hi || col(name + "_lo") === col(name + "_hi"),
          col(name + "_lo").cast(DoubleType))
        .otherwise((hi - pos) * col(name + "_lo").cast(DoubleType)
          + (pos - lo) * col(name + "_hi").cast(DoubleType))
        .as(name)
    }
    agged.select(outCols ++ extraCols: _*)
  }

  /** The DISCRETE companion ([[percentilesFromCounts]]'s bounded-state
    * contract, for `percentile_disc`): the SQL-standard cume_dist
    * definition — the smallest value whose cumulative count reaches
    * ceil(p*n), the 1-indexed rank Spark's PercentileDisc selects
    * (verified across n in 1..999 x 6 fractions incl. the p*n-integral
    * double-rounding boundaries, PercentilesSpec). No interpolation, so
    * the only arithmetic to replicate is the p*n double product —
    * identical operands here and in the aggregate. Emits DOUBLE like
    * the aggregate does; call sites re-cast as they did before.
    *
    * @param extraAggs additional aggregates evaluated over the SAME
    *        cumulative rollup pass (e.g. `sum(col(w))`, `max(col(v))`,
    *        weighted totals) — siblings ride the one exchange instead
    *        of a second aggregation + join over the rollup. Appended
    *        after the percentile columns; name them with `.as`.
    *        `cum` and `n` are reserved internal column names in both
    *        helpers (the rollup frame must not carry them).
    */
  def percentileDiscFromCounts(cnt: DataFrame, keys: Seq[String], v: String,
      w: String, ps: Seq[(Double, String)],
      extraAggs: Seq[Column] = Seq.empty): DataFrame = {
    val kcols = keys.map(col)
    val cum = cumulative(cnt, keys, v, w)
    val discCols = ps.map { case (p, name) =>
      min(when(col("cum") >= ceil(lit(p) * col("n")), col(v)))
        .cast(DoubleType).as(name)
    }
    // column order: keys..., n_rows, percentiles..., extras...
    val aggCols = (max(col("n")).as("n_rows") +: discCols) ++ extraAggs
    (if (keys.isEmpty) cum.groupBy() else cum.groupBy(kcols: _*))
      .agg(aggCols.head, aggCols.tail: _*)
  }

  /** Shared cumulative frame: per-group running weight over the value
    * order plus the group total, broadcast onto every rollup row. */
  private def cumulative(cnt: DataFrame, keys: Seq[String], v: String,
      w: String): DataFrame = {
    val part = if (keys.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(keys.map(col): _*)
    cnt
      .withColumn("cum", sum(col(w)).over(part.orderBy(col(v))))
      .withColumn("n", sum(col(w)).over(part))
  }
}
