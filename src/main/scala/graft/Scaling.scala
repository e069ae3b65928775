package graft

import org.apache.spark.sql.SparkSession

/** Local scaling probe: times a query family at two scale-factor dirs
  * in one session (warm = 2nd in-session run, the BASELINE.md
  * methodology) and prints one JSON line per query with both times,
  * the time ratio, and both output row counts. Row counts ride along
  * because a ratio is only interpretable against the output's own
  * growth: super-linear TIME with matching super-linear OUTPUT is the
  * data's shape; super-linear time over linear output is a plan
  * problem. Results feed SCALING.md.
  *
  * Usage: runMain graft.Scaling <sfDirA> <sfDirB> [query ...]
  */
object Scaling {
  private val headline = Seq(
    "q03_top_orders", "q05_nation_revenue", "q59_mad_outliers",
    "q69_market_basket", "d02_dedup_minhash_lsh",
    "d07_embedding_neardup_lsh", "s02_ann_lsh", "t14_span_dedup",
    "d15_entity_pairs", "d16_entity_clusters", "e20_dau_wau")

  /** Declared-quadratic audit arms (their scale twin is probed
    * instead): d06 is d07's exact all-pairs oracle twin. (s10's
    * BENCHED entry is already the LSH arm — it probes normally at
    * ~10x; its exact arm lives only in VectorSearchSpec.) Excluded
    * from --all; probe explicitly to watch a quadratic be quadratic. */
  private val declaredQuadratic = Set("d06_embedding_neardup")

  def main(args: Array[String]): Unit = {
    val Array(dirA, dirB) = args.take(2)
    val names =
      if (args.length > 2 && args(2) == "--all")
        SparkEntry.queries.keys.toSeq.sorted
          .filterNot(declaredQuadratic)
          .drop(if (args.length > 3) args(3).toInt else 0)
          .take(if (args.length > 4) args(4).toInt else Int.MaxValue)
      else if (args.length > 2) args.drop(2).toSeq
      else headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Engine.prepare(spark)
    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timed(name: String, dir: String): (Double, Long) = {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm: codegen/JIT/planning
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    for (name <- names) {
      val (ta, ra) = timed(name, dirA)
      val (tb, rb) = timed(name, dirB)
      println(s"""{"query":"$name","secsA":${f3(ta)},"secsB":${f3(tb)},""" +
        s""""ratio":${f3(tb / math.max(ta, 1e-9))},"rowsA":$ra,"rowsB":$rb}""")
    }
    spark.stop()
  }
}
