package graft.tools

import org.apache.spark.sql.SparkSession

/** Price the durable checkpoint strategy (r13 verdict item 3: "no
  * measured price for `reliable` mode"): warm seconds for the
  * iterative family — every operator whose rounds cut lineage through
  * Engine.cut — under `graft.checkpoint.mode=local` (default;
  * executor-memory blocks, lost with the executor) vs `reliable`
  * (durable checkpoint files; survives kill -9 of every executor, the
  * ClusterCheck chaos proof). The delta IS the insurance premium a
  * cluster deployment pays for executor-loss safety on the Pregel
  * family.
  *
  * Methodology matches BASELINE.md: per query and mode, run twice in
  * the same session and keep the SECOND (warm) time; modes alternate
  * within one session (Engine.cut reads the conf per call), local
  * first. The checkpoint dir defaults to java.io.tmpdir on this
  * sandbox — a real deployment would point it at HDFS/S3, where the
  * premium grows with write latency; the local-disk number is the
  * FLOOR of that premium.
  *
  * Usage: runMain graft.tools.PriceReliable <sfDir>
  * Prints a markdown table (for SCALING.md) + one JSON line.
  */
object PriceReliable {

  /** The iterative family: graph fixpoints, distributed components
    * (forced off the driver union-find so rounds actually run), the
    * BPE merge loop, Lloyd's k-means, MMR's greedy selection loop. */
  val family: Seq[(String, Map[String, String])] = Seq(
    "g01_pagerank" -> Map.empty,
    "g04_kcore_peel" -> Map.empty,
    "g05_bfs_hops" -> Map.empty,
    "g08_hits" -> Map.empty,
    "d05_neardup_clusters" -> Map("graft.dedup.driverMaxEdges" -> "0"),
    "t24_bpe_merges" -> Map.empty,
    "c01_kmeans_embeddings" -> Map.empty,
    "s13_mmr_rerank" -> Map.empty)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Engine.prepare(spark)
    def warm(q: String, mode: String, conf: Map[String, String]): Double = {
      spark.conf.set("graft.checkpoint.mode", mode)
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        var last = 0.0
        for (_ <- 1 to 2) {
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(q)(spark, dir).count()
          last = (System.nanoTime() - t0) / 1e9
        }
        last
      } finally {
        spark.conf.unset("graft.checkpoint.mode")
        conf.keys.foreach(spark.conf.unset)
      }
    }
    val rows = family.map { case (q, conf) =>
      val l = warm(q, "local", conf)
      val r = warm(q, "reliable", conf)
      println(f"[price] $q%-24s local=$l%6.2f s reliable=$r%6.2f s x${r / l}%.2f")
      (q, l, r)
    }
    println(s"\n| query | local s | reliable s | premium |")
    println(s"|---|---|---|---|")
    rows.foreach { case (q, l, r) =>
      println(f"| $q | $l%.2f | $r%.2f | ${r / l}%.2fx |")
    }
    val totL = rows.map(_._2).sum
    val totR = rows.map(_._3).sum
    println(f"| TOTAL | $totL%.2f | $totR%.2f | ${totR / totL}%.2fx |")
    val json = rows.map { case (q, l, r) =>
      s"""${Json.str(q)}: {"local": ${f"$l%.3f"}, "reliable": ${f"$r%.3f"}}"""
    }.mkString("{\"sf\": " + Json.str(dir) + ", ", ", ", "}")
    println(json)
    spark.stop()
  }
}
