package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Engine, SparkEntry}

/** Multi-JVM execution check (r11 verdict #3): local[32] shares ONE JVM,
  * so closure serialization, real broadcast transport, and executor-side
  * classloading of the native kernels (NearestCells codebooks, PQ books,
  * bloom sketches, BPE merge tables ride the plan as referenced objects)
  * are never exercised by the test suite. Spark's `local-cluster[2,4,
  * 2048]` mode launches REAL separate executor JVMs through the
  * standalone scheduler — the closest a single box gets to cluster
  * execution. This main runs the headline query family plus a streaming
  * micro-pipeline under local-cluster and compares every result
  * fingerprint against a plain local[32] run of the same build.
  *
  * Usage: SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *          runMain graft.tools.ClusterCheck [sfDir]
  * (SPARK_HOME must point at a Spark distribution so the standalone
  * worker can launch executor JVMs; SPARK_SCALA_VERSION because the
  * release layout lacks the source-build dirs the launcher probes;
  * executors get the driver's classpath via
  * spark.executor.extraClassPath.)
  */
object ClusterCheck {

  /** Headline family: the per-operator-family representatives the r11
    * verdict named, plus the two new serving/skew entries. */
  val family: Seq[String] = Seq(
    "q03_top_orders", "q05_nation_revenue", "q59_mad_outliers",
    "q69_market_basket", "d02_dedup_minhash_lsh",
    "d07_embedding_neardup_lsh", "d10_semantic_dedup", "s03_ann_ivf",
    "t14_span_dedup", "d16_entity_clusters", "e09_time_band_join",
    "e32_band_join_bot_skew", "s14_knn_classifier_ann",
    "s15_ann_ivfpq_indexed")

  /** Order-independent content fingerprint: per-row xxhash64 of the
    * name-sorted column struct rendered to JSON, summed in DECIMAL(38,0)
    * (a raw long sum of 64-bit hashes overflows under ANSI) —
    * partition- and scheduling-independent, content-sensitive (same
    * engine version on both sides, so JSON rendering is identical). */
  def fingerprint(df: DataFrame): (String, Long) = {
    val cols = df.columns.sorted.map(col).toIndexedSeq
    val r = df.select(xxhash64(to_json(struct(cols: _*)))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("h"))
      .agg(sum("h").as("s"), count(lit(1)).as("n")).head()
    (if (r.isNullAt(0)) "0" else r.getDecimal(0).toBigInteger.toString,
      r.getLong(1))
  }

  private def session(master: String): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName(s"graft-clustercheck")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    val withCp =
      if (master.startsWith("local-cluster"))
        // executor JVMs are launched by the standalone worker and do NOT
        // inherit sbt's classpath — hand them the driver's, so graft
        // kernel classes resolve executor-side (the thing local[32]
        // can never prove)
        b.config("spark.executor.extraClassPath", sys.props("java.class.path"))
      else b
    val s = withCp.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Engine.prepare(s)
    s
  }

  private def runFamily(master: String, dir: String): Map[String, (String, Long)] = {
    val spark = session(master)
    try {
      family.map { n =>
        val t0 = System.nanoTime()
        val fp = fingerprint(SparkEntry.queries(n)(spark, dir))
        println(f"[cluster-check] $master%-24s $n%-28s fp=${fp._1}%22s rows=${fp._2}%7d ${(System.nanoTime() - t0) / 1e9}%6.1f s")
        n -> fp
      }.toMap ++ Map("streaming_dedup" -> streamingSmoke(spark))
    } finally spark.stop()
  }

  /** Streaming micro-pipeline under the same master: file-source stream
    * -> exact dedup against a static corpus -> memory sink. Exercises
    * micro-batch planning, state-store updates, and the fingerprint
    * kernel on executor JVMs. */
  private def streamingSmoke(spark: SparkSession): (String, Long) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq("seen before").toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val in = MemoryStream[(Long, String)]
    val out = graft.streaming.DocsStreaming.dedupAgainstCorpus(
      in.toDF().toDF("doc_id", "text"), corpus)
    val name = s"cc_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Append).start()
    in.addData((1L, "seen before"), (2L, "fresh one"), (3L, "fresh one"))
    q.processAllAvailable()
    in.addData((4L, "fresh one"), (5L, "second fresh"))
    q.processAllAvailable()
    q.stop()
    val fp = fingerprint(spark.table(name).select("doc_id"))
    println(s"[cluster-check] streaming_dedup fp=$fp")
    fp
  }

  def main(args: Array[String]): Unit = {
    require(sys.env.contains("SPARK_HOME") &&
      sys.env.contains("SPARK_SCALA_VERSION"),
      "local-cluster mode needs SPARK_HOME and SPARK_SCALA_VERSION set " +
        "(see Scaladoc) — without them executor launch fails mid-run")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val local = runFamily("local[32]", dir)
    val cluster = runFamily("local-cluster[2,4,2048]", dir)
    val bad = local.keys.toSeq.sorted.filter(k => local(k) != cluster(k))
    if (bad.isEmpty)
      println(s"[cluster-check] OK: ${local.size} entries identical across " +
        "local[32] and local-cluster[2,4,2048]")
    else {
      bad.foreach(k => println(
        s"[cluster-check] MISMATCH $k local=${local(k)} cluster=${cluster(k)}"))
      sys.exit(1)
    }
  }
}
