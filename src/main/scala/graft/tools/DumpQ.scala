package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump named SparkEntry queries to parquet (before/after fingerprint
  * harness for plan rewrites at big SF, where the DuckDB oracle is the
  * expensive side). Usage: runMain graft.tools.DumpQ <sfDir> <outDir> <q...> */
object DumpQ {
  def main(args: Array[String]): Unit = {
    val Array(dir, out) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Engine.prepare(spark)
    for (q <- args.drop(2)) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.mode("overwrite").parquet(s"$out/$q")
      graft.Engine.releaseEphemeral(spark) // per-query lifecycle (r17)
      println(f"[dumpq] $q dumped in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
