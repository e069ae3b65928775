package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off plan-string probe (round-17 ShuffleBudget work). */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Engine.prepare(spark)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (n <- args.toSeq) {
      val p = graft.SparkEntry.queries(n)(spark, sf)
        .queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/tmp/plan_$n.txt"), p)
      println(s"wrote /tmp/plan_$n.txt (${p.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
