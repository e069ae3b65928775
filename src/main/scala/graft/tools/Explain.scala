package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dump executed-plan summaries for plan-quality review:
  * runMain graft.tools.Explain [query ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.all.map(_.name)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      // summary: one line per operator node
      p.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("Aggregate") || l.contains("Scan parquet") ||
          l.contains("Window") || l.contains("Sort") || l.contains("Generate") ||
          l.contains("WholeStageCodegen") || l.contains("Project") && l.contains("Codegen"))
        .map(_.replaceAll("\\[plan_id=\\d+\\]", "").take(150))
        .foreach(println)
    }
    spark.stop()
  }
}
