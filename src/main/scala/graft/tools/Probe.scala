package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession

object Probe {
  def main(args: Array[String]): Unit = {
    if (args.length >= 2 && args(0) == "t18") { t18diag(args(1), args(2)); return }
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sess = new GraftSession(spark)
    def run(q: String): Unit = {
      print(s"graft=# $q\n")
      try sess.execute(q).show(10, false)
      catch { case e: Exception => println("ERROR:  " + e.getMessage.linesIterator.next()) }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_probe")
    val csv = dir.resolve("in.csv")
    java.nio.file.Files.writeString(csv, "a|b|c\n1|2|x\n3||y\n")
    run("DROP TABLE IF EXISTS probe_t")
    run("CREATE TABLE probe_t (a int, b smallint, c varchar(10))")
    run(s"COPY probe_t FROM '$csv' WITH CSV HEADER DELIMITERS '|' NULL ''")
    run("SELECT * FROM probe_t ORDER BY a")
    spark.stop()
  }

  /** Cross-engine diagnostic for t18_dsir_weights: dump the Spark-side
    * per-DISTINCT-token DSIR term (raw double + 6dp-rounded) so a DuckDB
    * run of the identical formula can be diffed term-by-term. A token's
    * term is fully determined by (ct, cr, corpus stats), so distinct
    * tokens cover every per-occurrence value in the aggregate.
    */
  def t18diag(sfDir: String, outDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // one row per DISTINCT token (a token's term is fully determined by
    // its two counts) — diffable against a DuckDB run of the same formula
    graft.operators.TextPipeline.dsirTerms(spark, sfDir)
      .groupBy("token").agg(first("term_raw").as("term_raw"),
        round(first("term_raw"), 6).as("term6"))
      .coalesce(1)
      .write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
