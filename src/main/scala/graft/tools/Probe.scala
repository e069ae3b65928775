package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession

object Probe {
  def main(args: Array[String]): Unit = {
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
}
