package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Catalog, GraftSession}

/** Interactive-style smoke drive of the statement surface (the
  * exec_simple_query loop a reference user would exercise over psql). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sess = new GraftSession(spark, Some("/root/testdata/sf0.001"))
    def run(q: String): Unit = {
      print(s"graft=# $q\n")
      try sess.execute(q).show(5, false)
      catch { case e: Exception => println("ERROR:  " + e.getMessage.linesIterator.next()) }
    }
    run("SELECT 1 + 2 AS three")
    run("SHOW batch_size")
    run("SET batch_size = 4096")
    run("SHOW batch_size")
    run("BEGIN")
    run("LOCK TABLE lineitem IN SHARE MODE")
    run("SELECT count(*) AS n FROM lineitem")
    run("COMMIT")
    run("SELECT o_orderpriority, count(*) n FROM orders GROUP BY 1 ORDER BY 1 LIMIT 3")
    run("LOCK TABLE lineitem") // must error: outside txn block
    Catalog.registerKbViews(spark)
    run("SELECT relname, relkind FROM kb_class ORDER BY relname LIMIT 3")
    run("SELECT attname, typname FROM kb_attribute a JOIN kb_type t ON atttypid = t.oid " +
      "JOIN kb_class c ON attrelid = c.oid WHERE relname = 'region' ORDER BY attnum")
    spark.stop()
  }
}
