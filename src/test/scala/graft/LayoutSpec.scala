package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level proof of the 100 TB layout claims: partition pruning
  * reaches the scan, and bucketed joins/aggregations run shuffle-free. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
  }

  test("date-partitioned events: filters become PartitionFilters (pruning)") {
    freshTable("events_by_date")
    val ev = Layout.withEventDate(
      Engine.table(spark, TestSpark.sf, "events"), "ts")
    Layout.writePartitioned(ev, "events_by_date", Seq("event_date"))

    val q = spark.table("events_by_date")
      .filter(col("event_date") === "2024-01-05")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("event_date"), plan)
    // pruned scan reads only the matching partition's rows
    val all = spark.table("events_by_date").count()
    val day = q.count()
    assert(day > 0 && day < all)
  }

  test("compaction collapses a many-small-files table to few files") {
    freshTable("frag_t"); freshTable("frag_t__compacted")
    Engine.table(spark, TestSpark.sf, "lineitem")
      .repartition(40) // simulate 40 micro-batch files
      .write.format("parquet").saveAsTable("frag_t")
    def nFiles = {
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "frag_t")
      Option(loc.listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    }
    val before = nFiles
    assert(before >= 40)
    val rows = spark.table("frag_t").count()
    Layout.compact(spark, "frag_t", targetFileMB = 128)
    assert(nFiles < 5, s"files after compact: $nFiles")
    assert(spark.table("frag_t").count() == rows) // no data loss
  }

  test("bucketed fact tables join with no exchange on either side") {
    freshTable("li_bucketed"); freshTable("ord_bucketed")
    Layout.writeBucketed(
      Engine.table(spark, TestSpark.sf, "lineitem")
        .withColumnRenamed("l_orderkey", "okey"),
      "li_bucketed", "okey", buckets = 8)
    Layout.writeBucketed(
      Engine.table(spark, TestSpark.sf, "orders")
        .withColumnRenamed("o_orderkey", "okey"),
      "ord_bucketed", "okey", buckets = 8)

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), "okey")
      .groupBy("okey").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() > 0)

    // and the same join WITHOUT bucketing does shuffle — the layout is
    // what removes the exchanges, not some global config
    val unbucketed = Engine.table(spark, TestSpark.sf, "lineitem")
      .withColumnRenamed("l_orderkey", "okey")
      .join(Engine.table(spark, TestSpark.sf, "orders")
        .withColumnRenamed("o_orderkey", "okey")
        .hint("merge"), "okey")
    assert(unbucketed.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"))
  }
}
