package graft.tools
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch: total Spark jobs a query submits — for tuning the
  * ClusterCheck chaos kill points. Usage:
  * runMain graft.tools.JobCount <sfDir> [-Dconf=v ...] <query> ... */
object JobCount {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val (confs, qs) = args.tail.partition(_.startsWith("-D"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Engine.prepare(spark)
    confs.foreach { c =>
      val Array(k, v) = c.stripPrefix("-D").split("=", 2)
      spark.conf.set(k, v)
    }
    val n = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = n.incrementAndGet()
    })
    for (q <- qs) {
      val before = n.get()
      val rows = graft.SparkEntry.queries(q)(spark, dir).count()
      Thread.sleep(500)
      println(s"[jobcount] $q rows=$rows jobs=${n.get() - before}")
    }
    spark.stop()
  }
}
