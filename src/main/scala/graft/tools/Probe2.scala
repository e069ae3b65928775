package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: actual rank error of approx_percentile vs the GK
  * 1/accuracy claim, per flag/quantile, at a given SF. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Engine.prepare(spark)
    val li = graft.Engine.table(spark, dir, "lineitem")
    val sk = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.25,0.5,0.75), 10000)").as("pcts"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    for ((flag, pcts) <- sk; (q, i) <- Seq(0.25, 0.5, 0.75).zipWithIndex) {
      val est = pcts(i)
      val g = li.filter(col("l_returnflag") === flag)
      val n = g.count().toDouble
      val lt = g.filter(col("l_extendedprice") < est).count() / n
      val le = g.filter(col("l_extendedprice") <= est).count() / n
      val err = math.max(lt - q, q - le).max(0.0)
      println(f"$flag q=$q rank=[$lt%.6f,$le%.6f] err=$err%.6f (= ${err * 10000}%.1f x 1/acc)")
    }
    spark.stop()
  }
}
