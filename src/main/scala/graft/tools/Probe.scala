package graft.tools
import org.apache.spark.sql.SparkSession
import graft.Engine
import graft.operators.Dedup
object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Engine.prepare(spark)
    val d = "/root/testdata/sf0.1"
    val docs = Engine.table(spark, d, "documents")
    time("warm scan")(docs.count())
    time("d02 cold")(Dedup.minhashCandidates(docs, minEstJaccard = 0.05).count())
    time("d02 warm")(Dedup.minhashCandidates(docs, minEstJaccard = 0.05).count())
    val e = Engine.table(spark, d, "embeddings")
    time("d06 cold")(graft.operators.VectorSearch.cosineNearDupPairs(e, 0.3).count())
    time("d06 warm")(graft.operators.VectorSearch.cosineNearDupPairs(e, 0.3).count())
    spark.stop()
  }
}
