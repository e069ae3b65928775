package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch measurement harness for the r18 optimization round: one-off
  * stage-split timings behind named subcommands (kept out of Probe so
  * the committed diagnostics stay stable). */
object QuickProbe {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("q59")
    val d = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Engine.prepare(spark)
    def timeIt(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def q(name: String): Unit = {
      graft.SparkEntry.queries(name)(spark, d).count()
      graft.Engine.releaseEphemeral(spark)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, d).count()
        graft.Engine.releaseEphemeral(spark)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name warm min=${times.min}%.2f s  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    what match {
      case "q59" =>
        q("q59_mad_outliers")
        val j = graft.Engine.table(spark, d, "lineitem")
          .join(graft.Engine.table(spark, d, "part"),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"),
            round(col("l_extendedprice") * 100, 0).cast(LongType).as("pc"))
        val cnt = j.groupBy("p_brand", "pc").agg(count(lit(1)).as("c"))
        cnt.write.format("noop").mode("overwrite").save()
        timeIt("cnt rollup alone (noop)")(
          cnt.write.format("noop").mode("overwrite").save())
        println("[probe] distinct (brand,pc) rows: " + cnt.count())
      case "nb" =>
        q("t28_nb_lang_classifier")
        q("t32_nb_margin")
      case "names" =>
        // args containing '=' are session conf sets (e.g.
        // graft.q69.inputStorageLevel=DISK_ONLY), applied in order
        // before the queries that follow them
        args.drop(2).foreach { a =>
          if (a.contains('=')) {
            val Array(k, v) = a.split("=", 2)
            spark.conf.set(k, v)
            println(s"[probe] conf $k=$v")
          } else q(a)
        }
      case other =>
        // treat as a query name list starting at args(0)
        (Seq(other) ++ args.drop(2)).foreach(q)
    }
    spark.stop()
  }
}
