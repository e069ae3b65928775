package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (Test / fork := true). */
object TestSpark {
  lazy val spark: SparkSession = Engine.session("local[4]", "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}
