package graft

import org.apache.spark.sql.SparkSession

/** Shared job-count probe for memoization specs: counts only jobs
  * started in this probe's job group (concurrent suite activity on the
  * shared session cannot flake it), drains the async listener bus
  * before reading, and removes the listener in a finally block. */
object JobCounter {
  def jobsInGroup(spark: SparkSession, group: String)(body: => Unit): Int = {
    val jc = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.properties != null &&
            group == js.properties.getProperty("spark.jobGroup.id"))
          jc.incrementAndGet()
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    try {
      sc.setJobGroup(group, "job-count probe")
      try body finally sc.clearJobGroup()
      org.apache.spark.GraftTestShim.drainListenerBus(sc)
      jc.get()
    } finally sc.removeSparkListener(listener)
  }
}
