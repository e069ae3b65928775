package graft
import org.scalatest.funsuite.AnyFunSuite

/** The derived-density-knob functions (SemDeDup k, LSH planes, IVF
  * cells) call Engine.memoCount at plan-build time; without a
  * cross-build cache hit every rebuild of the same query (bench
  * warm+timed, lint sweeps, repeated model builds) would re-run the
  * count job. Frame CONSTRUCTION itself may run a footer/listing job,
  * so the probe isolates exactly the memoCount call. */
class MemoCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("memoCount hits across separate builds of the same source") {
    val jc = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jc.incrementAndGet()
    })
    val a = Engine.table(spark, TestSpark.sf, "embeddings")
    val n1 = Engine.memoCount(a)
    val b = Engine.table(spark, TestSpark.sf, "embeddings") // fresh build
    Thread.sleep(500)
    val before = jc.get()
    val n2 = Engine.memoCount(b) // must be a pure cache hit: zero jobs
    Thread.sleep(500)
    assert(n1 == n2 && n1 > 0)
    assert(jc.get() == before,
      s"memoCount MISSED on a rebuilt frame: ${jc.get() - before} job(s) ran")
    // different dirs must NOT collide (key includes root paths)
    val other = Engine.table(spark, "/root/testdata/sf0.01", "embeddings")
    assert(Engine.memoCount(other) != n1 || other.count() == n1)
  }
}
