package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Engine, SparkEntry, TestSpark}

class EventsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("our sessionize agrees with Spark's native session_window") {
    val ev = Engine.table(spark, TestSpark.sf, "events")
    // (user, session-start, event-count) triples must be identical
    val ours = Events.sessionize(ev).select(
      col("user_id"), col("t_start"), col("n_events")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val native = SparkEntry.queries("e06_session_window_native")(spark, TestSpark.sf)
      .select(col("user_id"), col("t_start"), col("n_events")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(ours == native)
  }

  test("fmgr proc names are SQL-callable with adt.rs semantics") {
    val r = spark.sql(
      """SELECT int4pl(3, 4), int4mi(3, 4), int4mul(3, 4),
                int4div(7, 2), int4in('42'), int4out(7)""").head
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
      r.getInt(4), r.getString(5)) == ((7, -1, 12, 3, 42, "7")))
    intercept[Exception](
      spark.sql("SELECT int4pl(2147483647, 1)").collect()) // overflow errors
    intercept[Exception](
      spark.sql("SELECT int4in('abc')").collect()) // malformed input errors
  }

  test("LSH near-dup path recovers most of the exact pair set") {
    val e = Engine.table(spark, TestSpark.sf, "embeddings")
    val exact = VectorSearch.cosineNearDupPairs(e, 0.3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = VectorSearch.cosineNearDupPairsLsh(e, 0.3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // no false positives (exact rescoring)
    val recall = (exact intersect lsh).size.toDouble / math.max(exact.size, 1)
    assert(recall >= 0.3, s"recall=$recall")
  }

  test("range joins keep equi-join plans — no nested loop, no cartesian") {
    for (q <- Seq("e09_time_band_join", "e10_interval_overlap")) {
      val plan = graft.SparkEntry.queries(q)(spark, graft.TestSpark.sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q has a nested loop join")
    }
  }
}
