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

  test("funnel ordering + window semantics on crafted edge cases") {
    import spark.implicits._
    def t(h: Int, m: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // u1: full ordered funnel inside 24h            -> 3
    // u2: purchase BEFORE click (order violation)   -> 2
    // u3: click BEFORE the first view               -> 1
    // u4: click 25h after the view (window expired) -> 1
    // u5: no view at all (funnel never starts)      -> 0
    // u6: second click inside window rescues an early out-of-order one -> 2
    val rows = Seq(
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)),
      (2L, "view", t(1)), (2L, "purchase", t(2)), (2L, "click", t(3)),
      (3L, "click", t(1)), (3L, "view", t(2)),
      (4L, "view", t(1)), (4L, "click",
        java.sql.Timestamp.valueOf(t(1).toLocalDateTime.plusHours(25))),
      (5L, "click", t(1)), (5L, "purchase", t(2)),
      (6L, "click", t(1)), (6L, "view", t(2)), (6L, "click", t(3)))
    val ev = rows.toDF("user_id", "event_type", "ts")
    val got = Events.funnelSteps(ev).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 1, 5L -> 0, 6L -> 2))
  }
}
