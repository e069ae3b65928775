package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("probeMaxKeyCount memoizes: a rebuilt probe side runs zero jobs") {
    val probeSide = () => graft.Engine.table(spark, TestSpark.sf, "events")
      .filter(col("event_type") === "view").select(col("user_id"))
    val v1 = Skew.probeMaxKeyCount(probeSide(), "user_id")
    val rebuilt = probeSide() // fresh frame; construction may run a listing job
    var v2 = -1L
    val jobs = graft.JobCounter.jobsInGroup(spark, "skew-probe-memo") {
      v2 = Skew.probeMaxKeyCount(rebuilt, "user_id")
    }
    assert(v1 == v2)
    assert(jobs == 0, s"memoized probe re-ran $jobs sampling job(s)")
    // a different key column is a different statistic — must NOT collide
    val other = Skew.probeMaxKeyCount(
      graft.Engine.table(spark, TestSpark.sf, "events")
        .filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id")), "event_id")
    assert(other != v1 || v1 == 0L)
  }

  test("salted join equals plain join and actually scatters the hot key") {
    // hot key: 10k left rows on key=1 vs 3 right rows
    val left = (1 to 10000).map(i => (1L, i)) ++ Seq((2L, -1), (3L, -2))
    val l = left.toDF("k", "payload")
    val r = Seq((1L, "a"), (2L, "b"), (4L, "c")).toDF("rk", "name")

    val plain = l.join(r, $"k" === $"rk").select("k", "payload", "name")
    val salted = Skew.saltedJoin(l, r, "k", "rk",
        saltFactor = 8, leftScatter = Seq("payload"))
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)

    // the hot key's rows spread across multiple salt partitions
    val saltSpread = l.filter($"k" === 1L)
      .withColumn("__salt", pmod(hash($"payload"), lit(8)))
      .select("__salt").distinct().count()
    assert(saltSpread == 8)
  }

  test("salted LEFT join keeps unmatched rows exactly once") {
    val l = ((1 to 500).map(i => (1L, i)) ++ Seq((9L, 0))).toDF("k", "payload")
    val r = Seq((1L, "x"), (1L, "y")).toDF("rk", "name")
    val plain = l.join(r, $"k" === $"rk", "left").select("k", "payload", "name")
    val salted = Skew.saltedJoin(l, r, "k", "rk",
        saltFactor = 4, leftScatter = Seq("payload"), joinType = "left")
      .select("k", "payload", "name")
    assert(salted.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
    assert(salted.filter($"k" === 9L).count() == 1) // unmatched survives once
  }

  test("salting is deterministic across runs (no rand())") {
    val l = (1 to 100).map(i => (1L, i)).toDF("k", "payload")
    def salts = l.withColumn("s", pmod(hash($"payload"), lit(8)))
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(salts == salts)
  }

  test("stats gate: skewed data salts, uniform data runs the plain plan, output identical") {
    // skewed right side: one key holds ~90% of the rows
    val skewed = ((1 to 9000).map(i => (1L, i)) ++
      (1 to 1000).map(i => (i.toLong % 50 + 2, i))).toDF("rk", "rv")
    val uniform = (1 to 10000).map(i => (i.toLong % 500, i)).toDF("rk", "rv")
    val l = (1 to 600).map(i => (i.toLong % 60, i)).toDF("k", "payload")

    assert(Skew.probeMaxKeyCount(skewed, "rk") > 1000L)
    assert(Skew.probeMaxKeyCount(uniform, "rk") < 1000L)

    for (r <- Seq(skewed, uniform)) {
      val gated = Skew.saltedJoinIfSkewed(l, r, "k", "rk",
          hotKeyThreshold = 1000L, saltFactor = 8, leftScatter = Seq("payload"))
        .select("k", "payload", "rv")
      val plain = l.join(r, $"k" === $"rk").select("k", "payload", "rv")
      assert(gated.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
    }
    // the gate's decision is physical only: the skewed arm's plan carries
    // the salt replication, the uniform arm's does not
    val skewPlan = Skew.saltedJoinIfSkewed(l, skewed, "k", "rk",
      hotKeyThreshold = 1000L, saltFactor = 8, leftScatter = Seq("payload"))
      .queryExecution.optimizedPlan.toString
    val uniPlan = Skew.saltedJoinIfSkewed(l, uniform, "k", "rk",
      hotKeyThreshold = 1000L, saltFactor = 8, leftScatter = Seq("payload"))
      .queryExecution.optimizedPlan.toString
    assert(skewPlan.contains("__salt_l"))
    assert(!uniPlan.contains("__salt_l"))
  }

  test("e32 driver entry engages the salted arm (plan carries the salt explode)") {
    // the planted 400x bot user must trip the stats gate at the driver
    // scale factors — otherwise the entry would silently hash-pass on
    // the plain arm (output is identical by contract) and the salted
    // plan would stay production-untested, the r11 gap
    val df = graft.SparkEntry.queries("e32_band_join_bot_skew")(
      spark, TestSpark.sf)
    assert(df.queryExecution.optimizedPlan.toString.contains("__salt_l"),
      "e32 ran the PLAIN arm: the planted skew did not trip the probe")
  }

  test("e09's band join: salted arm equals the plain arm on real events") {
    import graft.Engine
    val e = Engine.table(spark, TestSpark.sf, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val band = col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
      col("v_ts") < col("p_ts")
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("purchase_id").agg(count(col("v_ts")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // force the salted arm (threshold 0) — must equal the plain band join
    val salted = agg(Skew.saltedJoinIfSkewed(p, v, "p_user", "v_user",
      hotKeyThreshold = 0L, saltFactor = 8, leftScatter = Seq("purchase_id"),
      extraCond = band, joinType = "left"))
    val plain = agg(p.join(v, col("v_user") === col("p_user") && band, "left"))
    assert(salted == plain)
  }
}
