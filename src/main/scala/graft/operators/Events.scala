package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, GQ}
import graft.GQ.osum
import graft.Engine.dsum

/** Event-stream transforms. Each transform is written against a plain
  * DataFrame so the SAME function serves batch (these driver-verified
  * entries) and Structured Streaming (graft.streaming.EventsStreaming
  * applies windowedStats to a readStream source with a watermark) —
  * Spark's unified-batch/stream contract.
  */
object Events {

  private def ev(s: SparkSession, d: String): DataFrame =
    Engine.table(s, d, "events")

  /** Tumbling-hour stats per event type (batch twin of the streaming
    * windowed aggregation). */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))

  /** Gap-based sessionization (30 min): lag + cumulative flag sum. The
    * batch twin of flatMapGroupsWithState sessionization (streaming/).
    * (user_id, ts, event_id) is a deterministic total order. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes * 60L * 1000000L
    val flagged = events.withColumn("is_new",
      when(lag(col("ts"), 1).over(w).isNull ||
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > gapUs, 1)
        .otherwise(0))
    flagged
      .withColumn("sess", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("t_start"), max(col("ts")).as("t_end"),
        dsum(col("value")).as("total_value"))
  }

  /** Ordered funnel (the windowFunnel shape): per user, the deepest
    * view -> click -> purchase step reached, each later step strictly
    * after the previous one and inside `windowHours` of the funnel
    * start. Chained conditional min-aggregations; every agg AND join
    * keys on user_id — one shuffle lineage on the user key, no windows,
    * no per-user event collection. */
  def funnelSteps(events: DataFrame, windowHours: Int = 24): DataFrame = {
    val win = expr(s"INTERVAL $windowHours HOURS")
    // plan-audit note: the three per-step aggregations shuffle DISJOINT
    // event subsets (view/click/purchase filters), so total shuffled
    // volume across the chain is ~one pass over the funnel events plus
    // the user list — an explicit shared repartition would not help
    // (Catalyst pushes each branch's filter below it, and pushed
    // filters reaching the parquet scan matter more)
    val t1 = events.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val t2 = events.filter(col("event_type") === "click")
      .join(t1, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + win)
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val t3 = events.filter(col("event_type") === "purchase")
      .join(t1, "user_id").join(t2, "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("t1") + win)
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    events.select("user_id").distinct()
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0).cast(IntegerType).as("funnel_step"))
  }

  /** Keyed dedup keeping the earliest event — the batch twin of
    * streaming dropDuplicates (deterministic survivor, unlike
    * dropDuplicates' arbitrary pick). */
  def firstEventPerKey(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    events.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts")
  }

  /** Trailing-24h z-score stage over an hourly (event_type, hr, n) rate
    * table — shared by the batch entry (e14) and the streaming monitor
    * (EventsStreaming.hourlyRatesQuery feeds a rollup table; scoring
    * here runs over |types| x |hours| rows, corpus-size-independent).
    * Exact integer window sums keep the double z engine-portable. */
  def anomalyScores(hourly: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(-24, -1)
    val x = hourly
      .withColumn("s", sum(col("n")).over(w))
      .withColumn("ssq", sum(col("n") * col("n")).over(w))
      .withColumn("c", count(lit(1)).over(w))
      .filter(col("c") >= 12)
      .withColumn("m", col("s").cast(DoubleType) / col("c"))
      .withColumn("v",
        (col("ssq").cast(DoubleType)
          - col("s").cast(DoubleType) * col("s").cast(DoubleType) / col("c"))
          / (col("c") - 1))
    x.withColumn("z", round((col("n") - col("m")) / sqrt(col("v")), 6))
      .filter(col("v") > 0 && abs(col("z")) > 2)
      .select("event_type", "hr", "n", "z")
  }

  /** Hour-of-day seasonality z (the e19 stage) over the same hourly
    * (event_type, hr, n) rate table [[anomalyScores]] consumes — so the
    * streaming monitor (EventsStreaming.hourlyRatesQuery's rollup)
    * feeds BOTH detectors from one table. Baseline moments are exact
    * integer sums per (type, hour-of-day); same double contract as
    * anomalyScores. */
  def seasonalScores(hourly: DataFrame): DataFrame = {
    val b = hourly.groupBy(col("event_type").as("b_type"),
        hour(col("hr")).cast(IntegerType).as("hod"))
      .agg(sum("n").cast(LongType).as("s"),
        sum(col("n") * col("n")).cast(LongType).as("ssq"),
        count(lit(1)).as("c"))
      .filter(col("c") >= 10)
    val j = hourly.join(broadcast(b),
        hourly("event_type") === col("b_type") &&
          hour(hourly("hr")).cast(IntegerType) === col("hod"))
      .select(hourly("event_type"), hourly("hr"), hourly("n"),
        ((col("ssq").cast(DoubleType)
          - col("s").cast(DoubleType) * col("s").cast(DoubleType) / col("c"))
          / (col("c") - 1)).as("v"),
        (col("s").cast(DoubleType) / col("c")).as("m"))
    j.filter(col("v") > 0)
      .select(col("event_type"), col("hr"), col("n"),
        round((col("n") - col("m")) / sqrt(col("v")), 6).as("z"))
      .filter(abs(col("z")) > 2)
  }

  /** e11's single source of truth: identical text runs on both engines.
    * The sum aggregates in exact decimal — RANGE frames may be evaluated
    * with re-association (segment trees), where a double sum would be
    * order-sensitive — and emits via the decOut double conversion. */
  private def rollingHourSql: String = """SELECT event_id, user_id, ts,
          CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) OVER (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
            AS DECIMAL(38,6)) AS DOUBLE) AS hour_sum,
          COUNT(*) OVER (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS hour_n
        FROM events"""

  val defs: Seq[GQ] = Seq(

    GQ("e01_hourly_event_stats",
      Some(s"""SELECT date_trunc('hour', ts) AS hr, event_type,
          COUNT(*) AS n, ${osum("value")} AS total_value
        FROM events GROUP BY 1, 2"""),
      (s, d) => hourlyStats(ev(s, d))),

    GQ("e02_sessionize",
      Some(s"""WITH x AS (
          SELECT user_id, event_id, ts, value,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                 THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        y AS (SELECT *, CAST(SUM(is_new) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess FROM x)
        SELECT user_id, sess, COUNT(*) AS n_events,
               MIN(ts) AS t_start, MAX(ts) AS t_end, ${osum("value")} AS total_value
        FROM y GROUP BY user_id, sess"""),
      (s, d) => sessionize(ev(s, d))),

    GQ("e03_first_event_per_key",
      Some("""SELECT user_id, event_type, event_id, ts FROM (
          SELECT user_id, event_type, event_id, ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn
          FROM events) WHERE rn = 1"""),
      (s, d) => firstEventPerKey(ev(s, d))),

    // Native session_window (Spark's merging session operator) — same
    // 30-min-gap semantics as `sessionize` (also cross-validated in
    // EventsSpec). DuckDB has no session windows, but the session set is
    // derivable with the lag+cumsum formulation, so the oracle checks the
    // native operator too.
    GQ("e06_session_window_native",
      Some(s"""WITH x AS (
          SELECT user_id, ts, value,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                 THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        y AS (SELECT *, SUM(is_new) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS UNBOUNDED PRECEDING) AS sess FROM x)
        SELECT user_id, MIN(ts) AS t_start, COUNT(*) AS n_events,
               ${osum("value")} AS total_value
        FROM y GROUP BY user_id, sess"""),
      (s, d) => ev(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .select(col("user_id"), col("session_window.start").as("t_start"),
          col("n_events"), col("total_value"))),

    GQ("e04_json_props",
      Some("""SELECT event_id,
          CAST(json_extract_string(props, '$.k') AS INT) AS k_val
        FROM events"""),
      (s, d) => ev(s, d).select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k_val"))),

    // rolling time-window aggregate: RANGE frame with an interval bound
    // (each row sees the trailing hour of its user's events) — the
    // time-series rolling-sum operator; one shuffle+sort per user key.
    // The sum aggregates in exact decimal (RANGE frames are evaluated
    // with segment trees / re-association in some engines, so a double
    // sum would be order-sensitive) and emits via the decOut conversion.
    GQ("e11_rolling_hour_window", Some(rollingHourSql),
      (s, d) => Engine.sql(s, d, rollingHourSql)),

    // range (band) join: views in the hour before each purchase — an
    // equi key (user) + time-band residual. Shuffles once on the equi
    // key; the band condition filters inside the join stage, so the
    // plan is a plain shuffle join at any scale, never a cross product.
    GQ("e09_time_band_join",
      Some("""WITH p AS (SELECT user_id, ts, event_id FROM events
                WHERE event_type = 'purchase'),
          v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
        SELECT p.event_id AS purchase_id,
               COUNT(v.ts) AS views_prior_hour
        FROM p LEFT JOIN v ON v.user_id = p.user_id
          AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
        GROUP BY p.event_id"""),
      (s, d) => {
        val e = ev(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("purchase_id"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        // the per-user band join is the suite's one hot-KEY-prone
        // shape: a bot user's purchases x views multiply rows inside a
        // single task, which AQE skew-split cannot fix. The salted arm
        // engages only when the stats probe sees a user above the
        // threshold (uniform corpora — this fixture — run the plain
        // plan and skip the replication cost); output is identical
        // either way, so the oracle covers both arms.
        Skew.saltedJoinIfSkewed(p, v, "p_user", "v_user",
            hotKeyThreshold = 100000L, saltFactor = 8,
            leftScatter = Seq("purchase_id"),
            extraCond = col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
              col("v_ts") < col("p_ts"),
            joinType = "left")
          .groupBy("purchase_id")
          .agg(count(col("v_ts")).as("views_prior_hour"))
      }),

    // e09's band join with a PLANTED bot user — the arm a 100 TB
    // deployment actually runs. The fixture is uniform, so e09's stats
    // gate always picks the plain join and the salted scatter was
    // spec-only (r11 verdict); here user 0 gains 400 synthetic views
    // 30 minutes before EACH of its purchases (fixture-derived,
    // SQL-expressible bot behavior) — so the hot key both trips the 1%
    // probe far above the 1000-row threshold at every scale factor AND
    // genuinely multiplies rows inside the join (each bot purchase
    // matches every planted view in its trailing hour: the row-
    // multiplication failure AQE skew-split cannot touch). The driver
    // entry runs — and hash-gates — the salt-explode plan (SkewSpec
    // pins the explode's presence; output is identical to the plain
    // join by the saltedJoin multiplicity contract, which is what lets
    // ONE oracle cover the arm).
    GQ("e32_band_join_bot_skew",
      Some("""WITH p AS (SELECT user_id, ts, event_id FROM events
                WHERE event_type = 'purchase'),
          v0 AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
          planted AS (SELECT b.user_id, b.ts - INTERVAL 30 MINUTE AS ts
                      FROM events b CROSS JOIN range(400) r
                      WHERE b.event_type = 'purchase' AND b.user_id = 0),
          v AS (SELECT * FROM v0 UNION ALL SELECT * FROM planted)
        SELECT p.event_id AS purchase_id,
               COUNT(v.ts) AS views_prior_hour
        FROM p LEFT JOIN v ON v.user_id = p.user_id
          AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
        GROUP BY p.event_id"""),
      (s, d) => {
        val e = ev(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("purchase_id"))
        val v0 = e.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        // replicate via explode (no join — the salt-replication shape),
        // not crossJoin(range): a cross join would plan a nested loop
        val planted = e
          .filter(col("event_type") === "purchase" && col("user_id") === 0)
          .select(col("user_id").as("v_user"),
            (col("ts") - expr("INTERVAL 30 MINUTES")).as("v_ts"))
          .withColumn("__r", explode(sequence(lit(1), lit(400)))).drop("__r")
        val v = v0.unionByName(planted)
        Skew.saltedJoinIfSkewed(p, v, "p_user", "v_user",
            hotKeyThreshold = 1000L, saltFactor = 8,
            leftScatter = Seq("purchase_id"),
            extraCond = col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
              col("v_ts") < col("p_ts"),
            joinType = "left")
          .groupBy("purchase_id")
          .agg(count(col("v_ts")).as("views_prior_hour"))
      }),

    // interval-overlap join WITHOUT an equi key — the case a naive plan
    // turns into a cross product. Scale path: explode each interval to
    // the hour buckets it spans (any overlapping pair shares the bucket
    // containing an intersection point -> sound), equi-join on the
    // bucket, verify the exact overlap inside the stage, dedup pairs.
    // The oracle is DuckDB's native range join over the same sessions.
    GQ("e10_interval_overlap",
      Some(s"""WITH x AS (
          SELECT user_id, event_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                 THEN 1 ELSE 0 END AS is_new
          FROM events WHERE user_id < 50
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        y AS (SELECT *, CAST(SUM(is_new) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess FROM x),
        s AS (SELECT user_id, sess, MIN(ts) AS t_start, MAX(ts) AS t_end
              FROM y GROUP BY user_id, sess)
        SELECT a.user_id AS user_a, a.sess AS sess_a,
               b.user_id AS user_b, b.sess AS sess_b,
               CAST(epoch_us(least(a.t_end, b.t_end))
                    - epoch_us(greatest(a.t_start, b.t_start)) AS BIGINT) AS overlap_us
        FROM s a JOIN s b ON a.user_id < b.user_id
          AND a.t_start <= b.t_end AND b.t_start <= a.t_end"""),
      (s, d) => {
        val sess = sessionize(ev(s, d).filter(col("user_id") < 50))
          .select(col("user_id"), col("sess"), col("t_start"), col("t_end"))
        val bucketed = sess.select(col("user_id"), col("sess"),
          col("t_start"), col("t_end"),
          explode(sequence(date_trunc("hour", col("t_start")),
            date_trunc("hour", col("t_end")),
            expr("INTERVAL 1 HOUR"))).as("hb"))
        val a = bucketed.select(col("hb"), col("user_id").as("user_a"),
          col("sess").as("sess_a"), col("t_start").as("sa"), col("t_end").as("ea"))
        val b = bucketed.select(col("hb"), col("user_id").as("user_b"),
          col("sess").as("sess_b"), col("t_start").as("sb"), col("t_end").as("eb"))
        a.join(b, Seq("hb"))
          .filter(col("user_a") < col("user_b") &&
            col("sa") <= col("eb") && col("sb") <= col("ea"))
          .select(col("user_a"), col("sess_a"), col("user_b"), col("sess_b"),
            (unix_micros(least(col("ea"), col("eb")))
              - unix_micros(greatest(col("sa"), col("sb")))).as("overlap_us"))
          .dropDuplicates("user_a", "sess_a", "user_b", "sess_b")
      }),

    // Ordered funnel (the windowFunnel shape): per user, the deepest
    // view -> click -> purchase step reached, each later step strictly
    // after the previous one and inside 24h of the funnel start. Three
    // conditional min-aggregations chained by joins; every agg AND
    // every join keys on user_id, so the whole funnel is one shuffle
    // lineage on the user key at any scale — no windows, no
    // per-user event collection.
    GQ("e12_funnel",
      Some("""WITH t1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                 WHERE event_type = 'view' GROUP BY 1),
          t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
                 JOIN t1 USING (user_id)
                 WHERE e.event_type = 'click' AND e.ts > t1.t1
                   AND e.ts <= t1.t1 + INTERVAL 24 HOUR GROUP BY 1),
          t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
                 JOIN t1 USING (user_id) JOIN t2 USING (user_id)
                 WHERE e.event_type = 'purchase' AND e.ts > t2.t2
                   AND e.ts <= t1.t1 + INTERVAL 24 HOUR GROUP BY 1)
        SELECT u.user_id,
               CAST(CASE WHEN t3.t3 IS NOT NULL THEN 3
                         WHEN t2.t2 IS NOT NULL THEN 2
                         WHEN t1.t1 IS NOT NULL THEN 1
                         ELSE 0 END AS INT) AS funnel_step
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
        LEFT JOIN t3 USING (user_id)"""),
      (s, d) => funnelSteps(ev(s, d))),

    // Retention cohorts: users cohorted by signup day; for day offsets
    // 0..7, how many are active (any event) that day. Two aggregations
    // (cohort per user, distinct active days per user) and one join,
    // all keyed on user_id; the final (cohort, offset) rollup is a
    // shuffle of |users x 8| rows at most. The standard growth-analytics
    // matrix, as pure keyed dataflow.
    GQ("e13_retention",
      Some("""WITH c AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
                 FROM events WHERE event_type = 'signup' GROUP BY 1),
          a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        SELECT c.cohort, CAST(a.d - c.cohort AS INT) AS day_offset,
               COUNT(DISTINCT a.user_id) AS n_users
        FROM a JOIN c USING (user_id)
        WHERE a.d >= c.cohort AND a.d <= c.cohort + 7
        GROUP BY 1, 2"""),
      (s, d) => {
        val e = ev(s, d)
        val c = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts").cast(DateType)).as("cohort"))
        val a = e.select(col("user_id"), col("ts").cast(DateType).as("d"))
          .distinct()
        a.join(c, "user_id")
          .filter(col("d") >= col("cohort") && col("d") <= date_add(col("cohort"), 7))
          .groupBy(col("cohort"), datediff(col("d"), col("cohort"))
            .cast(IntegerType).as("day_offset"))
          .agg(count_distinct(col("user_id")).as("n_users"))
      }),

    // Event-rate anomaly detection: per event type, hourly counts whose
    // z-score against the trailing 24 observed hours exceeds |2|. All
    // window statistics derive from EXACT integer sums (n, n*n over a
    // ROWS frame) — a float mean/stddev computed incrementally by a
    // sliding-window engine would accumulate error differently per
    // engine (the e11 lesson) — so the one double expression is written
    // identically on both sides. One shuffle for the hourly rollup, one
    // per-type window whose partitions are |hours| rows; at 100 TB the
    // hourly pre-aggregation is what keeps the window input tiny.
    GQ("e14_rate_anomaly",
      Some("""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                 COUNT(*) AS n FROM events GROUP BY 1, 2),
          x AS (SELECT event_type, hr, n,
                  SUM(n) OVER w AS s, SUM(n * n) OVER w AS ssq,
                  COUNT(*) OVER w AS c
                FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
          z AS (SELECT event_type, hr, n, c,
                  (CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / c)
                    / (c - 1) AS v,
                  CAST(s AS DOUBLE) / c AS m
                FROM x WHERE c >= 12)
        SELECT event_type, hr, n, round((n - m) / sqrt(v), 6) AS z
        FROM z WHERE v > 0 AND abs(round((n - m) / sqrt(v), 6)) > 2"""),
      (s, d) => anomalyScores(ev(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n")))),

    // Hour-of-day seasonality profile — the ops-dashboard rollup: per
    // (event_type, hour-of-day), event count and its exact micro-unit
    // share of the type's total (when does each activity peak). One
    // scan + a 24 x |types| aggregate; shares divide exact integers.
    GQ("e18_hourly_profile",
      Some("""WITH h AS (SELECT event_type,
                 CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
                 COUNT(*) AS n
               FROM events GROUP BY 1, 2),
        t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot
              FROM h GROUP BY 1)
        SELECT event_type, hod, n,
               CAST(n * 1000000 // tot AS DOUBLE) / 1e6 AS share
        FROM h JOIN t USING (event_type)"""),
      (s, d) => {
        val h = ev(s, d).groupBy(col("event_type"),
            hour(col("ts")).cast(IntegerType).as("hod"))
          .agg(count(lit(1)).as("n"))
        val t = h.groupBy("event_type").agg(sum("n").as("tot"))
        h.join(broadcast(t), "event_type")
          .select(col("event_type"), col("hod"), col("n"),
            (expr("(n * 1000000) div tot").cast(DoubleType) / 1e6)
              .as("share"))
      }),

    // Per-type inter-event gap percentiles — the activity-cadence
    // profile (how often does a user view vs purchase): gaps between a
    // user's consecutive events of each type, exact interpolated
    // p50/p95 per type (the q28 percentile contract). The lag() window
    // keys on (user_id, event_type) — bounded per-task by one user's
    // stream, never a global per-type sort; the percentiles run through
    // the count-by-value rollup (Percentiles) so per-type state is
    // bounded by the gap-micros domain, not the row count. Gap micros
    // are exact integers < 2^53, so the interpolation inputs are
    // bit-identical; emission rounds 6dp.
    GQ("e17_interevent_gaps",
      Some("""WITH g AS (SELECT event_type,
                 epoch_us(ts) - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id)) AS gap_us
               FROM events)
        SELECT event_type, COUNT(gap_us) AS n_gaps,
               round(quantile_cont(gap_us / 1000000.0, 0.5), 6) AS p50_s,
               round(quantile_cont(gap_us / 1000000.0, 0.95), 6) AS p95_s
        FROM g WHERE gap_us IS NOT NULL GROUP BY event_type"""),
      (s, d) => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts"), col("event_id"))
        val g = ev(s, d).select(col("event_type"),
          (unix_micros(col("ts"))
            - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
        val cnt = g.filter(col("gap_us").isNotNull)
          .groupBy("event_type", "gap_us").agg(count(lit(1)).as("c"))
          .select(col("event_type"),
            (col("gap_us").cast(DoubleType) / 1000000.0).as("gap_s"), col("c"))
        Percentiles.percentilesFromCounts(cnt, Seq("event_type"), "gap_s", "c",
            Seq(0.5 -> "p50", 0.95 -> "p95"))
          .select(col("event_type"), col("n_rows").as("n_gaps"),
            round(col("p50"), 6).as("p50_s"),
            round(col("p95"), 6).as("p95_s"))
      }),

    // Funnel summary — the deliverable on top of e12's per-user steps:
    // users reached per stage and the stage-over-stage conversion rate
    // in exact integer micro-units (floor div, zero-guarded — no float
    // rounding). One extra single-row aggregate over e12's output,
    // exploded to the 3-row report.
    GQ("e16_funnel_rates",
      Some("""WITH t1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                 WHERE event_type = 'view' GROUP BY 1),
          t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
                 JOIN t1 USING (user_id)
                 WHERE e.event_type = 'click' AND e.ts > t1.t1
                   AND e.ts <= t1.t1 + INTERVAL 24 HOUR GROUP BY 1),
          t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
                 JOIN t1 USING (user_id) JOIN t2 USING (user_id)
                 WHERE e.event_type = 'purchase' AND e.ts > t2.t2
                   AND e.ts <= t1.t1 + INTERVAL 24 HOUR GROUP BY 1),
          base AS (SELECT u.user_id,
                 CASE WHEN t3.t3 IS NOT NULL THEN 3
                      WHEN t2.t2 IS NOT NULL THEN 2
                      WHEN t1.t1 IS NOT NULL THEN 1
                      ELSE 0 END AS s
               FROM (SELECT DISTINCT user_id FROM events) u
               LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
               LEFT JOIN t3 USING (user_id)),
          agg AS (SELECT COUNT(*) AS n0,
                 CAST(SUM(CASE WHEN s >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN s >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                 CAST(SUM(CASE WHEN s >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
               FROM base)
        SELECT step, reached,
               CASE WHEN prev = 0 THEN CAST(0 AS DOUBLE)
                    ELSE CAST(reached * 1000000 // prev AS DOUBLE) / 1e6
               END AS conv_rate
        FROM (SELECT 1 AS step, n1 AS reached, n0 AS prev FROM agg
              UNION ALL SELECT 2, n2, n1 FROM agg
              UNION ALL SELECT 3, n3, n2 FROM agg)"""),
      (s, d) => {
        val a = funnelSteps(ev(s, d)).agg(
          count(lit(1)).as("n0"),
          sum(when(col("funnel_step") >= 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("funnel_step") >= 2, 1L).otherwise(0L)).as("n2"),
          sum(when(col("funnel_step") >= 3, 1L).otherwise(0L)).as("n3"))
        a.select(explode(array(
            struct(lit(1).as("step"), col("n1").as("reached"), col("n0").as("prev")),
            struct(lit(2).as("step"), col("n2").as("reached"), col("n1").as("prev")),
            struct(lit(3).as("step"), col("n3").as("reached"), col("n2").as("prev"))))
            .as("r"))
          .select(col("r.step").as("step"), col("r.reached").as("reached"),
            when(col("r.prev") === 0, lit(0.0))
              .otherwise(expr("(r.reached * 1000000) div r.prev")
                .cast(DoubleType) / 1e6).as("conv_rate"))
      }),

    // First-order Markov transition matrix over each user's event
    // sequence (the session-path-mining primitive): src -> next event
    // type via lead() on the (ts, event_id)-total order, then counts
    // and per-src transition probabilities. Probabilities are exact
    // integer micro-units (cnt*1e6 div tot — both engines' floor
    // division on exact BIGINTs), so no float round sits in the output
    // (the g01/g02 fixed-point rule; a plain round(cnt/tot, 6) is the
    // textbook halfway-tie hazard).
    //
    // 100 TB shape: one shuffle keys on user_id for the lead() window
    // (per-task memory bounded by a single user's history); the
    // (src, dst) count aggregate partial-aggregates to at most
    // |event_types|^2 rows — the matrix is vocabulary-sized, never
    // corpus-sized.
    GQ("e15_event_transitions",
      Some("""WITH seq AS (SELECT user_id, event_type AS src,
                 LEAD(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS dst
               FROM events),
          c AS (SELECT src, dst, COUNT(*) AS cnt FROM seq
                WHERE dst IS NOT NULL GROUP BY 1, 2),
          t AS (SELECT src, SUM(cnt) AS tot FROM c GROUP BY 1)
        SELECT src, dst, cnt,
               CAST(cnt * 1000000 // tot AS DOUBLE) / 1e6 AS prob
        FROM c JOIN t USING (src)"""),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val seq = ev(s, d).select(col("user_id"),
          col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        val c = seq.filter(col("dst").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
        val t = c.groupBy("src").agg(sum("cnt").as("tot"))
        c.join(broadcast(t), "src")
          .select(col("src"), col("dst"), col("cnt"),
            (expr("(cnt * 1000000) div tot").cast(DoubleType) / 1e6).as("prob"))
      }),

    // Seasonality-adjusted anomaly — e14's complement: e14 scores an
    // hour against its trailing 24 observed hours (level shifts), this
    // scores it against the SAME hour-of-day across all days (a spike
    // at 3am is anomalous even if yesterday 3pm was bigger). Baseline
    // mean/variance per (type, hour-of-day) derive from EXACT integer
    // sums (the e14 contract: n, n*n aggregated as integers; the one
    // double expression is written identically on both engines; sqrt is
    // correctly rounded — memory: pow is not). Scale: the hourly
    // rollup is the only event-scan shuffle; the 24 x |types| baseline
    // broadcasts back over the tiny rollup.
    GQ("e19_seasonal_anomaly",
      Some("""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                 COUNT(*) AS n FROM events GROUP BY 1, 2),
          b AS (SELECT event_type, CAST(EXTRACT(hour FROM hr) AS INT) AS hod,
                  CAST(SUM(n) AS BIGINT) AS s,
                  CAST(SUM(n * n) AS BIGINT) AS ssq,
                  COUNT(*) AS c
                FROM h GROUP BY 1, 2),
          z AS (SELECT h.event_type, h.hr, h.n,
                  (CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / c)
                    / (c - 1) AS v,
                  CAST(s AS DOUBLE) / c AS m
                FROM h JOIN b ON h.event_type = b.event_type
                  AND CAST(EXTRACT(hour FROM h.hr) AS INT) = b.hod
                WHERE c >= 10)
        SELECT event_type, hr, n, round((n - m) / sqrt(v), 6) AS z
        FROM z WHERE v > 0 AND abs(round((n - m) / sqrt(v), 6)) > 2"""),
      (s, d) => seasonalScores(ev(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n")))),

    // Rolling 7-day active users + DAU/WAU stickiness — the product
    // health metric. An exact trailing-window COUNT DISTINCT needs no
    // range join (which would plan as a BroadcastNestedLoopJoin): each
    // (day, user) activity row is EXPLODED to the 7 target days it
    // makes the user active in, and WAU is a plain distinct count per
    // target day — an equi-shuffle a 1000-executor cluster runs at any
    // scale, 7x the (day, user) volume by construction (the window
    // length, not the data, is the multiplier). Stickiness divides
    // exact integers in micro-units. The oracle states the same
    // semantics as the naive range join.
    GQ("e20_dau_wau",
      Some("""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                 FROM events),
          dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY 1),
          wau AS (SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
                  FROM (SELECT DISTINCT day FROM du) d
                  JOIN du u ON u.day <= d.day AND u.day >= d.day - 6
                  GROUP BY 1)
        SELECT day, dau, wau,
               CAST(dau * 1000000 // wau AS DOUBLE) / 1e6 AS stickiness
        FROM dau JOIN wau USING (day)"""),
      (s, d) => {
        val du = ev(s, d)
          .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
        val wau = du
          .select(explode(expr("sequence(day, date_add(day, 6))")).as("day"),
            col("user_id"))
          .groupBy("day").agg(count_distinct(col("user_id")).as("wau"))
        dau.join(wau, "day")
          .select(col("day"), col("dau"), col("wau"),
            (expr("(dau * 1000000) div wau").cast(DoubleType) / 1e6)
              .as("stickiness"))
      }),

    // Session-shape profile — the engagement rollup on top of e02:
    // sessions bucketed by event count, with exact interpolated
    // duration percentiles (the e17 contract: duration micros are
    // exact integers, the /1e6 division and round(...,6) are written
    // identically on both engines) and mean events in exact micro-
    // units. The percentile aggregate reduces 4 buckets — after the
    // e02 session rollup nothing here scales with raw event volume.
    GQ("e21_session_stats",
      Some(s"""WITH x AS (
          SELECT user_id, event_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                 THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        y AS (SELECT *, CAST(SUM(is_new) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess FROM x),
        sessions AS (SELECT user_id, sess, COUNT(*) AS n_events,
                epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
              FROM y GROUP BY 1, 2)
        SELECT CASE WHEN n_events = 1 THEN 'single'
                    WHEN n_events = 2 THEN 'double'
                    ELSE 'multi' END AS bucket,
               COUNT(*) AS n_sessions,
               round(quantile_cont(dur_us / 1000000.0, 0.5), 6) AS p50_dur_s,
               round(quantile_cont(dur_us / 1000000.0, 0.95), 6) AS p95_dur_s,
               CAST(SUM(n_events) * 1000000 // COUNT(*) AS DOUBLE) / 1e6
                 AS mean_events
        FROM sessions GROUP BY 1"""),
      (s, d) => {
        val sess = sessionize(ev(s, d)).select(
          when(col("n_events") === 1, "single")
            .when(col("n_events") === 2, "double")
            .otherwise("multi").as("bucket"),
          (unix_micros(col("t_end")) - unix_micros(col("t_start")))
            .as("dur_us"),
          col("n_events"))
        // one (bucket, dur_us) rollup feeds both the percentiles and the
        // per-bucket totals — per-bucket state bounded by the duration
        // domain, and the rollup exchange is shared by both consumers
        val cnt = sess.groupBy("bucket", "dur_us")
          .agg(count(lit(1)).as("c"), sum("n_events").as("se_part"))
        Percentiles.percentilesFromCounts(
            cnt.select(col("bucket"),
              (col("dur_us").cast(DoubleType) / 1000000.0).as("dur_s"),
              col("c"), col("se_part")),
            Seq("bucket"), "dur_s", "c", Seq(0.5 -> "p50", 0.95 -> "p95"),
            Seq(sum("c").as("n_sessions"), sum("se_part").as("se")))
          .select(col("bucket"), col("n_sessions"),
            round(col("p50"), 6).as("p50_dur_s"),
            round(col("p95"), 6).as("p95_dur_s"),
            (expr("(se * 1000000) div n_sessions").cast(DoubleType) / 1e6)
              .as("mean_events"))
      }),

    // Event-type co-occurrence lift — which activities the same users
    // do (basket analysis on behavior): for each type pair,
    // lift = P(a,b) / (P(a)P(b)) over users, in exact integer
    // micro-units (floor div). The user self-join fans out at most
    // |types|^2 rows per user — a constant, never a skew risk. The
    // n_both*n_users*1e6 numerator stays under 2^63 while
    // users < ~3e6; beyond that the division moves into DECIMAL(38)
    // with the same floor semantics.
    GQ("e22_type_cooccurrence",
      Some("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
          nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
          na AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
          pr AS (SELECT a.event_type AS ta, b.event_type AS tb,
                   COUNT(*) AS n_both
                 FROM ut a JOIN ut b ON a.user_id = b.user_id
                   AND a.event_type < b.event_type
                 GROUP BY 1, 2)
        SELECT ta, tb, n_both,
               CAST(n_both * n_users * 1000000 // (x.n * y.n) AS DOUBLE) / 1e6
                 AS lift
        FROM pr JOIN na x ON ta = x.event_type
        JOIN na y ON tb = y.event_type CROSS JOIN nu"""),
      (s, d) => {
        val ut = ev(s, d).select(col("user_id"), col("event_type")).distinct()
        val nu = ut.agg(count_distinct(col("user_id")).as("n_users"))
        val na = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
        val pr = ut.as("a").join(ut.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
          .agg(count(lit(1)).as("n_both"))
        pr.join(broadcast(na.select(col("event_type").as("ta"),
            col("n").as("na_n"))), "ta")
          .join(broadcast(na.select(col("event_type").as("tb"),
            col("n").as("nb_n"))), "tb")
          .crossJoin(broadcast(nu))
          .select(col("ta"), col("tb"), col("n_both"),
            (expr("(n_both * n_users * 1000000) div (na_n * nb_n)")
              .cast(DoubleType) / 1e6).as("lift"))
      }),

    // Activity concentration — how much of the event stream the top 1%
    // of users generate (the bot/whale audit every usage pipeline
    // needs). The p99 threshold is a DATA value (percentile_disc, the
    // q54 contract — no interpolation, no rounding), membership is an
    // integer comparison, and the share divides exact integers. Rank-
    // free by design: "users at or above the p99 count" needs no
    // global sort, just one per-user rollup + one broadcast scalar.
    GQ("e24_user_concentration",
      Some("""WITH uc AS (SELECT user_id, COUNT(*) AS c FROM events
                 GROUP BY 1),
          th AS (SELECT percentile_disc(0.99) WITHIN GROUP (ORDER BY c)
                   AS p99c,
                 COUNT(*) AS n_users, CAST(SUM(c) AS BIGINT) AS n_events
                 FROM uc)
        SELECT n_users, n_events, p99c,
               CAST(COUNT(*) AS BIGINT) AS top_users,
               CAST(SUM(c) AS BIGINT) AS top_events,
               CAST(SUM(c) * 1000000 // n_events AS DOUBLE) / 1e6
                 AS top_share
        FROM uc CROSS JOIN th WHERE c >= p99c
        GROUP BY n_users, n_events, p99c"""),
      (s, d) => {
        val uc = ev(s, d).groupBy("user_id").agg(count(lit(1)).as("c"))
        // the p99 threshold runs the count-by-value rollup (state
        // bounded by the distinct per-user-count domain); the disc
        // percentile IS a data value (a long count) — the rollup emits
        // double like the aggregate did, cast back. n_users is the
        // rollup's total weight; n_events recovers as sum(v*c).
        val cc = uc.groupBy(col("c").as("v")).agg(count(lit(1)).as("cn"))
        val th = Percentiles.percentileDiscFromCounts(cc, Seq.empty,
            "v", "cn", Seq(0.99 -> "p99d"),
            Seq(sum(col("v") * col("cn")).cast(LongType).as("n_events")))
          .select(col("p99d").cast(LongType).as("p99c"),
            col("n_rows").as("n_users"), col("n_events"))
        uc.crossJoin(broadcast(th)).filter(col("c") >= col("p99c"))
          .groupBy("n_users", "n_events", "p99c")
          .agg(count(lit(1)).as("top_users"),
            sum("c").cast(LongType).as("top_events"))
          .select(col("n_users"), col("n_events"), col("p99c"),
            col("top_users"), col("top_events"),
            (expr("(top_events * 1000000) div n_events").cast(DoubleType)
              / 1e6).as("top_share"))
      }),

    // Time-to-convert distribution — the latency companion to e12/e16's
    // funnel counts: for users whose first purchase follows their first
    // view, hours from view to purchase, profiled with exact
    // interpolated percentiles (the e17 contract: integer micros,
    // identical /3.6e9 division and round on both sides). Two
    // user-keyed min-aggregations; the percentiles run through the
    // count-by-value rollup (Percentiles), state bounded by the
    // distinct-latency domain (<= one row per converted user).
    GQ("e25_time_to_convert",
      Some("""WITH v AS (SELECT user_id, MIN(ts) AS t0 FROM events
                 WHERE event_type = 'view' GROUP BY 1),
          p AS (SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'purchase' GROUP BY 1),
          g AS (SELECT epoch_us(t1) - epoch_us(t0) AS lat_us
                FROM v JOIN p USING (user_id) WHERE t1 > t0)
        SELECT COUNT(*) AS n_converts,
               round(quantile_cont(lat_us / 3600000000.0, 0.5), 6) AS p50_hours,
               round(quantile_cont(lat_us / 3600000000.0, 0.9), 6) AS p90_hours
        FROM g"""),
      (s, d) => {
        val v = ev(s, d).filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("t0"))
        val p = ev(s, d).filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(min(col("ts")).as("t1"))
        val cnt = v.join(p, "user_id").filter(col("t1") > col("t0"))
          .groupBy((unix_micros(col("t1")) - unix_micros(col("t0")))
            .as("lat_us"))
          .agg(count(lit(1)).as("c"))
          .select((col("lat_us").cast(DoubleType) / 3600000000.0).as("lat_h"),
            col("c"))
        Percentiles.percentilesFromCounts(cnt, Seq.empty, "lat_h", "c",
            Seq(0.5 -> "p50", 0.9 -> "p90"))
          // keyless agg over an EMPTY rollup yields one all-null row;
          // the oracle's COUNT(*) (and the old collecting form) say 0
          .select(coalesce(col("n_rows"), lit(0L)).as("n_converts"),
            round(col("p50"), 6).as("p50_hours"),
            round(col("p90"), 6).as("p90_hours"))
      }),

    // Weekly active users with week-over-week growth — e20's coarser
    // companion (the reporting cadence): distinct users per ISO week
    // plus the WoW delta in exact micro-units (lag over the tiny weeks
    // rollup; zero-guarded floor div). date_trunc('week') is Monday-
    // anchored on both engines.
    GQ("e26_wau_trend",
      Some("""WITH w AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
                 COUNT(DISTINCT user_id) AS wau
               FROM events GROUP BY 1)
        SELECT wk, wau,
               CASE WHEN lag(wau) OVER (ORDER BY wk) IS NULL THEN NULL
                 ELSE CAST((wau - lag(wau) OVER (ORDER BY wk)) * 1000000
                   // lag(wau) OVER (ORDER BY wk) AS DOUBLE) / 1e6
               END AS wow_growth
        FROM w"""),
      (s, d) => {
        val w = ev(s, d)
          .groupBy(date_trunc("week", col("ts")).cast(DateType).as("wk"))
          .agg(count_distinct(col("user_id")).as("wau"))
        val prev = lag(col("wau"), 1).over(Window.orderBy("wk"))
        w.select(col("wk"), col("wau"),
          when(prev.isNull, lit(null).cast(DoubleType))
            .otherwise(expr(
              "CAST(((wau - lag(wau) OVER (ORDER BY wk)) * 1000000) div " +
              "lag(wau) OVER (ORDER BY wk) AS DOUBLE) / 1e6"))
            .as("wow_growth"))
      }),

    // Weekly behavior drift — L1 distance between each week's
    // event-type mix and the global mix, all in integer micro-units
    // (the t39 vocabulary-divergence pattern on the time axis). A week
    // whose mix jumps is a product change, an outage, or a bot wave.
    // The dense week x type matrix is |weeks| x |types| — constants —
    // and everything downstream of the one rollup shuffle is tiny.
    GQ("e27_weekly_drift",
      Some("""WITH wt AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
                 event_type, COUNT(*) AS n FROM events GROUP BY 1, 2),
          wtot AS (SELECT wk, CAST(SUM(n) AS BIGINT) AS tot FROM wt GROUP BY 1),
          g AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS gn FROM wt GROUP BY 1),
          gtot AS (SELECT CAST(SUM(gn) AS BIGINT) AS gt FROM g),
          p AS (SELECT wk, event_type, n * 1000000 // tot AS pm
                FROM wt JOIN wtot USING (wk)),
          q AS (SELECT event_type, gn * 1000000 // gt AS qm
                FROM g CROSS JOIN gtot),
          m AS (SELECT w.wk, q.event_type, q.qm, COALESCE(p.pm, 0) AS pm
                FROM (SELECT DISTINCT wk FROM wt) w CROSS JOIN q
                LEFT JOIN p ON p.wk = w.wk AND p.event_type = q.event_type)
        SELECT wk, CAST(SUM(abs(pm - qm)) AS BIGINT) AS l1_micros
        FROM m GROUP BY 1"""),
      (s, d) => {
        val wt = ev(s, d)
          .groupBy(date_trunc("week", col("ts")).cast(DateType).as("wk"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val wtot = wt.groupBy("wk").agg(sum("n").cast(LongType).as("tot"))
        val g = wt.groupBy("event_type").agg(sum("n").cast(LongType).as("gn"))
        val gtot = g.agg(sum("gn").cast(LongType).as("gt"))
        val p = wt.join(broadcast(wtot), "wk")
          .select(col("wk"), col("event_type"), expr("(n * 1000000) div tot").as("pm"))
        val q = g.crossJoin(broadcast(gtot))
          .select(col("event_type"), expr("(gn * 1000000) div gt").as("qm"))
        val m = wt.select("wk").distinct().crossJoin(broadcast(q))
          .join(p, Seq("wk", "event_type"), "left")
          .select(col("wk"), col("qm"), coalesce(col("pm"), lit(0L)).as("pm"))
        m.groupBy("wk")
          .agg(sum(abs(col("pm") - col("qm"))).cast(LongType).as("l1_micros"))
      }),

    // Last-touch revenue attribution — every purchase's value credited
    // to the user's immediately-preceding NON-purchase event type (the
    // marketing-analytics classic; 'direct' when a purchase has no
    // prior touch). The carry-forward is last_value IGNORE NULLS over
    // ROWS UNBOUNDED PRECEDING..1 PRECEDING — one window partitioned
    // by user (per-user event counts are bounded; the e02 sessionize
    // argument), ordered by (ts, event_id) so equal timestamps cannot
    // reorder between engines. Revenue sums via dsum (the e01
    // discipline: decimal-exact, partition-order independent).
    GQ("e28_attribution",
      Some(s"""WITH t AS (SELECT user_id, ts, event_id, event_type, value,
                 last_value(CASE WHEN event_type <> 'purchase'
                     THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS touch
               FROM events)
        SELECT COALESCE(touch, 'direct') AS touch,
               CAST(COUNT(*) AS INT) AS n_purchases,
               ${osum("value")} AS attributed_value
        FROM t WHERE event_type = 'purchase'
        GROUP BY 1"""),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        ev(s, d)
          .withColumn("touch",
            last(when(col("event_type") =!= "purchase", col("event_type")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("touch"), lit("direct")).as("touch"))
          .agg(count(lit(1)).cast(IntegerType).as("n_purchases"),
            dsum(col("value")).as("attributed_value"))
      }),

    // Behavioral predictability — per event type, the Shannon entropy
    // of its NEXT-event distribution (e15's transition matrix read as
    // a randomness meter: 0 = deterministic flows like signup->view,
    // ln(5) = anything can follow). Low-entropy types are automatable
    // funnels; a type whose entropy jumps between datasets signals a
    // logging change. Per-term -p*ln(p) pre-rounds to 6dp into a
    // decimal sum (the t41 discipline; ln of a rational is irrational,
    // no halfway ties). Everything downstream of the |types|^2 rollup
    // is constant-size.
    GQ("e29_transition_entropy",
      Some(s"""WITH seq AS (SELECT event_type AS src,
                 LEAD(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS dst
               FROM events),
          c AS (SELECT src, dst, COUNT(*) AS cnt FROM seq
                WHERE dst IS NOT NULL GROUP BY 1, 2),
          t AS (SELECT src, CAST(SUM(cnt) AS BIGINT) AS tot FROM c GROUP BY 1)
        SELECT src, CAST(COUNT(*) AS INT) AS n_dst,
               ${osum("round(-(CAST(cnt AS DOUBLE) / tot) * ln(CAST(cnt AS DOUBLE) / tot), 6)")}
                 AS next_entropy
        FROM c JOIN t USING (src) GROUP BY src"""),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val c = ev(s, d)
          .select(col("event_type").as("src"),
            lead(col("event_type"), 1).over(w).as("dst"))
          .filter(col("dst").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
        val t = c.groupBy("src").agg(sum("cnt").cast(LongType).as("tot"))
        val p = col("cnt").cast(DoubleType) / col("tot")
        c.join(broadcast(t), "src")
          .groupBy("src")
          .agg(count(lit(1)).cast(IntegerType).as("n_dst"),
            dsum(round(-p * log(p), 6)).as("next_entropy"))
      }),

    // RFM segmentation — recency/frequency/monetary quartiles per
    // purchasing user, the standard customer-value grid. Deliberately
    // NOT a global ntile(): three whole-table ntile windows would each
    // sort every user in ONE task (the s01/t21 scale-killer). Instead
    // exact quartile BOUNDARIES (percentile_disc over the per-user
    // rollup — integer-valued, engine-exact) broadcast back, and each
    // user's quartile is a pure integer comparison count: fully
    // distributed, no total order anywhere. Monetary uses exact cents
    // (round(value*100): 2dp doubles sit within an ulp of an integer,
    // never near a .5 tie). Quartile 1 = best (most recent / most
    // frequent / highest spend).
    GQ("e30_rfm_segments",
      Some("""WITH p AS (SELECT user_id, MAX(CAST(ts AS DATE)) AS last_d,
                 CAST(COUNT(*) AS BIGINT) AS freq,
                 CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
               FROM events WHERE event_type = 'purchase' GROUP BY 1),
          mx AS (SELECT MAX(last_d) AS mx FROM p),
          s AS (SELECT user_id, CAST(mx - last_d AS INT) AS rec_days,
                       freq, cents FROM p CROSS JOIN mx),
          b AS (SELECT
              percentile_disc(0.25) WITHIN GROUP (ORDER BY rec_days) AS r1,
              percentile_disc(0.50) WITHIN GROUP (ORDER BY rec_days) AS r2,
              percentile_disc(0.75) WITHIN GROUP (ORDER BY rec_days) AS r3,
              percentile_disc(0.25) WITHIN GROUP (ORDER BY freq) AS f1,
              percentile_disc(0.50) WITHIN GROUP (ORDER BY freq) AS f2,
              percentile_disc(0.75) WITHIN GROUP (ORDER BY freq) AS f3,
              percentile_disc(0.25) WITHIN GROUP (ORDER BY cents) AS m1,
              percentile_disc(0.50) WITHIN GROUP (ORDER BY cents) AS m2,
              percentile_disc(0.75) WITHIN GROUP (ORDER BY cents) AS m3
            FROM s)
        SELECT user_id, rec_days, freq,
               CAST(cents AS DOUBLE) / 100 AS monetary,
               CAST(1 + (CASE WHEN rec_days > r1 THEN 1 ELSE 0 END)
                      + (CASE WHEN rec_days > r2 THEN 1 ELSE 0 END)
                      + (CASE WHEN rec_days > r3 THEN 1 ELSE 0 END) AS INT)
                 AS r_q,
               CAST(1 + (CASE WHEN freq < f3 THEN 1 ELSE 0 END)
                      + (CASE WHEN freq < f2 THEN 1 ELSE 0 END)
                      + (CASE WHEN freq < f1 THEN 1 ELSE 0 END) AS INT)
                 AS f_q,
               CAST(1 + (CASE WHEN cents < m3 THEN 1 ELSE 0 END)
                      + (CASE WHEN cents < m2 THEN 1 ELSE 0 END)
                      + (CASE WHEN cents < m1 THEN 1 ELSE 0 END) AS INT)
                 AS m_q
        FROM s CROSS JOIN b"""),
      (s, d) => {
        val p = ev(s, d).filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(max(col("ts").cast(DateType)).as("last_d"),
            count(lit(1)).as("freq"),
            sum(expr("CAST(round(value * 100) AS BIGINT)")).cast(LongType)
              .as("cents"))
        val mx = p.agg(max("last_d").as("mx"))
        val sdf = p.crossJoin(broadcast(mx))
          .select(col("user_id"),
            datediff(col("mx"), col("last_d")).cast(IntegerType).as("rec_days"),
            col("freq"), col("cents"))
        // all nine quartile boundaries from ONE (metric, value) rollup
        // pass over the per-user frame (state bounded by the metric
        // value domains; one scan, one exchange — three separate
        // rollups would re-derive the purchase aggregation each time),
        // pivoted to the 1-row broadcast scalar the quartile
        // comparisons consume
        val mv = sdf.select(explode(array(
            struct(lit("r").as("mk"), col("rec_days").cast(LongType).as("v")),
            struct(lit("f").as("mk"), col("freq").as("v")),
            struct(lit("m").as("mk"), col("cents").as("v")))).as("x"))
          .select(col("x.mk").as("mk"), col("x.v").as("v"))
          .groupBy("mk", "v").agg(count(lit(1)).as("cn"))
        val qs = Percentiles.percentileDiscFromCounts(mv, Seq("mk"),
          "v", "cn", Seq(0.25 -> "q1", 0.50 -> "q2", 0.75 -> "q3"))
        def pick(mk: String, q: String, as: String) =
          max(when(col("mk") === mk, col(q))).as(as)
        val b = qs.groupBy().agg(
          pick("r", "q1", "r1"), pick("r", "q2", "r2"), pick("r", "q3", "r3"),
          pick("f", "q1", "f1"), pick("f", "q2", "f2"), pick("f", "q3", "f3"),
          pick("m", "q1", "m1"), pick("m", "q2", "m2"), pick("m", "q3", "m3"))
        sdf.crossJoin(broadcast(b))
          .select(col("user_id"), col("rec_days"), col("freq"),
            (col("cents").cast(DoubleType) / 100).as("monetary"),
            expr("CAST(1 + (CASE WHEN rec_days > r1 THEN 1 ELSE 0 END)" +
              " + (CASE WHEN rec_days > r2 THEN 1 ELSE 0 END)" +
              " + (CASE WHEN rec_days > r3 THEN 1 ELSE 0 END) AS INT)").as("r_q"),
            expr("CAST(1 + (CASE WHEN freq < f3 THEN 1 ELSE 0 END)" +
              " + (CASE WHEN freq < f2 THEN 1 ELSE 0 END)" +
              " + (CASE WHEN freq < f1 THEN 1 ELSE 0 END) AS INT)").as("f_q"),
            expr("CAST(1 + (CASE WHEN cents < m3 THEN 1 ELSE 0 END)" +
              " + (CASE WHEN cents < m2 THEN 1 ELSE 0 END)" +
              " + (CASE WHEN cents < m1 THEN 1 ELSE 0 END) AS INT)").as("m_q"))
      }),

    // Weekly-periodicity strength: lag-7 Pearson autocorrelation of the
    // DAILY event-count series, per event type. The event scan collapses
    // to one tiny (type, day) rollup — the only fact-table shuffle — and
    // the lagged pairing is an equi-join of that rollup with itself
    // shifted 7 days (rollup-sized, broadcastable; NOT a window over the
    // raw events). All Pearson moments are exact BIGINT sums of daily
    // counts (n·Σxy etc. stay well under 2^53 here; at 100 TB the same
    // moments would widen through DECIMAL like q55), so the only doubles
    // are the final sqrt/divide on identical integers — bit-identical
    // across engines, then pinned at 6dp.
    GQ("e31_weekly_autocorr",
      Some("""WITH dly AS (SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
          pair AS (SELECT a.event_type, a.n AS x, b.n AS y
                   FROM dly a JOIN dly b ON a.event_type = b.event_type
                                        AND b.d = a.d + INTERVAL 7 DAY),
          m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                  CAST(SUM(x * y) AS BIGINT) AS sxy,
                  CAST(SUM(x * x) AS BIGINT) AS sxx,
                  CAST(SUM(y * y) AS BIGINT) AS syy
                FROM pair GROUP BY 1)
        SELECT event_type, n AS n_pairs,
               round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS autocorr7
        FROM m
        WHERE n > 1 AND n * sxx > sx * sx AND n * syy > sy * sy"""),
      (s, d) => {
        val dly = ev(s, d)
          .groupBy(col("event_type"), col("ts").cast(DateType).as("d"))
          .agg(count(lit(1)).as("n"))
        val a = dly.toDF("event_type", "d", "x")
        val b = dly.toDF("event_type2", "d2", "y")
        val m = a.join(b, col("event_type") === col("event_type2") &&
            col("d2") === date_add(col("d"), 7))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
        m.filter(col("n") > 1 &&
            col("n") * col("sxx") > col("sx") * col("sx") &&
            col("n") * col("syy") > col("sy") * col("sy"))
          .select(col("event_type"), col("n").as("n_pairs"),
            round((col("n").cast(DoubleType) * col("sxy") -
                col("sx").cast(DoubleType) * col("sy")) /
              (sqrt(col("n").cast(DoubleType) * col("sxx") -
                  col("sx").cast(DoubleType) * col("sx")) *
                sqrt(col("n").cast(DoubleType) * col("syy") -
                  col("sy").cast(DoubleType) * col("sy"))), 6)
              .as("autocorr7"))
      })
  )
}
