package graft
import org.apache.spark.sql.SparkSession

/** Driver bench contract: ONE JSON line on stdout.
  *
  * CRITICAL SIZE CONSTRAINT (cost us rounds 1 AND 2): the consumer
  * tail-captures only the LAST 2000 chars of sbt output, and the trailing
  * "[success] Total time ..." line eats ~85 of them. Any JSON line longer
  * than ~1900 chars gets its head truncated -> "parsed": null -> the whole
  * round's perf goes ungraded. So stdout carries per-query timings under
  * SHORT keys (the unique "q03"/"d05" prefix of each query name, ~13 chars
  * per entry instead of ~30), and the full-name map is written to
  * BENCH_DETAIL.json as a file instead of stdout. A final hard guard drops
  * the queries map entirely rather than ever exceeding the window.
  *
  * Round-3 postmortem ("parsed": null despite a complete line): sbt's
  * logged output strategy prefixes every forked line with "[info] " /
  * "[error] ", so the line was never bare JSON. Fixes: build.sbt sets
  * `run / outputStrategy := StdoutOutput` (stdio inherited, no prefixes),
  * log level is ERROR so no WARN noise interleaves, and the JSON line is
  * printed as the LAST output after spark.stop().
  */
object Bench {

  /** One per-query record-merge decision (BASELINE.md protocol, r13
    * verdict #2 — pinned by BenchMergeSpec): an unchanged job count
    * means the plan is the same, so host drift can only IMPROVE the
    * record — keep min(prior, new); a changed job count means the plan
    * changed, so the new timing stands whether faster or slower; no
    * prior entry takes the new timing. Errors never reach here — a
    * failing query records its error marker at the call site, so a
    * failure cannot hide behind an old record. */
  def mergeRecord(name: String, secs: Double, jobs: Int,
      priorSecs: Map[String, Double], priorJobs: Map[String, Double]): Double =
    if (priorJobs.get(name).contains(jobs.toDouble))
      priorSecs.get(name).map(math.min(_, secs)).getOrElse(secs)
    else secs

  /** Compact per-query stdout encoding (r19, pinned by BenchMergeSpec).
    *
    * At 199 queries NO name-keyed map fits the consumer's ~1900-char tail
    * window — even 3-char keys + integer-millisecond values measure 2062
    * chars against the committed BENCH_DETAIL records (199 × ("\"q03\":" 6
    * chars + ~3 digits + comma) ≈ 2000), so the pre-r19 guard dropped the
    * map on every run and the driver's per-query/scaling grading stayed
    * empty (r18 verdict item 2). The fallback encoding is the one that
    * verdict sanctions: a NAME-SORTED integer-MILLISECOND array,
    * "queries":[52,828,...], in the bench's own sorted-by-full-name
    * execution order (the same order as CORRECTNESS/BENCH_DETAIL keys),
    * failures as -1. ~870 chars at 199 queries, and robust to noisy-run
    * digit inflation (a 10× spike adds one digit, not a map drop). The
    * full-name seconds map is unchanged in BENCH_DETAIL.json. */
  def msArray(secs: Seq[Either[String, Double]]): String =
    secs.map(_.map(t => math.round(t * 1000).toString).getOrElse("-1"))
      .mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR") // keep stdout/stderr free of WARN noise
    Engine.prepare(spark)
    // Per-query Spark JOB counts ride along in BENCH_DETAIL.json: job
    // counts are a host-noise-immune regression signal (seconds drift
    // 30-40% across reboots on this shared host; a plan that suddenly
    // runs more jobs changed for real). Counted via listener; job-start
    // events are queued asynchronously, so read the counter only after
    // it has been stable for 100ms (a blocking count() has already
    // submitted every one of its jobs by the time it returns).
    val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCounter.incrementAndGet()
    })
    def settledJobCount(): Int = {
      var prev = -1; var cur = jobCounter.get(); var waited = 0
      while (cur != prev && waited < 2000) {
        prev = cur; Thread.sleep(100); waited += 100; cur = jobCounter.get()
      }
      cur
    }
    // Contention guard (r08+r09 postmortem: two rounds shipped artifacts
    // where a burst of host load inflated a contiguous window of queries
    // 40-70x with bit-identical job counts; the code was exonerated both
    // times by a same-host re-time). The prior BENCH_DETAIL.json is the
    // per-query baseline: any warm time >3x its prior entry WITH an
    // unchanged job count (same plan, so the spike cannot be the code)
    // is re-timed after the sweep and the minimum is recorded. Per-query
    // 1-min loadavg rides along in the detail so a poisoned artifact is
    // self-diagnosing even when the guard cannot fire (first run, plan
    // changes).
    def flatMap2(json: String, section: String): Map[String, Double] = {
      val sec = ("\"" + section + "\"\\s*:\\s*\\{([^}]*)\\}").r
      val pair = "\"([A-Za-z0-9_]+)\"\\s*:\\s*(-?[0-9.]+)".r
      sec.findFirstMatchIn(json).map(m =>
        pair.findAllMatchIn(m.group(1)).map(p => p.group(1) -> p.group(2).toDouble).toMap)
        .getOrElse(Map.empty)
    }
    val (priorSecs, priorJobs) =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("BENCH_DETAIL.json")), "UTF-8")
        // baseline only comparable at the same scale factor
        if ("\"sf\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(txt)
            .exists(_.group(1) == sfDir))
          (flatMap2(txt, "queries"), flatMap2(txt, "jobs"))
        else (Map.empty[String, Double], Map.empty[String, Double])
      } catch { case _: Throwable => (Map.empty[String, Double], Map.empty[String, Double]) }
    def loadavg1(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // BASELINE.md methodology: warm numbers = 2nd run in the session
    // (first run pays one-time codegen/JIT/planning, not per-query cost).
    // A failing query must NOT bench as a fast success: it records an
    // error marker instead of a timing (Right=(seconds, jobs), Left=error).
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        name: String): Either[String, (Double, Int)] = {
      // a prior invocation's ephemeral caches (topKPerQid heap frames)
      // must not flatter this run — the q69 r14 warm-cache class: the
      // warmup pass caches the SAME analyzed plan, so without a release
      // the timed pass would read the warmup's blocks instead of paying
      // the heap execution it reports
      Engine.releaseEphemeral(spark)
      val j0 = settledJobCount()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        Right((secs, settledJobCount() - j0))
      } catch { case e: Throwable => Left(e.getClass.getSimpleName) }
    }
    val firstPass: Seq[(String, Either[String, (Double, Int)], Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => }
        (name, timed(fn, name), loadavg1())
      }
    // Guard contract (r10 verdict): EVERY >3x entry is re-timed, and BOTH
    // timings are recorded in the detail ("guard" map) whether or not the
    // re-time was faster — a spike that survives its re-time is then
    // explicitly dual-recorded (with per-query loadavg) instead of being
    // indistinguishable from "guard never fired".
    var guardLog = List.empty[(String, Double, Double)] // (name, first, retime)
    val results: Seq[(String, Either[String, (Double, Int)], Double)] =
      firstPass.map {
        case (name, Right((secs, jobs)), load)
            if priorSecs.get(name).exists(p =>
              secs > 3 * p && secs - p > 0.2
                && priorJobs.get(name).contains(jobs.toDouble)) =>
          timed(SparkEntry.queries(name), name) match {
            case Right((secs2, _)) =>
              guardLog ::= ((name, secs, secs2))
              (name, Right((math.min(secs, secs2), jobs)), loadavg1())
            case _ => (name, Right((secs, jobs)), load)
          }
        case r => r
      }
    val retimed = guardLog.collect { case (n, a, b) if b < a => n }
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v)) // locale-proof decimal point
    // Short keys: everything before the first '_' ("q03_top_orders" -> "q03").
    // Unique by construction of the query naming scheme; fall back to the
    // full name on any collision so entries are never silently merged.
    val shortKeys = {
      val pref = results.map { case (k, _, _) => k -> k.takeWhile(_ != '_') }
      val counts = pref.groupBy(_._2).view.mapValues(_.size).toMap
      pref.map { case (full, p) => full -> (if (counts(p) == 1) p else full) }.toMap
    }
    // Failures surface as -1 in the numeric stdout map (keeps the consumer's
    // parse trivially numeric) and as "err:<Exception>" in the detail file.
    val qs = results.map { case (k, v, _) =>
      "\"" + shortKeys(k) + "\":" + f3(v.map(_._1).getOrElse(-1.0))
    }.mkString("{", ",", "}")
    val ok = results.collect { case (_, Right((t, _)), _) => t }
    val errs = results.collect { case (k, Left(_), _) => k }
    val total = ok.sum
    val errField = if (errs.isEmpty) "" else s""","errors":${errs.size}"""
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"$errField}"""
    // Degrade in steps, never exceed the window: full seconds map (small
    // suites) -> name-sorted integer-ms array (the 199-query reality; see
    // msArray doc) -> total only (unreachable in practice).
    val msArr = Bench.msArray(results.map { case (_, v, _) => v.map(_._1) })
    val lineArr = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$msArr,"sf":"$sfDir"$errField}"""
    val out = if (line.length <= 1800) line
      else if (lineArr.length <= 1800) lineArr
      else s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir"$errField}"""
    // Full-name per-query detail goes to a FILE (no length constraint) for
    // BASELINE.md bookkeeping and human inspection; "jobs" holds the
    // per-query job counts (the noise-immune companion to the seconds).
    val secsMap = results.map {
      case (k, Right((t, _)), _) => "\"" + k + "\":" + f3(t)
      case (k, Left(e), _) => "\"" + k + "\":\"err:" + e + "\""
    }.mkString("{", ",", "}")
    val jobsMap = results.collect {
      case (k, Right((_, j)), _) => "\"" + k + "\":" + j
    }.mkString("{", ",", "}")
    // loadavg per query + the retimed list make a contention-poisoned
    // artifact self-diagnosing: spikes with load >> cpus and unchanged
    // jobs indicate the host, not the code.
    val loadMap = results.map { case (k, _, l) =>
      "\"" + k + "\":" + f3(l)
    }.mkString("{", ",", "}")
    val retimedArr = retimed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // both timings for every guard firing — a surviving spike shows as
    // [first, retime] with both values high; recorded value is the min
    val guardMap = guardLog.sortBy(_._1).map { case (n, a, b) =>
      "\"" + n + "\":[" + f3(a) + "," + f3(b) + "]"
    }.mkString("{", ",", "}")
    // BASELINE.md record-merge (r13 verdict #2): the committed
    // BENCH_DETAIL.json is the per-query RECORD, and an unattended run on
    // a loaded host must not regress it. Per query: a job-count change
    // means the plan changed, so the new timing stands whether faster or
    // slower; an unchanged job count keeps min(record, new) — host drift
    // can only improve the record, never poison it. Errors always stand
    // (a failing query must not hide behind an old record). The raw,
    // unmerged run is written to BENCH_RAW.json (and is what stdout — and
    // so the driver's BENCH_r{N} artifact — reports).
    val mergedSecs: Seq[(String, Either[String, Double])] = results.map {
      case (k, Right((t, j)), _) =>
        k -> Right(Bench.mergeRecord(k, t, j, priorSecs, priorJobs))
      case (k, Left(e), _) => k -> Left(e)
    }
    val mergedMap = mergedSecs.map {
      case (k, Right(t)) => "\"" + k + "\":" + f3(t)
      case (k, Left(e)) => "\"" + k + "\":\"err:" + e + "\""
    }.mkString("{", ",", "}")
    val mergedTotal = mergedSecs.collect { case (_, Right(t)) => t }.sum
    def detailJson(tot: Double, qs: String) =
      "{\"total\":" + f3(tot) + ",\"sf\":\"" + sfDir +
        "\",\"queries\":" + qs + ",\"jobs\":" + jobsMap +
        ",\"load\":" + loadMap + ",\"retimed\":" + retimedArr +
        ",\"guard\":" + guardMap + "}"
    def writeFile(path: String, body: String): Unit =
      try {
        val w = new java.io.PrintWriter(path)
        try w.println(body) finally w.close()
      } catch { case _: Throwable => } // files are best-effort; stdout line is the contract
    writeFile("BENCH_DETAIL.json", detailJson(mergedTotal, mergedMap))
    writeFile("BENCH_RAW.json", detailJson(total, secsMap))
    spark.stop() // stop BEFORE printing: nothing may log after the JSON line
    println(out)
    System.out.flush()
  }
}
