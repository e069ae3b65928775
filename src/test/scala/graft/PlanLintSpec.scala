package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality linter over EVERY driver query entry: at 100 TB a
  * nested-loop or cartesian join is almost always an accident that
  * multiplies row counts (the round-3 verdict found one hiding inside
  * the IVF assignment). Any new entry that plans one fails here unless
  * it is explicitly allowlisted with a scale justification.
  */
class PlanLintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Intentionally nested-loop entries, each with a documented scale
    * story:
    *  - d06_embedding_neardup: the exact all-pairs oracle twin of d07's
    *    LSH path (declared-quadratic, VectorSearch.cosineNearDupPairs);
    *  - s01_ann_bruteforce: the exact baseline; the nested-loop side is
    *    the BROADCAST query set (|Q| << corpus), so cost stays linear
    *    in the corpus and the top-k reduction is partial-aggregated;
    *  - s06_range_search: identical shape to s01 (broadcast query set
    *    vs corpus scan) with the radius filter fused into the same
    *    stage — no heap, zero exchanges after the scan;
    *  - t13_lm_quality: the nested-loop side is ONE row (the broadcast
    *    global token total) — a constant-space scalar join;
    *  - t16_bm25: same shape — the broadcast side is the ONE-row
    *    (N, avgdl) corpus-stats aggregate;
    *  - t17_tfidf_keywords: same shape — the broadcast side is the
    *    ONE-row corpus document count feeding the idf term;
    *  - t18_dsir_weights: same shape — the broadcast side is the
    *    ONE-row (tr, b, tt) smoothing-constant aggregate.
    */
  private val allowNestedLoop =
    Set("d06_embedding_neardup", "s01_ann_bruteforce", "s06_range_search",
      "t13_lm_quality", "t16_bm25", "t17_tfidf_keywords", "t18_dsir_weights",
      "t22_bigram_lm", // t22: broadcast side is the ONE-row vocab count
      "t23_temperature_mix", // t23: ONE-row total + normalizer scalars
      // s07: inherits s01's broadcast-query-set arm (ONE query row) and
      // t16's one-row-stats arm; the fusion join itself is k-vs-k rows
      "s07_hybrid_rrf",
      // t28: broadcast sides are the |classes|-row model-constant table
      // and one-row corpus scalars — class count is a label-vocabulary
      // property, never corpus size
      "t28_nb_lang_classifier",
      // s09: the neighbor arm is s01's broadcast-query-set brute force
      // (|Q| << corpus, linear corpus cost); at scale it swaps for any
      // ANN arm since voting consumes only (qid, neighbor label)
      "s09_knn_classifier",
      // t32: t28's scoring plan (same |classes|-row + one-row
      // broadcasts) consumed twice for the top-2 pick
      "t32_nb_margin",
      // t33: the broadcast side is the ONE-row split-total aggregate
      "t33_split_drift",
      // s10: d06's declared-quadratic all-pairs twin (exact purity
      // audit); the scale path substitutes an ANN arm — purity
      // consumes only (qid, neighbor label) pairs
      "s10_label_purity",
      // e22: the broadcast side is the ONE-row user-count aggregate
      "e22_type_cooccurrence",
      // t37: the broadcast side is the ONE-row corpus-size aggregate
      "t37_term_burstiness",
      // e24: the broadcast side is the ONE-row threshold aggregate
      "e24_user_concentration",
      // s11: d06's declared-quadratic twin (class-mean audit); the
      // scale path samples pairs per label
      "s11_label_separation",
      // q64: the broadcast side is the ONE-row divisor-count scalar
      "q64_relational_division",
      // t39: the cross product is |sources| x top-50 — both constants,
      // a bounded dense matrix by construction
      "t39_vocab_divergence",
      // e27: t39's shape on the time axis — |weeks| x |types| dense
      // matrix plus a ONE-row global-total scalar
      "e27_weekly_drift",
      // e30: both broadcast sides are ONE-row scalars (the global
      // max-date anchor; the 9 exact quartile boundaries) — the
      // boundary-broadcast design exists precisely to AVOID the
      // global-ntile single-task sort
      "e30_rfm_segments",
      // t43: the broadcast side is the ONE-row corpus document count
      // feeding the PMI denominator
      "t43_pmi_collocations",
      // g08: each HITS half-step broadcasts the ONE-row per-round max
      // used by the integer normalization
      "g08_hits",
      // s13: candidate generation is s01's broadcast-query-set arm;
      // the greedy loop joins only kCand-row-per-query tables
      "s13_mmr_rerank",
      // q71: both broadcast sides are ONE-row scalars (the balance
      // threshold and the max-date anchor)
      "q71_dormant_accounts",
      // t44: the broadcast side is the 10-row head-term table
      "t44_positional_bias")

  test("no query plans an unapproved nested-loop or cartesian join") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val p = fn(spark, TestSpark.sf).queryExecution.executedPlan.toString
      if (!allowNestedLoop(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans BroadcastNestedLoopJoin — allowlist only with a scale justification")
      assert(!p.contains("CartesianProduct"), s"$name plans CartesianProduct")
    }
  }
}
