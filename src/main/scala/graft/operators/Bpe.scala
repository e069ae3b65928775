package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, GQ}
import graft.functions.TextFunctions.tokens

/** Distributed BPE merge training (Sennrich et al. 2016): learn the
  * byte-pair-encoding merge table from the corpus — the tokenizer-
  * construction step of every LLM data pipeline.
  *
  * Scale shape: after ONE corpus pass builds the (word, count) table,
  * every iteration runs over WORD TYPES weighted by count — the
  * vocabulary-bounded working set the published algorithm defines, so
  * per-merge cost is independent of corpus size (a 100 TB corpus and a
  * 100 GB corpus with the same vocabulary train at the same speed after
  * the initial count). Per iteration: one pair-count aggregation (one
  * shuffle on the symbol pair), one 1-row argmax to the driver (the
  * merge table IS model state, like k-means centroids), and one HOF
  * fold that applies the merge left-to-right inside a single projection
  * — no row explosion, no join. The symbol table is localCheckpoint'd
  * each round (lineage cut, previous round's blocks released).
  *
  * Determinism: ties on pair count break lexicographically, so the
  * learned merge sequence is unique for a given corpus.
  */
object Bpe {

  /** (left, right) adjacent-symbol pairs of `s`, weighted upstream. */
  private def pairsOf(s: Column): Column =
    zip_with(
      slice(s, lit(1), size(s) - 1),
      slice(s, lit(2), size(s) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** Apply merge (l, r) -> l+r left-to-right over a symbol array: a
    * fold that glues the current symbol onto the accumulator's last
    * element when they form the pair. After a glue the NEW last symbol
    * is the merged token, which no longer equals `l` as a unit — the
    * fold is exactly the standard greedy non-overlapping application
    * ("aaa" under (a,a) -> ["aa","a"], not ["aa","aa"]). */
  private def applyMerge(s: Column, l: String, r: String): Column = {
    val glued = lit(l + r)
    aggregate(s, typedLit(Seq.empty[String]), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(glued)))
        .otherwise(concat(acc, array(x))))
  }

  /** Learn `numMerges` merges; returns (rank, left, right, pair_count)
    * — rank 1 is the first (highest-count) merge.
    *
    * Two execution regimes chosen from the MEASURED word-type count
    * (the d05 dual-regime pattern, r18 optimization): the working set
    * after the one corpus pass is the (word, count) table — bounded by
    * the VOCABULARY, not the corpus (the published algorithm's whole
    * point), so when it fits driver memory the entire merge loop runs
    * locally with zero per-round job scheduling (the distributed loop
    * pays ~3 jobs per merge: pair-count argmax + fold + lineage cut —
    * pure fixed overhead at any corpus size). Above the threshold the
    * distributed loop below is unchanged. Both regimes compute the
    * identical merge sequence (BpeSpec parity pin): same adjacent-pair
    * counting weighted by word count, same (count DESC, l, r)
    * tie-break with UTF8 byte string order, same greedy
    * left-to-right non-overlapping application. The switch is
    * session-tunable via `graft.bpe.driverMaxVocab` (0 forces the
    * distributed arm — how the parity spec exercises both). */
  def trainMerges(documents: DataFrame, textCol: String,
      numMerges: Int, driverMaxVocab: Long = 500000L): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val words = documents
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val maxVocab = spark.conf.getOption("graft.bpe.driverMaxVocab")
      .map(_.toLong).getOrElse(driverMaxVocab)
    // vocab size via the memoized plan-statistic cache (the derived-
    // density-knob class): one count job per (plan, file set), shared
    // by repeated builds in one session
    if (maxVocab > 0 && Engine.memoCount(words) <= maxVocab) {
      val wordRows = words.collect().map(r => (r.getString(0), r.getLong(1)))
      return trainMergesLocal(spark, wordRows, numMerges)
    }
    var syms = words
      .select(col("wc"), split(col("w"), "").as("s"))
      .transform(Engine.cut)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    for (rank <- 1 to numMerges if !done) {
      val best = syms.filter(size(col("s")) >= 2)
        .select(col("wc"), explode(pairsOf(col("s"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("wc").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, l, r, c))
        val next = syms
          .select(col("wc"), applyMerge(col("s"), l, r).as("s"))
          .transform(Engine.cut)
        Engine.releaseCheckpoint(syms)
        syms = next
      }
    }
    Engine.releaseCheckpoint(syms)
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Driver-local merge loop over the collected (word, count) table —
    * exact twin of the distributed loop (see [[trainMerges]]): pair
    * counts are adjacent-position counts weighted by `wc` (ALL
    * occurrences within a word count, exactly like the explode), the
    * argmax tie-break is (count DESC, l, r) in UTF8 byte order (what
    * Spark's orderBy compares on strings — identical to UTF-16 order
    * for the ASCII word-internal alphabet, but pinned to UTF8 like the
    * d05 union-find arm so the regimes can never split), and merge
    * application is the greedy left-to-right fold of [[applyMerge]]. */
  private def trainMergesLocal(spark: SparkSession,
      words: Array[(String, Long)], numMerges: Int): DataFrame = {
    import spark.implicits._
    def utf8Lt(a: String, b: String): Boolean =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0
    // split("") on the distributed side yields per-character symbols;
    // word-internal symbols are single BMP chars here by construction
    var syms: Array[(Long, Array[String])] =
      words.map { case (w, wc) => (wc, w.split("").filter(_.nonEmpty)) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    for (rank <- 1 to numMerges if !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (wc, s) =>
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + wc
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy(identity)(Ordering.fromLessThan[((String, String), Long)] {
          case (((l1, r1), c1), ((l2, r2), c2)) =>
            if (c1 != c2) c1 > c2
            else if (l1 != l2) utf8Lt(l1, l2)
            else utf8Lt(r1, r2)
        })
        merges += ((rank, l, r, c))
        syms = syms.map { case (wc, s) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          s.foreach { x =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc(acc.length - 1) = l + r
            else acc += x
          }
          (wc, acc.toArray)
        }
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Tokenize `textCol` with an already-learned merge sequence:
    * inference is pure projection (no shuffle, no state), the shape
    * that runs over the full corpus at 100 TB. The whole merge table
    * applies in ONE native expression (graft_bpe_encode) — composing
    * the training fold per merge builds a nested HOF tree that explodes
    * in size/codegen at a real 32k-merge vocabulary; the native kernel
    * carries the table as a single plan literal. Semantics are pinned
    * equal to the fold composition ([[applyMergesFold]]) in BpeSpec. */
  def applyMerges(documents: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    documents.withColumn("bpe_tokens",
      graft.functions.GraftFunctions.bpeEncode(col(textCol), merges))

  /** The reference fold form of [[applyMerges]] — one aggregate HOF per
    * merge, exactly [[applyMerge]] composed in rank order. Kept as the
    * semantic oracle for the native kernel (BpeSpec parity at 256
    * merges); usable directly only at toy merge counts. */
  def applyMergesFold(documents: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val syms = merges.foldLeft(
      split(col(textCol), "").as("s") : Column) { case (acc, (l, r)) =>
      applyMerge(acc, l, r)
    }
    documents.withColumn("bpe_tokens", syms)
  }

  /** Program-generated DuckDB oracle for the unrolled 8-merge training
    * loop (upgraded from rows-only in r10): symbol arrays ride as
    * chr(1)-delimited strings (`SEP sym SEP SEP sym SEP ...`), where
    * SQL `replace` of `SEP l SEP SEP r SEP` -> `SEP lr SEP` is EXACTLY
    * the greedy left-to-right non-overlapping merge the training fold
    * applies ("aaa" under (a,a) -> ["aa","a"]), and the delimiters pin
    * symbol boundaries so a suffix/prefix match can never merge across
    * two symbols. Each iteration is one pair-count CTE + one argmax CTE
    * (count DESC, l, r — the fold's tie-break; both engines compare
    * ASCII binary) + one replace CTE. Word-internal symbols are
    * [a-z0-9]+ so the chr(1) separator cannot collide. */
  private val S = "chr(1)"
  private val oracleWordCtes: String = {
    val tok = TextPipeline.oracleTokens
    val iters = (1 to 8).map { i =>
      s""",
p$i AS (SELECT wc, unnest(list_zip(list_slice(ls, 1, length(ls)-1), list_slice(ls, 2, length(ls)))) AS pr
        FROM (SELECT wc, string_split(substr(enc, 2, length(enc)-2), $S||$S) AS ls
              FROM w$i WHERE length(enc) > 0)),
b$i AS (SELECT pr[1] AS l, pr[2] AS r, CAST(SUM(wc) AS BIGINT) AS c
        FROM p$i WHERE pr[2] IS NOT NULL
        GROUP BY 1, 2 ORDER BY c DESC, l, r LIMIT 1),
w${i + 1} AS (SELECT wc, replace(enc, $S||l||$S||$S||r||$S, $S||l||r||$S) AS enc
        FROM w$i CROSS JOIN b$i)"""
    }.mkString
    s"""words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS wc
  FROM (SELECT unnest($tok) AS w FROM documents) GROUP BY 1),
w1 AS (SELECT wc, $S || array_to_string(string_split(w, ''), $S||$S) || $S AS enc FROM words)$iters"""
  }

  val defs: Seq[GQ] = Seq(
    // Full SQL oracle: the unrolled training loop above; BpeSpec keeps
    // pinning the classic toy-corpus merges, greedy left-to-right
    // semantics, and determinism.
    GQ("t24_bpe_merges",
      Some(s"""WITH $oracleWordCtes
        SELECT * FROM (${(1 to 8).map(i =>
          s"SELECT CAST($i AS INT) AS rank, l AS left, r AS right, c AS pair_count FROM b$i")
          .mkString(" UNION ALL ")})"""),
      (s, d) => trainMerges(Engine.table(s, d, "documents"), "text", 8)),

    // The full tokenizer flow — train the merge table, then tokenize
    // the WHOLE corpus with it (the per-doc token count every data
    // budget is priced in). Inference is the one-pass native kernel
    // (graft_bpe_encode): pure projection over one corpus scan, no
    // shuffle — the 100 TB shape; the merge table rides in the plan.
    // Full SQL oracle: the same unrolled training CTEs, then the 8
    // learned merges replayed over each document's RAW char stream
    // (the kernel's input; BpeSpec pins kernel == fold). The chr(1)
    // separator gamble extends to document text here — the driver's
    // synthetic corpus contains no control chars, and a collision
    // would surface as a hash mismatch, not a silent pass.
    GQ("t26_bpe_tokenize",
      Some(s"""WITH $oracleWordCtes,
d0 AS (SELECT doc_id, text, CASE WHEN length(text) = 0 THEN ''
       ELSE $S || array_to_string(string_split(text, ''), $S||$S) || $S END AS enc
       FROM documents),
${(1 to 8).map(i =>
        s"""d$i AS (SELECT doc_id, text, replace(enc, $S||l||$S||$S||r||$S, $S||l||r||$S) AS enc
        FROM d${i - 1} CROSS JOIN b$i)""").mkString(",\n")}
        SELECT doc_id, n_bpe_tokens,
               round(CAST(length(text) AS DOUBLE) / greatest(n_bpe_tokens, 1), 6) AS chars_per_token
        FROM (SELECT doc_id, text,
                CAST(CASE WHEN enc = '' THEN 0
                     ELSE length(string_split(substr(enc, 2, length(enc)-2), $S||$S)) END AS INT)
                  AS n_bpe_tokens
              FROM d8)"""),
      (s, d) => {
        val corpus = Engine.table(s, d, "documents")
        val merges = trainMerges(corpus, "text", 8).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        applyMerges(corpus, "text", merges)
          .select(col("doc_id"),
            size(col("bpe_tokens")).cast(IntegerType).as("n_bpe_tokens"),
            round(length(col("text")).cast(DoubleType)
              / greatest(size(col("bpe_tokens")), lit(1)), 6)
              .as("chars_per_token"))
      })
  )
}
