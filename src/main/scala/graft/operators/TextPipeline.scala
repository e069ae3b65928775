package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, GQ}
import graft.functions.TextFunctions._

/** Text-analysis operators for the training-data pipeline: language ID,
  * quality scoring, token counting, fingerprinting. All pure codegen'd
  * column expressions over the shared tokenizer (TextFunctions) — scan +
  * project, no shuffle, embarrassingly parallel at 100 TB.
  */
object TextPipeline {

  private def docs(s: SparkSession, d: String): DataFrame =
    Engine.table(s, d, "documents")

  /** Quality features: length, word count, alpha ratio, stopword ratio,
    * mean word length. */
  def qualityFeatures(documents: DataFrame): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "is", "to", "in")
    // tokenizer + alpha-count materialized once per row (multiple
    // downstream references; HOFs get no subexpression elimination)
    documents
      .select(col("doc_id"), col("text"), tokens(col("text")).as("tok"),
        length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
          .cast(DoubleType).as("alpha"))
      .select(
        col("doc_id"),
        length(col("text")).cast(IntegerType).as("n_chars_calc"),
        size(col("tok")).cast(IntegerType).as("n_words"),
        round(col("alpha") / length(col("text")), 6).as("alpha_ratio"),
        round(size(filter(col("tok"), t => stop.map(m => t === m).reduce(_ || _)))
          .cast(DoubleType) / greatest(size(col("tok")), lit(1)), 6).as("stopword_ratio"),
        round(col("alpha") / greatest(size(col("tok")), lit(1)), 6).as("mean_word_len"))
  }

  val oracleTokens = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** t18's token stream joined with both unigram LMs: one row per token
    * OCCURRENCE carrying the raw double log-likelihood-ratio term.
    * Factored out so TextPipelineSpec can assert the boundary-distance
    * property on exactly the doubles the query aggregates. */
  def dsirTerms(s: SparkSession, d: String): DataFrame = {
    val tok = docs(s, d).select(col("doc_id"), col("lang"),
      explode(tokens(col("text"))).as("token"))
    val raw = tok.groupBy("token").agg(count(lit(1)).as("cr"))
    val tgt = tok.filter(col("lang") === "en")
      .groupBy("token").agg(count(lit(1)).as("ct"))
    val st = raw.agg(sum("cr").as("tr"), count(lit(1)).as("b"))
      .crossJoin(tgt.agg(sum("ct").as("tt")))
    tok.join(broadcast(raw), "token")
      .join(broadcast(tgt), Seq("token"), "left")
      .crossJoin(broadcast(st))
      .select(col("doc_id"), col("token"),
        (log((coalesce(col("ct"), lit(0L)) + 1).cast(DoubleType) / (col("tt") + col("b")))
          - log((col("cr") + 1).cast(DoubleType) / (col("tr") + col("b"))))
          .as("term_raw"))
  }

  /** t18 body over the factored term stream (see the GQ comment for the
    * determinism contract; spec: TextPipelineSpec "t18 boundary"). */
  /** Mean-of-rounded-terms at 4dp via exact integer TRUNCATING
    * division — the r12 emission shared by t18/t22: the sum of
    * 6dp-rounded terms is an exact decimal (multiple of 1e-6), its
    * unscaled micros extract exactly into a BIGINT, and
    * trunc(sm / (100 n)) / 1e4 is pure integer arithmetic both engines
    * evaluate identically (`div` and `//` both truncate toward zero —
    * verified on negatives). The previous round(sum/n, 4) put a
    * rational quotient through each engine's own double-round: the
    * first full sf1 run caught three documents whose quotients sat on
    * a 4dp half and split the engines — a tie CLASS no fixture can pin
    * away, so the emission is now tie-free by construction. (Also
    * retires t18's signed-zero normalization: integer zero has no
    * sign.) */
  def dsirWeights(s: SparkSession, d: String): DataFrame =
    dsirTerms(s, d)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nt"),
        (sum(round(col("term_raw"), 6).cast(Engine.DEC)).cast(Engine.DEC6)
          * lit(1000000L)).cast(LongType).as("sm"))
      .select(col("doc_id"), col("nt").cast(IntegerType).as("n_tokens"),
        (expr("sm div (100 * nt)").cast(DoubleType) / 1e4).as("dsir_weight"))

  /** Oracle twin of TextFunctions.langScore over a `tok` list column. */
  private def oracleLangScore(l: String): String = {
    val in = langMarkers(l).map(m => s"'$m'").mkString(", ")
    s"len(list_filter(tok, t -> list_contains([$in], t)))"
  }

  /** Oracle twin of TextFunctions.langGuess (shared by t01 and t38). */
  private def oracleLangGuess: String = {
    val langs = Seq("en", "de", "fr", "es", "zh")
    val best = s"greatest(${langs.map(oracleLangScore).mkString(", ")})"
    langs.foldRight("'und'") { (l, acc) =>
      s"CASE WHEN ${oracleLangScore(l)} = $best AND $best > 0 THEN '$l' ELSE $acc END"
    }
  }

  /** BM25 relevance of every matching document against a fixed term set
    * (Robertson/Sparck Jones with the Lucene idf variant, k1=1.2
    * b=0.75) — the t16 scorer, factored so retrieval compositions
    * (e.g. the s07 hybrid fusion) reuse the exact same arithmetic. See
    * t16 for the dataflow/scale story: postings for non-query terms
    * never leave the scan; df/N/avgdl are tiny broadcast aggregates. */
  def bm25Scores(documents: DataFrame, terms: Seq[String]): DataFrame = {
    val base = documents.select(col("doc_id"), tokens(col("text")).as("tok"))
    val stats = base.agg(count(lit(1)).as("n"),
      avg(size(col("tok"))).as("avgdl"))
    val tf = base
      .select(col("doc_id"), size(col("tok")).as("dl"),
        explode(col("tok")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    bm25FromParts(tf, stats)
  }

  /** The BM25 scoring tail over a (doc_id, token, tf, dl) postings
    * frame + a one-row (n, avgdl) stats frame — shared verbatim by the
    * corpus-scan path ([[bm25Scores]]) and the persisted-index path
    * ([[bm25FromIndex]]) so the two can never drift arithmetically. */
  private def bm25FromParts(tf: DataFrame, stats: DataFrame): DataFrame = {
    val df_ = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df_), "token")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1)
          * col("tf") * 2.2
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .as("term_score"))
      .groupBy("doc_id")
      .agg(round(sum(col("term_score")), 4).as("bm25"))
  }

  /** BM25 over a PERSISTED inverted index (the serving path fed by
    * `streaming.DocsStreaming.invertedIndexIngestQuery`): postings =
    * (doc_id, token, tf, dl) rows, doclens = (doc_id, dl) one row per
    * ingested document (n/avgdl must count EVERY document, not only
    * those holding query terms). Query-term postings prune at the scan
    * (predicate pushdown on `token`); the arithmetic is bm25Scores'
    * own tail, so index-served scores equal corpus-scan scores exactly
    * (DocsStreamingSpec pins it across micro-batches). */
  def bm25FromIndex(postings: DataFrame, doclens: DataFrame,
      terms: Seq[String]): DataFrame = {
    val stats = doclens.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val tf = postings.filter(col("token").isin(terms: _*))
      .select("doc_id", "token", "tf", "dl")
    bm25FromParts(tf, stats)
  }

  val defs: Seq[GQ] = Seq(

    GQ("t01_language_id", {
      Some(s"""SELECT doc_id, $oracleLangGuess AS lang_guess,
          CAST(${oracleLangScore("en")} AS INT) AS score_en,
          CAST(${oracleLangScore("de")} AS INT) AS score_de
        FROM (SELECT doc_id, $oracleTokens AS tok FROM documents)""")
    },
      (s, d) => docs(s, d)
        .select(col("doc_id"), tokens(col("text")).as("tok"))
        .select(
          col("doc_id"),
          langGuess(col("tok")).as("lang_guess"),
          langScore(col("tok"), "en").cast(IntegerType).as("score_en"),
          langScore(col("tok"), "de").cast(IntegerType).as("score_de"))),

    GQ("t02_quality_score",
      Some(s"""SELECT doc_id,
          CAST(length(text) AS INT) AS n_chars_calc,
          CAST(len(tok) AS INT) AS n_words,
          round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                / length(text), 6) AS alpha_ratio,
          round(CAST(len(list_filter(tok,
                  t -> list_contains(['the','a','of','and','is','to','in'], t)))
                AS DOUBLE) / greatest(len(tok), 1), 6) AS stopword_ratio,
          round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                / greatest(len(tok), 1), 6) AS mean_word_len
        FROM (SELECT doc_id, text, $oracleTokens AS tok FROM documents)"""),
      (s, d) => qualityFeatures(docs(s, d))),

    GQ("t03_token_count",
      Some("""SELECT doc_id,
          CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS INT)
            AS ws_tokens,
          CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT)
            AS bpe_ish_tokens
        FROM documents"""),
      (s, d) => docs(s, d).select(
        col("doc_id"),
        size(filter(split(col("text"), "\\s+"), x => x =!= ""))
          .cast(IntegerType).as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
          .cast(IntegerType).as("bpe_ish_tokens"))),

    GQ("t04_fingerprint",
      Some("""SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp,
          MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
        FROM documents GROUP BY 1"""),
      (s, d) => docs(s, d)
        .groupBy(fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))),

    // Deterministic content-hash sampling: ~10% of each source selected
    // by a stable criterion (md5 prefix) — re-runs and re-partitions pick
    // the SAME sample, unlike rand()-based sampling. The standard
    // reproducible-subset op for training-data pipelines.
    GQ("t05_deterministic_sample",
      Some("""SELECT source, doc_id, md5(text) AS h
        FROM documents
        WHERE substring(md5(text), 1, 2) < '1a'"""),
      (s, d) => docs(s, d)
        .withColumn("h", md5(col("text").cast(BinaryType)))
        .filter(substring(col("h"), 1, 2) < "1a")
        .select("source", "doc_id", "h")),

    // End-to-end quality funnel — the composed pre-training filter:
    // confidently-English (marker score), long enough, AND the exact-dedup
    // survivor of its fingerprint group. One scan for scoring + one
    // fingerprint aggregation + a semi join on the survivor set.
    GQ("t08_quality_funnel",
      Some(s"""WITH s AS (
          SELECT doc_id,
                 len(list_filter(tok, t -> list_contains(['the','and','of','is'], t))) AS score_en,
                 len(tok) AS n_words
          FROM (SELECT doc_id, $oracleTokens AS tok FROM documents)),
        surv AS (SELECT MIN(doc_id) AS keep_id FROM documents
                 GROUP BY md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))))
        SELECT doc_id, CAST(score_en AS INT) AS score_en,
               CAST(n_words AS INT) AS n_words
        FROM s JOIN surv ON doc_id = keep_id
        WHERE score_en >= 2 AND n_words >= 20"""),
      (s, d) => {
        val scored = docs(s, d)
          .select(col("doc_id"), tokens(col("text")).as("tok"))
          .select(col("doc_id"),
            langScore(col("tok"), "en").cast(IntegerType).as("score_en"),
            size(col("tok")).cast(IntegerType).as("n_words"))
        val survivors = docs(s, d)
          .groupBy(fingerprint(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("keep_id"))
          .select("keep_id")
        scored
          .join(survivors, col("doc_id") === col("keep_id"), "left_semi")
          .filter(col("score_en") >= 2 && col("n_words") >= 20)
      }),

    // PII-style pattern scrubbing: emails / URLs / long digit runs
    // replaced with typed placeholder tokens — pure per-row regex
    // projection, no shuffle, the standard pre-training redaction pass.
    GQ("t07_redact",
      Some("""SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            'https?://[^\s]+', '<URL>', 'g'),
            '[0-9]{6,}', '<NUM>', 'g') AS redacted,
          CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            'https?://[^\s]+', '<URL>', 'g'),
            '[0-9]{6,}', '<NUM>', 'g')) - length(text) AS BIGINT) AS delta
        FROM documents"""),
      (s, d) => {
        def redact(c: org.apache.spark.sql.Column) =
          regexp_replace(regexp_replace(regexp_replace(c,
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
            "https?://[^\\s]+", "<URL>"),
            "[0-9]{6,}", "<NUM>")
        docs(s, d).select(
          col("doc_id"),
          redact(col("text")).as("redacted"),
          (length(redact(col("text"))) - length(col("text")))
            .cast(LongType).as("delta"))
      }),

    // Stratified deterministic sampling: a fixed quota per stratum
    // (language), ranked by content hash — the per-source/per-language
    // quota op for training mixes. Hash ranking keeps the pick stable
    // under re-runs and re-partitioning; one shuffle on the stratum key.
    GQ("t06_stratified_sample",
      Some("""SELECT lang, doc_id, rn FROM (
          SELECT lang, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY md5(text) NULLS LAST, doc_id) AS rn
          FROM documents) WHERE rn <= 5"""),
      (s, d) => {
        // explicit NULLS LAST: Spark defaults ASC to nulls-first, DuckDB
        // to nulls-last — a NULL text would silently shift the sample
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang")
          .orderBy(md5(col("text").cast(BinaryType)).asc_nulls_last, col("doc_id"))
        docs(s, d)
          .withColumn("rn", row_number().over(w).cast(LongType))
          .filter(col("rn") <= 5)
          .select("lang", "doc_id", "rn")
      }),

    // Gopher-style repetition signals: fraction of the document covered
    // by its most frequent word / bigram / trigram, plus duplicate-word
    // fraction. Spark side is a shuffle-free scan+project — the
    // per-document top-n-gram count is a native one-pass kernel
    // (MaxShingleCount), where the oracle (and a naive implementation)
    // explodes every n-gram through a two-level aggregation. Both sides
    // divide the same exact integers, so round(,6) is bit-identical.
    GQ("t09_repetition", {
      def gramCte(name: String, expr: String) =
        s"""$name AS (SELECT doc_id, MAX(c) AS m FROM (
             SELECT doc_id, g, COUNT(*) AS c
             FROM (SELECT doc_id, unnest($expr) AS g FROM tok)
             GROUP BY doc_id, g) GROUP BY doc_id)"""
      val bigram = "CASE WHEN len(t) >= 2 THEN list_transform(range(1, len(t)), " +
        "i -> t[i] || ' ' || t[i+1]) ELSE [] END"
      val trigram = "CASE WHEN len(t) >= 3 THEN list_transform(range(1, len(t) - 1), " +
        "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) ELSE [] END"
      Some(s"""WITH tok AS (SELECT doc_id, $oracleTokens AS t FROM documents),
        ${gramCte("g1", "t")}, ${gramCte("g2", bigram)}, ${gramCte("g3", trigram)}
        SELECT tok.doc_id, CAST(len(t) AS INT) AS n_words,
          round(CAST(coalesce(g1.m, 0) AS DOUBLE) / greatest(len(t), 1), 6) AS top_word_frac,
          round(CAST(coalesce(g2.m, 0) AS DOUBLE) / greatest(len(t) - 1, 1), 6) AS top_bigram_frac,
          round(CAST(coalesce(g3.m, 0) AS DOUBLE) / greatest(len(t) - 2, 1), 6) AS top_trigram_frac,
          round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1), 6) AS dup_word_frac
        FROM tok
        LEFT JOIN g1 ON tok.doc_id = g1.doc_id
        LEFT JOIN g2 ON tok.doc_id = g2.doc_id
        LEFT JOIN g3 ON tok.doc_id = g3.doc_id""")
    },
      (s, d) => {
        import graft.functions.{GraftFunctions => GF}
        docs(s, d)
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .select(col("doc_id"),
            size(col("t")).cast(IntegerType).as("n_words"),
            round(GF.maxShingleCount(col("t"), 1).cast(DoubleType) /
              greatest(size(col("t")), lit(1)), 6).as("top_word_frac"),
            round(GF.maxShingleCount(col("t"), 2).cast(DoubleType) /
              greatest(size(col("t")) - 1, lit(1)), 6).as("top_bigram_frac"),
            round(GF.maxShingleCount(col("t"), 3).cast(DoubleType) /
              greatest(size(col("t")) - 2, lit(1)), 6).as("top_trigram_frac"),
            round(lit(1.0) - size(array_distinct(col("t"))).cast(DoubleType) /
              greatest(size(col("t")), lit(1)), 6).as("dup_word_frac"))
      }),

    // Corpus vocabulary: top-k tokens by frequency with a deterministic
    // tie-break. explode -> partial (map-side) count -> final count ->
    // TakeOrderedAndProject: the only full-width shuffle carries one
    // (token, partial_count) row per distinct token per partition, and
    // top-k never sorts the full vocabulary.
    GQ("t10_vocab_topk",
      Some(s"""SELECT g AS token, COUNT(*) AS cnt
        FROM (SELECT unnest($oracleTokens) AS g FROM documents)
        GROUP BY g ORDER BY cnt DESC, token LIMIT 100"""),
      (s, d) => docs(s, d)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(100)),

    // Sliding token-window chunking — the training/RAG segmentation op:
    // every document becomes ceil-many overlapping chunks of <= 64
    // whitespace tokens with stride 48. Pure scan + generator explode
    // (no shuffle); chunk count derives from the document alone, so the
    // op stays embarrassingly parallel and the output is deterministic
    // under any partitioning. At 100 TB the only growth is output rows
    // (~n_tokens/stride per doc), never an exchange.
    GQ("t12_chunk_documents", {
      val C = 64; val S = 48
      Some(s"""WITH tok AS (SELECT doc_id,
            list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
          FROM documents),
        n AS (SELECT doc_id, t, len(t) AS n FROM tok)
        SELECT doc_id, CAST(i AS INT) AS chunk_id,
               CAST(least($C, n - i*$S) AS INT) AS chunk_tokens,
               array_to_string(t[i*$S+1 : i*$S+$C], ' ') AS chunk_text
        FROM (SELECT doc_id, t, n,
                unnest(range(0, greatest(CAST(ceil((n - $C) / $S.0) AS BIGINT), 0) + 1)) AS i
              FROM n)""")
    },
      (s, d) => {
        val C = 64; val S = 48
        docs(s, d)
          .select(col("doc_id"),
            filter(split(col("text"), "\\s+"), x => x =!= "").as("t"))
          .withColumn("n", size(col("t")))
          .withColumn("i", explode(sequence(lit(0L),
            greatest(ceil((col("n") - C).cast(DoubleType) / S), lit(0L)))))
          .select(col("doc_id"),
            col("i").cast(IntegerType).as("chunk_id"),
            least(lit(C), col("n") - col("i") * S).cast(IntegerType)
              .as("chunk_tokens"),
            array_join(slice(col("t"), (col("i") * S + 1).cast(IntegerType),
              lit(C)), " ").as("chunk_text"))
      }),

    // Unigram-LM quality score (the CCNet-style LM filter with the LM
    // trained on the corpus itself): per-document mean token log-prob
    // under the corpus unigram distribution. Rare-token-heavy documents
    // score low. Two-pass: train = one shuffle (token counts, partial
    // agg), score = join on token (AQE broadcasts when vocab is small)
    // + one agg on doc_id. No driver-side state: the "model" is a
    // DataFrame joined distributively, so a 100 TB corpus trains and
    // scores in the same plan.
    GQ("t13_lm_quality",
      Some(s"""WITH tok AS (SELECT doc_id, unnest($oracleTokens) AS token FROM documents),
        freq AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
        tot AS (SELECT SUM(c) AS t FROM freq)
        SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
               round(${GQ.osum("round(ln(CAST(c AS DOUBLE) / t), 6)")}
                 / COUNT(*), 4) AS avg_logprob
        FROM tok JOIN freq USING (token) CROSS JOIN tot
        GROUP BY doc_id"""),
      (s, d) => {
        val tok = docs(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        val freq = tok.groupBy("token").agg(count(lit(1)).as("c"))
        val tot = freq.agg(sum("c").as("t"))
        tok.join(freq, "token").crossJoin(broadcast(tot))
          .groupBy("doc_id")
          // order-independent mean (see t18): pre-round each log-prob
          // to 6dp, decimal-exact sum, one division, 4dp emission
          .agg(count(lit(1)).cast(IntegerType).as("n_tokens"),
            round(Engine.dsum(round(log(col("c").cast(DoubleType) / col("t")), 6))
              / count(lit(1)), 4)
              .as("avg_logprob"))
      }),

    // Span-level cross-document dedup (the C4 line-dedup / Lee et al.
    // repeated-substring removal shape): a document's non-overlapping
    // 3-token segment occurring in >= 2 DISTINCT documents is repeated
    // boilerplate and is dropped from every document; survivors are
    // reassembled in original order. Two shuffles at any scale: the
    // segment document-frequency count and the per-doc reassembly — the
    // heavy-segment table is small and AQE broadcasts the anti-join
    // side. (On a real crawl the segment is a line/sentence; the
    // synthetic corpus has no sentence boundaries, so segments are
    // fixed token blocks — the dataflow is identical.)
    GQ("t14_span_dedup", {
      val L = 3; val N = 2
      Some(s"""WITH tok AS (SELECT doc_id,
            list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
          FROM documents),
        segs AS (
          SELECT doc_id, g.i AS pos, g.seg
          FROM (SELECT doc_id,
                  list_transform(range(1, CAST(ceil(len(t) / $L.0) AS BIGINT) + 1),
                    i -> array_to_string(t[(i-1)*$L+1 : i*$L], ' ')) AS ss
                FROM tok),
            LATERAL (SELECT unnest(ss) AS seg, generate_subscripts(ss, 1) AS i) g
          WHERE g.seg <> ''),
        heavy AS (SELECT seg FROM segs GROUP BY seg
                  HAVING COUNT(DISTINCT doc_id) >= $N)
        SELECT doc_id, CAST(COUNT(*) AS INT) AS kept_segments,
               string_agg(seg, ' ' ORDER BY pos) AS cleaned
        FROM segs WHERE seg NOT IN (SELECT seg FROM heavy)
        GROUP BY doc_id""")
    },
      (s, d) => {
        val L = 3; val N = 2
        val toks = filter(split(col("text"), "\\s+"), x => x =!= "")
        val segArr = when(size(col("t")) > 0, transform(
            sequence(lit(1L), ceil(size(col("t")).cast(DoubleType) / L)),
            i => array_join(
              slice(col("t"), ((i - 1) * L + 1).cast(IntegerType), lit(L)), " ")))
          .otherwise(array().cast(ArrayType(StringType)))
        val segs = docs(s, d)
          .select(col("doc_id"), toks.as("t"))
          .select(col("doc_id"), posexplode(segArr).as(Seq("pos0", "seg")))
          .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("seg"))
          .filter(col("seg") =!= "")
        // r19 (the graft_token_counts discipline): a segment's document
        // frequency dedupes DOC-LOCALLY — array_distinct inside the
        // scan emits each (doc, seg) pair once, so the count needs ONE
        // exchange where count_distinct(doc_id) paid two (the partial
        // (seg, doc_id) dedup exchange plus the per-seg count). Values
        // identical: count(*) over doc-distinct segs IS the distinct
        // doc count.
        val heavy = docs(s, d)
          .select(col("doc_id"), toks.as("t"))
          .select(explode(array_distinct(
            filter(segArr, x => x =!= ""))).as("seg"))
          .groupBy("seg").agg(count(lit(1)).as("nd"))
          .filter(col("nd") >= N).select("seg")
        segs.join(heavy, Seq("seg"), "left_anti")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast(IntegerType).as("kept_segments"),
            array_join(transform(array_sort(
              collect_list(struct(col("pos"), col("seg")))),
              x => x.getField("seg")), " ").as("cleaned"))
      }),

    // Mixture sampling: per-source KEEP RATES (web 30%, books 90%, ...)
    // applied via the deterministic content-hash criterion — the
    // training-mix re-weighting op (t05 = one global rate, t06 = fixed
    // quota; this is the proportional form). Selection is stable under
    // re-partitioning and re-runs; one scan, no shuffle.
    GQ("t15_mixture_sample",
      Some("""SELECT source, doc_id FROM (
          SELECT source, doc_id,
                 CAST(('0x' || substring(md5(text), 1, 6)) AS BIGINT)
                   / 16777216.0 AS u
          FROM documents)
        WHERE u < CASE source
          WHEN 'web' THEN 0.3 WHEN 'books' THEN 0.9
          WHEN 'code' THEN 0.6 ELSE 0.5 END"""),
      (s, d) => {
        val u = conv(substring(md5(col("text").cast(BinaryType)), 1, 6), 16, 10)
          .cast(LongType).cast(DoubleType) / 16777216.0
        val rate = when(col("source") === "web", 0.3)
          .when(col("source") === "books", 0.9)
          .when(col("source") === "code", 0.6)
          .otherwise(0.5)
        docs(s, d).filter(u < rate).select("source", "doc_id")
      }),

    // Heavy hitters, sketch-pruned but EXACT (the d08 pattern applied to
    // frequencies): pass 1 folds the token stream into a count-min
    // sketch (distributed build, KB-sized result); pass 2 keeps only
    // tokens whose CMS estimate reaches the floor — CMS never
    // underestimates, so no true heavy hitter is lost — and exact-counts
    // that candidate set, re-checking the floor. The full-vocabulary
    // shuffle of a naive `GROUP BY token HAVING count >= N` shrinks to
    // the candidate tokens; at 100 TB that is the difference between
    // shuffling the whole token stream and shuffling the heavy tail.
    // Result is exact -> plain SQL oracle.
    GQ("t11_heavy_hitters",
      Some(s"""SELECT g AS token, COUNT(*) AS cnt
        FROM (SELECT unnest($oracleTokens) AS g FROM documents)
        GROUP BY g HAVING COUNT(*) >= 100"""),
      (s, d) => {
        import graft.functions.{GraftFunctions => GF}
        val floor = 100L
        val toks = docs(s, d).select(explode(tokens(col("text"))).as("token"))
        val cms = toks.stat.countMinSketch(
          "token", eps = 0.0001, confidence = 0.99, seed = 42)
        toks.filter(GF.cmsAtLeast(s, col("token"), cms, floor))
          .groupBy("token").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= floor)
      }),

    // BM25 retrieval (Robertson/Sparck Jones with the Lucene idf
    // variant, k1=1.2 b=0.75): score every document against a fixed
    // term query and return the top 20. The inverted-index shape, run
    // as dataflow: tf = one scan with the doc length riding along each
    // posting (no second scan), df/N/avgdl are tiny aggregates joined
    // back by broadcast. At 100 TB the only big shuffle is the
    // (doc_id, term) tf aggregation, pre-filtered to the query terms —
    // postings for non-query terms never leave the scan. Scores are
    // rounded before the top-k so the DuckDB comparison and the
    // tie-break (doc_id) are exact.
    GQ("t16_bm25", {
      val terms = Seq("scan", "hash", "merge").map(t => s"'$t'").mkString(", ")
      Some(s"""WITH dl AS (SELECT doc_id, len($oracleTokens) AS dl FROM documents),
        stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf
               FROM (SELECT doc_id, unnest($oracleTokens) AS token FROM documents)
               WHERE token IN ($terms) GROUP BY 1, 2),
        df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1)
        SELECT doc_id, bm25 FROM (
          SELECT doc_id,
                 round(SUM(ln((n - df + 0.5) / (df + 0.5) + 1)
                   * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
          FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
          GROUP BY doc_id)
        ORDER BY bm25 DESC, doc_id LIMIT 20""")
    },
      (s, d) => bm25Scores(docs(s, d), Seq("scan", "hash", "merge"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)),

    // Per-document keyword extraction: top-3 terms by TF-IDF. The df
    // (document frequency) side is vocabulary-bounded — broadcast here;
    // at a 100 TB corpus where the vocabulary outgrows a broadcast it
    // degrades to ONE shuffle of the (doc_id, token, tf) table keyed on
    // token. The final top-3 window partitions by doc_id with a
    // per-document cardinality bounded by document length (the t12
    // argument), so no task ever sorts more than one document's terms.
    GQ("t17_tfidf_keywords",
      Some(s"""WITH tok AS (SELECT doc_id, unnest($oracleTokens) AS token FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        scored AS (SELECT doc_id, token,
            round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
          FROM tf JOIN df USING (token) CROSS JOIN n)
        SELECT doc_id, token, tfidf FROM (
          SELECT doc_id, token, tfidf,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, token) AS rn
          FROM scored) WHERE rn <= 3"""),
      (s, d) => {
        // r19: the tf table is built ROW-LOCALLY (tokenCounts RLE kernel)
        // instead of groupBy(doc_id, token) — token counts are doc-local,
        // so the aggregation's corpus-sized exchange was pure overhead
        // (guide §8 "use what you know"); the (doc_id, token, tf) multiset
        // is identical, so df/idf/ranking are value-unchanged
        val tf = docs(s, d).select(col("doc_id"),
            explode(tokenCounts(tokens(col("text")))).as("tc"))
          .select(col("doc_id"), col("tc.token").as("token"),
            col("tc.tf").as("tf"))
        val dfc = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val n = docs(s, d).agg(count(lit(1)).as("n"))
        val scored = tf.join(broadcast(dfc), "token")
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("token"),
            round(col("tf") * log(col("n").cast(DoubleType) / col("df")), 6)
              .as("tfidf"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("tfidf").desc, col("token"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("doc_id", "token", "tfidf")
      }),

    // DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
    // score every document by the log-likelihood ratio between a TARGET
    // domain's unigram LM (here: the lang='en' slice) and the raw-corpus
    // LM, add-1 smoothed over the joint vocabulary — the reweighting
    // that lets a pipeline sample a raw crawl toward a target
    // distribution. Distinct from t13 (absolute corpus-LM quality):
    // this is RELATIVE domain affinity. Same 100 TB shape as t13: both
    // LMs are DataFrames joined distributively on token (vocab-bounded
    // -> broadcast; degrades to one token-keyed shuffle), one agg on
    // doc_id; no driver-side model state.
    // Determinism — the full two-round story, because the cure must match
    // the disease. r7: a plain AVG(double) sums in partition order; fixed
    // by 6dp-rounding each per-token log-ratio, exact DECIMAL sum, one
    // division, 4dp emit. Still red. r8 hypothesis (per-token ln/round
    // diverging by an ulp across engines) was DISPROVED by measurement:
    // `Probe t18` dumps every distinct per-token term and a DuckDB diff
    // found ZERO divergent doubles — raw or 6dp — at sf0.01, and zero
    // divergent per-doc quotients. The actual bug was IEEE signed zero on
    // exactly one document: its mean log-ratio is a tiny NEGATIVE that
    // rounds to zero at 4dp, DuckDB's float-space round keeps the sign
    // (-0.0), Spark's BigDecimal round has no -0 (+0.0) — equal under
    // SQL `=`, different under the driver's value hash. Cure: zeroNorm
    // on both engines. TextPipelineSpec additionally pins the g01-style
    // boundary-distance property (no per-token term within 1e-9 of a 6dp
    // round boundary, no per-doc quotient within 1e-9 of a 4dp boundary)
    // so the rounding contract itself is PROVEN tie-free on this corpus,
    // not assumed. t22 below carries the identical shape (its log-probs
    // are strictly negative and bounded away from 0 — no signed-zero
    // exposure).
    GQ("t18_dsir_weights",
      Some(s"""WITH tok AS (SELECT doc_id, lang, unnest($oracleTokens) AS token FROM documents),
        raw AS (SELECT token, COUNT(*) AS cr FROM tok GROUP BY 1),
        tgt AS (SELECT token, COUNT(*) AS ct FROM tok WHERE lang = 'en' GROUP BY 1),
        st AS (SELECT (SELECT SUM(cr) FROM raw) AS tr,
                      (SELECT COUNT(*) FROM raw) AS b,
                      (SELECT SUM(ct) FROM tgt) AS tt)
        SELECT doc_id, n_tokens,
               CAST(sm // (100 * nt) AS DOUBLE) / 1e4 AS dsir_weight FROM (
        SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens, COUNT(*) AS nt,
               ${GQ.omicros("round(ln(CAST(COALESCE(ct, 0) + 1 AS DOUBLE) / (tt + b)) " +
                 "- ln(CAST(cr + 1 AS DOUBLE) / (tr + b)), 6)")} AS sm
        FROM tok JOIN raw USING (token) LEFT JOIN tgt USING (token) CROSS JOIN st
        GROUP BY doc_id)"""),
      (s, d) => dsirWeights(s, d)),

    // Character-entropy quality signal — the classic gibberish/boiler-
    // plate detector (low entropy = repeated characters/padding, high =
    // random noise; natural text sits in a narrow band). Shape: the
    // char explode is |text| rows but collapses map-side to <= charset
    // rows per doc per partition (partial agg on (doc_id, ch)); the
    // per-doc total comes from a window over the ALREADY-aggregated
    // counts — bounded by charset size, never a second scan.
    GQ("t19_char_entropy",
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        cc AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
        w AS (SELECT doc_id, c, SUM(c) OVER (PARTITION BY doc_id) AS n FROM cc)
        SELECT doc_id, round(-SUM((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)), 4)
               AS char_entropy
        FROM w GROUP BY doc_id"""),
      (s, d) => {
        val cc = docs(s, d)
          .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
          .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
        val n = sum(col("c")).over(Window.partitionBy("doc_id"))
        val p = col("c").cast(DoubleType) / col("n")
        cc.withColumn("n", n)
          .groupBy("doc_id")
          .agg(round(-sum(p * log(p)), 4).as("char_entropy"))
      }),

    // canonical text normalization — the first stage of every training
    // pipeline (before hashing, tokenizing, or dedup): control chars ->
    // space, runs of whitespace collapsed, trimmed, lowercased. Pure
    // scan + project (zero exchanges); the regexes stick to constructs
    // Java regex and RE2 interpret identically ([\x00-\x1f], ' +'), and
    // DuckDB's regexp_replace needs the explicit 'g' flag to match
    // Spark's replace-all default.
    GQ("t20_normalize",
      Some("""SELECT doc_id,
          lower(trim(regexp_replace(
            regexp_replace(text, '[\x00-\x1f]', ' ', 'g'), ' +', ' ', 'g')))
            AS norm_text
        FROM documents"""),
      (s, d) => docs(s, d).select(
        col("doc_id"),
        lower(trim(regexp_replace(
          regexp_replace(col("text"), "[\\x00-\\x1f]", " "), " +", " ")))
          .as("norm_text"))),

    // per-source document cap ("at most N docs per domain") — the
    // standard anti-overrepresentation step in corpus mixing. Selection
    // order is a content-stable hash (the t05 discipline), so the kept
    // set is independent of partitioning and re-runs. Scale shape: a
    // single ROW_NUMBER per source would sort EVERY source's documents
    // in one task (the s01 scale-killer); instead phase 1 caps each of
    // 256 hash-sliced buckets per source (any source's global top-N has
    // at most N members in any bucket, so bucket-local top-N loses
    // nothing), leaving <= 256*N bounded rows per source for the exact
    // phase-2 cap. Both phases are one window over one shuffle; task
    // memory is bounded by N regardless of source skew.
    GQ("t21_per_source_cap",
      Some("""WITH h AS (SELECT doc_id, source,
                md5(CAST(doc_id AS VARCHAR)) AS hk FROM documents),
          l1 AS (SELECT doc_id, source, hk FROM (
                  SELECT doc_id, source, hk,
                    ROW_NUMBER() OVER (PARTITION BY source, substring(hk, 1, 2)
                      ORDER BY hk, doc_id) AS rn1
                  FROM h) WHERE rn1 <= 10)
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
            ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rn
          FROM l1) WHERE rn <= 10"""),
      (s, d) => {
        val n = 10
        val h = docs(s, d).select(col("doc_id"), col("source"),
          md5(col("doc_id").cast(StringType)).as("hk"))
        val l1 = h.withColumn("rn1", row_number().over(
            Window.partitionBy(col("source"), substring(col("hk"), 1, 2))
              .orderBy(col("hk"), col("doc_id"))))
          .filter(col("rn1") <= n)
        l1.withColumn("rn", row_number().over(
            Window.partitionBy("source").orderBy(col("hk"), col("doc_id"))))
          .filter(col("rn") <= n)
          .select("doc_id", "source")
      }),

    // bigram LM quality score — t13's unigram filter upgraded with
    // sequence structure: P(w2|w1) add-one smoothed over the corpus-
    // trained bigram/unigram tables, scored as per-doc mean log-prob
    // (word-salad documents score low even when every word is common).
    // Same scale shape as t13/t17/t18: vocabulary-bounded count tables
    // join back to the token stream (AQE broadcasts them while they
    // fit, token-keyed shuffle beyond), the vocab size is a broadcast
    // one-row scalar, and the model trains in the same plan — no
    // driver-side state.
    GQ("t22_bigram_lm",
      Some(s"""WITH tok AS (SELECT doc_id, $oracleTokens AS t FROM documents),
          bg AS (SELECT doc_id, t[g.i] AS w1, t[g.i] || ' ' || t[g.i+1] AS bigram
                 FROM tok, LATERAL (SELECT unnest(range(1, len(t))) AS i) g),
          w1s AS (SELECT unnest(t) AS token FROM tok),
          uni AS (SELECT token, COUNT(*) AS c1 FROM w1s GROUP BY token),
          bc AS (SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY bigram),
          v AS (SELECT COUNT(*) AS nv FROM uni)
        SELECT doc_id, n_bigrams,
          CAST(sm // (100 * nt) AS DOUBLE) / 1e4 AS avg_logprob FROM (
        SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams, COUNT(*) AS nt,
          ${GQ.omicros("round(ln((CAST(c2 AS DOUBLE) + 1) / (c1 + nv)), 6)")} AS sm
        FROM bg JOIN bc USING (bigram) JOIN uni ON bg.w1 = uni.token CROSS JOIN v
        GROUP BY doc_id)"""),
      (s, d) => {
        // r19 restructure (values identical, oracle text unchanged):
        //  - per-doc bigram counts are ROW-LOCAL (tokenCounts over the
        //    row-local bigram array) — the multiset of positions is
        //    preserved as (doc_id, bigram, k) with k occurrences;
        //  - the unigram weight joins into the bigram-VOCAB table, not
        //    the position stream: w1 is derivable from the bigram
        //    (tokens are [a-z0-9]+ runs, so the single joining space is
        //    the only space — substring_index is exact), so the stream
        //    no longer carries w1 and pays ONE vocab-keyed join instead
        //    of two stream-sized ones;
        //  - nv reuses uni's aggregate (runtime exchange reuse), not a
        //    fresh corpus tokenization.
        // Per position the contribution is the same round6 log-weight,
        // and summing k identical 6dp DECIMALs equals k * w exactly, so
        // sm/nt are bit-identical. At scale the dbk-wt join degrades
        // from broadcast to a shuffle on bigram that REUSES bc's own
        // exchange — the bigram side then tokenizes once.
        val tok = docs(s, d).select(col("doc_id"), tokens(col("text")).as("t"))
        val dbk = tok.filter(size(col("t")) >= 2).select(col("doc_id"),
            explode(tokenCounts(zip_with(
              slice(col("t"), lit(1), size(col("t")) - 1),
              slice(col("t"), lit(2), size(col("t")) - 1),
              (a, b) => concat_ws(" ", a, b)))).as("bc"))
          .select(col("doc_id"), col("bc.token").as("bigram"),
            col("bc.tf").as("k"))
        val uni = tok.select(explode(col("t")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("c1"))
        val bc = dbk.groupBy("bigram").agg(sum("k").as("c2"))
        val v = uni.agg(count(lit(1)).as("nv"))
        val wt = bc
          .join(uni, substring_index(col("bigram"), " ", 1) === col("token"))
          .crossJoin(broadcast(v))
          .select(col("bigram"),
            // the same per-position term as before — round6 then DEC
            // (see the t18 dsirWeights determinism note)
            round(log((col("c2").cast(DoubleType) + 1)
              / (col("c1") + col("nv"))), 6).cast(Engine.DEC).as("w"))
        dbk.join(wt, "bigram")
          .groupBy("doc_id")
          .agg(sum(col("k")).as("nt"),
            (sum((col("k") * col("w")).cast(Engine.DEC))
              .cast(Engine.DEC6) * lit(1000000L)).cast(LongType).as("sm"))
          .select(col("doc_id"), col("nt").cast(IntegerType).as("n_bigrams"),
            (expr("sm div (100 * nt)").cast(DoubleType) / 1e4).as("avg_logprob"))
      }),

    // temperature-based mixture resampling (the multilingual balancing
    // op): per-language keep rates ∝ (share)^alpha with alpha = 0.5 —
    // rare languages upsample relative to the head, capped at keeping
    // everything. alpha = 0.5 is deliberately sqrt: IEEE sqrt is
    // correctly rounded (bit-identical across engines) where pow(x,
    // 0.5) through libm need not be. The rate table derives entirely
    // from integer counts + exact-decimal normalization, rounds to 6dp,
    // and the keep decision reuses t15's content-hash fraction — so the
    // kept SET is deterministic and partitioning-independent. Scale:
    // two tiny aggregations (lang cardinality) broadcast back over one
    // corpus scan.
    GQ("t23_temperature_mix",
      Some("""WITH c AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
          t AS (SELECT SUM(c) AS t FROM c),
          w AS (SELECT lang, c, round(sqrt(CAST(c AS DOUBLE) / t), 6) AS w, t
                FROM c CROSS JOIN t),
          z AS (SELECT CAST(CAST(SUM(CAST(w AS DECIMAL(38,10)))
                  AS DECIMAL(38,6)) AS DOUBLE) AS z FROM w),
          r AS (SELECT lang, round(least(1.0, (0.5 * t * w) / (z * c)), 6)
                  AS rate FROM w CROSS JOIN z)
        SELECT d.lang, d.doc_id, r.rate FROM (
          SELECT lang, doc_id,
                 CAST(('0x' || substring(md5(text), 1, 6)) AS BIGINT)
                   / 16777216.0 AS u
          FROM documents) d
        JOIN r USING (lang) WHERE d.u < r.rate"""),
      (s, d) => {
        val counts = docs(s, d).groupBy("lang").agg(count(lit(1)).as("c"))
        val tot = counts.agg(sum("c").as("t"))
        val w = counts.crossJoin(broadcast(tot)).select(
          col("lang"), col("c"), col("t"),
          round(sqrt(col("c").cast(DoubleType) / col("t")), 6).as("w"))
        val z = w.agg(Engine.dsum(col("w")).as("z"))
        val rates = w.crossJoin(broadcast(z)).select(col("lang"),
          round(least(lit(1.0),
            (lit(0.5) * col("t") * col("w")) / (col("z") * col("c"))), 6)
            .as("rate"))
        val u = conv(substring(md5(col("text").cast(BinaryType)), 1, 6), 16, 10)
          .cast(LongType).cast(DoubleType) / 16777216.0
        docs(s, d).select(col("lang"), col("doc_id"), u.as("u"))
          .join(broadcast(rates), "lang")
          .filter(col("u") < col("rate"))
          .select("lang", "doc_id", "rate")
      }),

    // contamination FRACTION — d09's binary decontamination upgraded to
    // the score a curation pipeline actually thresholds on: what share
    // of a training doc's distinct 8-grams appear anywhere in the eval
    // set (Brown et al. 2020 App. C measure contamination as n-gram
    // overlap, not membership). Scale shape: the eval side collapses to
    // a DISTINCT gram set (eval suites are tiny -> broadcast semi join;
    // a giant eval set degrades to one gram-keyed shuffle), the train
    // side is one scan -> explode -> semi join -> doc_id agg with
    // map-side combine; the per-doc gram set is bounded by doc length.
    // Exact textual grams (d04's shingle construction), so the oracle
    // is full SQL — no hash scheme in the semantics.
    GQ("t25_contamination_frac",
      Some(s"""WITH tok AS (SELECT doc_id, $oracleTokens AS t FROM documents),
          sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 8 THEN
              list_transform(range(1, len(t) - 6), i -> t[i] || ' ' || t[i+1] || ' ' ||
                t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' ||
                t[i+6] || ' ' || t[i+7])
            ELSE [] END) AS sh FROM tok WHERE doc_id % 50 <> 0),
          ev AS (SELECT DISTINCT unnest(CASE WHEN len(t) >= 8 THEN
              list_transform(range(1, len(t) - 6), i -> t[i] || ' ' || t[i+1] || ' ' ||
                t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' ||
                t[i+6] || ' ' || t[i+7])
            ELSE [] END) AS g FROM tok WHERE doc_id % 50 = 0),
          exg AS (SELECT doc_id, unnest(sh) AS g FROM sh),
          hits AS (SELECT doc_id, COUNT(*) AS hits
                   FROM exg JOIN ev USING (g) GROUP BY 1)
        SELECT s.doc_id, CAST(len(s.sh) AS INT) AS n_grams,
               round(CAST(COALESCE(h.hits, 0) AS DOUBLE)
                 / greatest(len(s.sh), 1), 6) AS contamination
        FROM sh s LEFT JOIN hits h USING (doc_id)"""),
      (s, d) => {
        val k = 8
        val tr = docs(s, d).filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"),
            array_distinct(shingles(tokens(col("text")), k)).as("sh"))
        val ev = docs(s, d).filter(col("doc_id") % 50 === 0)
          .select(explode(array_distinct(shingles(tokens(col("text")), k))).as("g"))
          .distinct()
        val hits = tr.select(col("doc_id"), explode(col("sh")).as("g"))
          .join(ev, Seq("g"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("hits"))
        tr.select(col("doc_id"), size(col("sh")).as("n_grams"))
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams").cast(IntegerType).as("n_grams"),
            round(coalesce(col("hits"), lit(0L)).cast(DoubleType)
              / greatest(col("n_grams"), lit(1)), 6).as("contamination"))
      }),

    // n-gram NOVELTY — the inverse of t25's contamination: the share of
    // a document's distinct 8-grams that appear in NO other document
    // (df = 1 across the corpus). High novelty = unique content worth
    // keeping; near-zero = boilerplate already covered elsewhere — the
    // doc-level complement of the span-level t14/t27 detectors. Scale:
    // one shuffle keyed on the gram for the df count (at 100 TB the
    // gram key becomes the d09 128-bit hash — 16-byte shuffle keys,
    // same result since only equality is used; exact strings kept here
    // for oracle parity), then a semi-join of the singleton grams back
    // to the per-doc gram list. Gram keys are near-unique so the
    // df shuffle has no skew by construction.
    GQ("t34_ngram_novelty",
      Some(s"""WITH tok AS (SELECT doc_id, $oracleTokens AS t FROM documents),
          sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 8 THEN
              list_transform(range(1, len(t) - 6), i -> t[i] || ' ' || t[i+1] || ' ' ||
                t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' ||
                t[i+6] || ' ' || t[i+7])
            ELSE [] END) AS sh FROM tok),
          exg AS (SELECT doc_id, unnest(sh) AS g FROM sh),
          df AS (SELECT g, COUNT(*) AS df FROM exg GROUP BY 1),
          u AS (SELECT doc_id, COUNT(*) AS n_unique FROM exg
                JOIN df USING (g) WHERE df = 1 GROUP BY 1)
        SELECT s.doc_id, CAST(len(s.sh) AS INT) AS n_grams,
               round(CAST(COALESCE(u.n_unique, 0) AS DOUBLE)
                 / greatest(len(s.sh), 1), 6) AS novelty
        FROM sh s LEFT JOIN u USING (doc_id)"""),
      (s, d) => {
        val sh = docs(s, d).select(col("doc_id"),
          array_distinct(shingles(tokens(col("text")), 8)).as("sh"))
        val exg = sh.select(col("doc_id"), explode(col("sh")).as("g"))
        val singletons = exg.groupBy("g").agg(count(lit(1)).as("df"))
          .filter(col("df") === 1).select("g")
        val u = exg.join(singletons, Seq("g"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_unique"))
        sh.select(col("doc_id"), size(col("sh")).as("n_grams"))
          .join(u, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams").cast(IntegerType).as("n_grams"),
            round(coalesce(col("n_unique"), lit(0L)).cast(DoubleType)
              / greatest(col("n_grams"), lit(1)), 6).as("novelty"))
      }),

    // Length-vs-lexical-diversity correlation — the curation-bias
    // diagnostic ("do longer documents just repeat more?"): per
    // language, Pearson corr between n_chars and the distinct-word
    // ratio in integer MICRO-UNITS. All five moments are pure-integer
    // sums (the ratio is floor-divided to micros first — a raw a/b
    // double fed through the decimal-sum cast was observed to split
    // engines by an ulp, and round(a/b, 6) can land on true halfway
    // ties since a/b is rational); the only float math is the final
    // corr expression, identical text both sides, emitted via tie-free
    // floor — with every n*moment PRODUCT taken in double (r12: the
    // long product n*syy overflows 2^63 at sf1's 5000 docs/lang with
    // micro-unit y — both engines' integer multiply ERRORS there;
    // double-first is overflow-free at any corpus and bit-identical at
    // gate scale, where the products sat below 2^53 and the double
    // product of two exactly-represented factors is the same correctly
    // rounded value the long-then-cast path produced). |langs| rows;
    // one scan + one tiny aggregate.
    GQ("t36_length_diversity_corr",
      Some(s"""WITH tok AS (SELECT lang, n_chars, $oracleTokens AS t FROM documents),
          v AS (SELECT lang, n_chars AS x,
                  len(list_distinct(t)) * 1000000 // greatest(len(t), 1) AS y
                FROM tok),
          g AS (SELECT lang, COUNT(*) AS n,
                  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx,
                  CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(y * y) AS BIGINT) AS syy,
                  CAST(SUM(x * y) AS BIGINT) AS sxy
                FROM v GROUP BY 1)
        SELECT lang, n,
               CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
                 (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                 * 1000000) AS DOUBLE) / 1e6 AS corr_len_diversity
        FROM g"""),
      (s, d) => {
        val tok = tokens(col("text"))
        val v = docs(s, d).select(col("lang"),
            col("n_chars").as("x"),
            (size(array_distinct(tok)).cast(LongType) * 1000000L).as("dnum"),
            greatest(size(tok), lit(1)).cast(LongType).as("dden"))
          .select(col("lang"), col("x"), expr("dnum div dden").as("y"))
        val g = v.groupBy("lang").agg(count(lit(1)).as("n"),
          sum("x").cast(LongType).as("sx"),
          sum(col("x") * col("x")).cast(LongType).as("sxx"),
          sum("y").cast(LongType).as("sy"),
          sum(col("y") * col("y")).cast(LongType).as("syy"),
          sum(col("x") * col("y")).cast(LongType).as("sxy"))
        g.select(col("lang"), col("n"),
          (floor((col("n").cast(DoubleType) * col("sxy")
              - col("sx").cast(DoubleType) * col("sy")) /
            (sqrt(col("n").cast(DoubleType) * col("sxx")
              - col("sx").cast(DoubleType) * col("sx"))
              * sqrt(col("n").cast(DoubleType) * col("syy")
                - col("sy").cast(DoubleType) * col("sy")))
            * 1000000).cast(DoubleType) / 1e6)
            .as("corr_len_diversity"))
      }),

    // Term burstiness — variance-to-mean ratio of per-document counts
    // for the 20 highest-df terms (Church & Gale: content words burst,
    // function words are Poisson-ish, VMR ~ 1). Zero-docs enter the
    // moments through the corpus size N (s and ssq only need occurring
    // docs). All moments are exact integer sums; the one double VMR
    // expression is identical text both sides, floor-emitted
    // (micro-units) — no rational round ties. The per-(term, doc)
    // count shuffle is the t10/t11 vocabulary discipline; top-20 by
    // (df desc, term) is a deterministic 20-row TakeOrdered.
    GQ("t37_term_burstiness",
      Some(s"""WITH tok AS (SELECT doc_id, unnest($oracleTokens) AS term FROM documents),
          cnt AS (SELECT term, doc_id, COUNT(*) AS c FROM tok GROUP BY 1, 2),
          top AS (SELECT term, COUNT(*) AS df, CAST(SUM(c) AS BIGINT) AS s,
                    CAST(SUM(c * c) AS BIGINT) AS ssq
                  FROM cnt GROUP BY 1 ORDER BY df DESC, term LIMIT 20),
          nd AS (SELECT COUNT(*) AS nn FROM documents)
        SELECT term, df, s AS tf,
               CAST(floor(((CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * s / nn)
                 / (nn - 1)) / (CAST(s AS DOUBLE) / nn) * 1000000)
                 AS DOUBLE) / 1e6 AS vmr
        FROM top CROSS JOIN nd"""),
      (s, d) => {
        val cnt = docs(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
          .groupBy("term", "doc_id").agg(count(lit(1)).as("c"))
        val top = cnt.groupBy("term")
          .agg(count(lit(1)).as("df"), sum("c").cast(LongType).as("s"),
            sum(col("c") * col("c")).cast(LongType).as("ssq"))
          .orderBy(col("df").desc, col("term")).limit(20)
        val nd = docs(s, d).agg(count(lit(1)).as("nn"))
        top.crossJoin(broadcast(nd))
          .select(col("term"), col("df"), col("s").as("tf"),
            (floor(((col("ssq").cast(DoubleType)
                - col("s").cast(DoubleType) * col("s") / col("nn"))
              / (col("nn") - 1))
              / (col("s").cast(DoubleType) / col("nn")) * 1000000)
              .cast(DoubleType) / 1e6).as("vmr"))
      }),

    // Language-ID confusion matrix — the classifier-audit rollup over
    // t01's heuristic vs the labeled lang column: count + per-label
    // recall share (exact micro-units) for every (actual, predicted)
    // cell. The marker-based guess is t01's exact expression on both
    // sides; the matrix aggregate is |langs|^2 rows.
    GQ("t38_langid_confusion",
      Some(s"""WITH g AS (SELECT lang, $oracleLangGuess AS pred
                 FROM (SELECT lang, $oracleTokens AS tok FROM documents)),
          c AS (SELECT lang, pred, COUNT(*) AS n FROM g GROUP BY 1, 2),
          t AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        SELECT lang, pred, n,
               CAST(n * 1000000 // tot AS DOUBLE) / 1e6 AS share
        FROM c JOIN t USING (lang)"""),
      (s, d) => {
        val g = docs(s, d)
          .select(col("lang"), langGuess(tokens(col("text"))).as("pred"))
        val c = g.groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        val t = c.groupBy("lang").agg(sum("n").cast(LongType).as("tot"))
        c.join(broadcast(t), "lang")
          .select(col("lang"), col("pred"), col("n"),
            (expr("(n * 1000000) div tot").cast(DoubleType) / 1e6).as("share"))
      }),

    // Source vocabulary divergence — the corpus-drift audit: each
    // source's usage distribution over the global top-50 terms, then
    // pairwise L1 distance between sources, ALL in integer micro-units
    // (term shares floor-divide; the L1 sum is a sum of integer
    // absolute differences — nothing to round, nothing to diverge). A
    // source pair with large L1 writes differently — a mixture-weight
    // or drift signal. The dense source x term matrix is |sources|*50
    // rows (a constant), so the pair join is bounded by construction.
    GQ("t39_vocab_divergence",
      Some(s"""WITH tok AS (SELECT source, unnest($oracleTokens) AS term FROM documents),
          tc AS (SELECT term, COUNT(*) AS n FROM tok GROUP BY 1),
          top AS (SELECT term FROM tc ORDER BY n DESC, term LIMIT 50),
          sc AS (SELECT source, term, COUNT(*) AS c FROM tok
                 JOIN top USING (term) GROUP BY 1, 2),
          st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM sc GROUP BY 1),
          p AS (SELECT source, term, c * 1000000 // tot AS pm
                FROM sc JOIN st USING (source)),
          m AS (SELECT s.source, t.term, COALESCE(p.pm, 0) AS pm
                FROM (SELECT DISTINCT source FROM documents) s
                CROSS JOIN top t
                LEFT JOIN p ON p.source = s.source AND p.term = t.term)
        SELECT a.source AS s1, b.source AS s2,
               CAST(SUM(abs(a.pm - b.pm)) AS BIGINT) AS l1_micros
        FROM m a JOIN m b ON a.term = b.term AND a.source < b.source
        GROUP BY 1, 2"""),
      (s, d) => {
        val tok = docs(s, d).select(col("source"),
          explode(tokens(col("text"))).as("term"))
        val top = tok.groupBy("term").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("term")).limit(50).select("term")
        val sc = tok.join(broadcast(top), "term")
          .groupBy("source", "term").agg(count(lit(1)).as("c"))
        val st = sc.groupBy("source").agg(sum("c").cast(LongType).as("tot"))
        val p = sc.join(broadcast(st), "source")
          .select(col("source"), col("term"), expr("(c * 1000000) div tot").as("pm"))
        val m = docs(s, d).select("source").distinct()
          .crossJoin(broadcast(top))
          .join(p, Seq("source", "term"), "left")
          .select(col("source"), col("term"), coalesce(col("pm"), lit(0L)).as("pm"))
        m.as("a").join(m.as("b"),
            col("a.term") === col("b.term") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
          .agg(sum(abs(col("a.pm") - col("b.pm"))).cast(LongType).as("l1_micros"))
      }),

    // Numeric-token density — the tables/boilerplate facet (price
    // lists, logs, and serial dumps are number-heavy; prose is not):
    // per source, share of tokens that are pure digit runs, in exact
    // micro-units. One scan, one |sources|-row aggregate; the regex is
    // anchored-full-match on both engines.
    GQ("t40_numeric_density",
      Some(s"""WITH tok AS (SELECT source, unnest($oracleTokens) AS term FROM documents)
        SELECT source, COUNT(*) AS n_tokens,
               CAST(SUM(CASE WHEN regexp_full_match(term, '[0-9]+')
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric,
               CAST(SUM(CASE WHEN regexp_full_match(term, '[0-9]+')
                 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS DOUBLE) / 1e6
                 AS numeric_share
        FROM tok GROUP BY 1"""),
      (s, d) => docs(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("term"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("term").rlike("^[0-9]+$"), 1L).otherwise(0L))
            .as("n_numeric"))
        .select(col("source"), col("n_tokens"), col("n_numeric"),
          (expr("(n_numeric * 1000000) div n_tokens").cast(DoubleType) / 1e6)
            .as("numeric_share"))),

    // Language-mix entropy per source — the mixture-uniformity
    // diagnostic (0 = monolingual source, ln(5) = uniform over the 5
    // langs). Per-term contributions -p*ln(p) are pre-rounded to 6dp
    // and summed through DECIMAL (the t18 discipline; ln of a rational
    // is irrational, so a 7th-digit halfway tie cannot occur). The
    // aggregate is over the |source| x |lang| rollup — nothing scales
    // with doc count after the first groupBy.
    GQ("t41_lang_entropy",
      Some(s"""WITH c AS (SELECT source, lang, COUNT(*) AS n
                 FROM documents GROUP BY 1, 2),
          t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        SELECT source, CAST(COUNT(*) AS INT) AS n_langs,
               ${GQ.osum("round(-(CAST(n AS DOUBLE) / tot) * ln(CAST(n AS DOUBLE) / tot), 6)")}
                 AS lang_entropy
        FROM c JOIN t USING (source) GROUP BY source"""),
      (s, d) => {
        val c = docs(s, d).groupBy("source", "lang").agg(count(lit(1)).as("n"))
        val t = c.groupBy("source").agg(sum("n").cast(LongType).as("tot"))
        val p = col("n").cast(DoubleType) / col("tot")
        c.join(broadcast(t), "source")
          .groupBy("source")
          .agg(count(lit(1)).cast(IntegerType).as("n_langs"),
            Engine.dsum(round(-p * log(p), 6)).as("lang_entropy"))
      }),

    // Type-token ratio + hapax-legomena share per source — the lexical-
    // diversity dual of t31's Zipf slope: TTR says how wide the
    // vocabulary is relative to volume (low = template/bot text),
    // hapax share says how heavy the singleton tail is (high = noisy
    // OCR/IDs, low = tight controlled vocabulary). Pure integers end
    // to end (micro-unit floor division, no rounding ties possible).
    // Scale: one (source, token) rollup shuffle collapses the token
    // stream map-side; the per-source reduction is |vocab| rows per
    // source, and output is |sources|.
    GQ("t42_ttr_hapax",
      Some(s"""WITH tok AS (SELECT source, unnest($oracleTokens) AS token FROM documents),
          tc AS (SELECT source, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
          s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
                       CAST(SUM(c) AS BIGINT) AS total,
                       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                         AS hapax
                FROM tc GROUP BY 1)
        SELECT source, CAST(vocab AS INT) AS vocab,
               total AS n_tokens,
               CAST((vocab * 1000000) // total AS DOUBLE) / 1e6 AS ttr,
               CAST((hapax * 1000000) // vocab AS DOUBLE) / 1e6 AS hapax_share
        FROM s"""),
      (s, d) => {
        val tc = docs(s, d)
          .select(col("source"), explode(tokens(col("text"))).as("token"))
          .groupBy("source", "token").agg(count(lit(1)).as("c"))
        tc.groupBy("source")
          .agg(count(lit(1)).as("vocab"), sum("c").cast(LongType).as("total"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).cast(LongType).as("hapax"))
          .select(col("source"), col("vocab").cast(IntegerType).as("vocab"),
            col("total").as("n_tokens"),
            (expr("(vocab * 1000000) div total").cast(DoubleType) / 1e6).as("ttr"),
            (expr("(hapax * 1000000) div vocab").cast(DoubleType) / 1e6)
              .as("hapax_share"))
      }),

    // Positional bias of the most frequent terms — where in a document
    // does each head term first appear? Navigation/boilerplate tokens
    // front-load (mean relative position near 0), content terms spread
    // uniformly (~0.5): a cheap template-structure probe. First
    // occurrence via array_position on the per-doc token array (no
    // explode of all positions), the relative position an exact
    // integer floor division emitted as a 6dp double, averaged through
    // DECIMAL. The top-10 head-term table broadcasts (10 rows); the
    // per-doc scan is one pass.
    GQ("t44_positional_bias",
      Some(s"""WITH tok AS (SELECT doc_id, $oracleTokens AS tok FROM documents),
          dt AS (SELECT DISTINCT doc_id, unnest(tok) AS term FROM tok),
          top AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM dt
                  GROUP BY 1 ORDER BY df DESC, term LIMIT 10),
          px AS (SELECT t.term, t.df, list_position(k.tok, t.term) AS pos,
                   len(k.tok) AS n_tok
                 FROM tok k CROSS JOIN top t)
        SELECT term, df AS n_docs,
               ${GQ.oavg("CAST(((pos - 1) * 1000000) // n_tok AS DOUBLE) / 1e6")}
                 AS mean_rel_pos
        FROM px WHERE pos >= 1
        GROUP BY term, df"""),
      (s, d) => {
        val toks = docs(s, d)
          .select(col("doc_id"), tokens(col("text")).as("tok"))
          .withColumn("n_tok", size(col("tok")))
        // r19: (doc_id, term) distinct is doc-local (the t14/t43
        // discipline) — array_distinct in the projection, one fewer
        // corpus-wide exchange, identical df counts
        val top = toks
          .select(col("doc_id"), explode(array_distinct(col("tok"))).as("term"))
          .groupBy("term").agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("term")).limit(10)
        toks.crossJoin(broadcast(top))
          .select(col("term"), col("df"),
            expr("array_position(tok, term)").as("pos"), col("n_tok"))
          .filter(col("pos") > 0)
          .groupBy("term", "df")
          .agg(Engine.davg(
            expr("((pos - 1) * 1000000) div n_tok").cast(DoubleType) / 1e6)
            .as("mean_rel_pos"))
          .select(col("term"), col("df").as("n_docs"), col("mean_rel_pos"))
      }),

    // PMI collocations — pointwise mutual information over document-
    // level co-occurrence (Church & Hanks 1990), the standard
    // collocation / template-phrase miner: pairs with high PMI travel
    // together far more than chance, flagging boilerplate frames. The
    // per-doc pair explode is bounded by (distinct terms per doc choose
    // 2) — a function of DOC LENGTH, not corpus size (the q69 bounded
    // self-join class) — and the aggregate is keyed on term pairs,
    // bounded by vocab². PMI's ln runs on one exact-integer rational
    // (products < 2^53), identical text both engines, pinned at 6dp;
    // the n_ab >= 5 support floor keeps rare-pair noise (and any
    // near-boundary values) out.
    GQ("t43_pmi_collocations",
      Some(s"""WITH dt AS (SELECT DISTINCT doc_id, unnest($oracleTokens) AS term
                 FROM documents),
          nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM dt),
          tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY 1),
          pc AS (SELECT a.term AS term_a, b.term AS term_b,
                   CAST(COUNT(*) AS BIGINT) AS n_ab
                 FROM dt a JOIN dt b ON a.doc_id = b.doc_id
                                    AND a.term < b.term
                 GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        SELECT term_a, term_b, n_ab,
               round(ln(CAST(n_ab AS DOUBLE) * n
                        / (CAST(ta.df AS DOUBLE) * tb.df)), 6) AS pmi
        FROM pc JOIN tc ta ON term_a = ta.term
                JOIN tc tb ON term_b = tb.term
                CROSS JOIN nd"""),
      (s, d) => {
        // r19 (the t14 doc-local-distinct discipline): distinct
        // (doc_id, term) pairs dedupe inside the scan — array_distinct
        // replaces the corpus-wide .distinct() exchange on every one of
        // dt's four consumers; identical multiset.
        val dt = docs(s, d)
          .select(col("doc_id"),
            explode(array_distinct(tokens(col("text")))).as("term"))
        val nd = dt.agg(countDistinct("doc_id").as("n"))
        val tc = dt.groupBy("term").agg(count(lit(1)).as("df"))
        val a = dt.toDF("doc_id", "term_a")
        val b = dt.toDF("doc_id2", "term_b")
        a.join(b, col("doc_id") === col("doc_id2") &&
            col("term_a") < col("term_b"))
          .groupBy("term_a", "term_b")
          .agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 5)
          .join(broadcast(tc.toDF("ta", "df_a")), col("term_a") === col("ta"))
          .join(broadcast(tc.toDF("tb", "df_b")), col("term_b") === col("tb"))
          .crossJoin(broadcast(nd))
          .select(col("term_a"), col("term_b"), col("n_ab"),
            round(log(col("n_ab").cast(DoubleType) * col("n") /
              (col("df_a").cast(DoubleType) * col("df_b"))), 6).as("pmi"))
      }),

    // repeated-substring SPANS — the character-level duplicated-content
    // detector (Lee et al. 2022's ExactSubstr motivation, gram-windowed
    // instead of suffix-arrayed: 32-char windows at stride 16, a window
    // text occurring at >1 (doc, pos) marks its span duplicated;
    // adjacent/overlapping hit windows merge per doc via gaps-and-
    // islands). Distinct from t14 (LINE-level dedup): this catches
    // boilerplate that crosses line boundaries or rides inside longer
    // lines. Scale shape: the window explode is ~|text|/stride rows per
    // doc (narrow: 32-char gram + two ints), ONE shuffle on the gram
    // for the duplicate filter, and the island merge windows are
    // bounded by doc_len/stride rows per doc — never a corpus-wide
    // sort. Exact textual semantics -> full SQL oracle.
    GQ("t27_repeated_spans",
      Some("""WITH base AS (SELECT doc_id, text FROM documents WHERE length(text) >= 32),
          w AS (SELECT doc_id, CAST(i AS INT) AS pos,
                  substring(text, CAST(i AS INT), 32) AS g
                FROM base, LATERAL (SELECT unnest(range(1, length(text) - 30, 16)) AS i)),
          hits AS (SELECT doc_id, pos FROM w
                   WHERE g IN (SELECT g FROM w GROUP BY g HAVING COUNT(*) > 1)),
          flags AS (SELECT doc_id, pos,
                     CASE WHEN pos - COALESCE(LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                       -100000) > 32 THEN 1 ELSE 0 END AS f FROM hits),
          isl AS (SELECT doc_id, pos,
                   SUM(f) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS island FROM flags)
        SELECT doc_id, CAST(MIN(pos) AS INT) AS span_start,
               CAST(MAX(pos) + 31 AS INT) AS span_end,
               CAST(MAX(pos) + 32 - MIN(pos) AS INT) AS span_len
        FROM isl GROUP BY doc_id, island"""),
      (s, d) => {
        val L = 32
        val stride = 16
        val base = docs(s, d).filter(length(col("text")) >= L)
        val w = base
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(1), length(col("text")) - (L - 1), lit(stride)))
              .as("pos"))
          .select(col("doc_id"), col("pos"),
            expr(s"substring(text, pos, $L)").as("g"))
        val dup = w.groupBy("g").agg(count(lit(1)).as("c")).filter(col("c") > 1)
        val hits = w.join(dup.select("g"), Seq("g"), "left_semi")
        val byPos = Window.partitionBy("doc_id").orderBy("pos")
        val flags = hits.withColumn("f",
          when(col("pos") - coalesce(lag(col("pos"), 1).over(byPos),
            lit(-100000)) > L, 1).otherwise(0))
        flags
          .withColumn("island",
            sum(col("f")).over(byPos.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .groupBy("doc_id", "island")
          .agg(min(col("pos")).cast(IntegerType).as("span_start"),
            (max(col("pos")) + (L - 1)).cast(IntegerType).as("span_end"),
            (max(col("pos")) + L - min(col("pos"))).cast(IntegerType).as("span_len"))
          .select("doc_id", "span_start", "span_end", "span_len")
      }),

    // Multinomial Naive Bayes trained in-plan (the fastText-style
    // quality/language classifier shape, closed-form instead of SGD):
    // class-conditional token counts with add-one smoothing, doc scored
    // as prior + sum(tf * log-likelihood), argmax over classes. Every
    // log term is pre-rounded to 6dp and aggregated through DECIMAL, so
    // the class scores are EXACT rationals — the argmax cannot diverge
    // across engines (the t18 lesson, applied from day one here).
    // Output is the (lang, pred, cnt) confusion matrix.
    //
    // 100 TB shape: the model is two vocab-bounded tables (class-token
    // counts, |classes|-row constants) joined distributively — no
    // driver state; the class expansion multiplies the per-doc tf table
    // by |classes| (a task parameter, ~dozens at most) before one
    // groupBy(doc_id, clang) with map-side combine; the final argmax
    // window partitions by doc_id over exactly |classes| rows. Train
    // and score run in the same plan, like t13/t22.
    //
    // The statistics subplans re-tokenize the corpus rather than share
    // a materialized postings table — a MEASURED choice, not an
    // oversight: at sf0.1 the recompute form benches 1.8 s vs 2.3 s
    // for a localCheckpoint'd postings table and worse for cache()
    // (tools A/B, round 8; same ordering for t13/t18/t22). Scans of
    // this shape are cheap relative to materialization overhead;
    // d05-style materialize-once pays off for ITERATIVE consumers or
    // expensive upstream joins, not for flat re-scans. At true corpus
    // scale the dial is one line (.localCheckpoint() on the tf table).
    GQ("t28_nb_lang_classifier",
      Some(s"""WITH tok AS (SELECT doc_id, lang, unnest($oracleTokens) AS token FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        ct AS (SELECT lang AS clang, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        tot AS (SELECT clang, SUM(c) AS tot FROM ct GROUP BY 1),
        vocab AS (SELECT COUNT(DISTINCT token) AS v FROM tok),
        nd AS (SELECT lang AS clang, COUNT(*) AS nd FROM documents GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        classes AS (SELECT clang,
                      CAST(round(ln(CAST(nd AS DOUBLE) / n), 6) AS DECIMAL(38,10)) AS prior,
                      tot, v
                    FROM nd CROSS JOIN n JOIN tot USING (clang) CROSS JOIN vocab),
        ds AS (SELECT f.doc_id, k.clang,
                      SUM(f.tf * CAST(round(ln((COALESCE(ct.c, 0) + 1)
                        / CAST(k.tot + k.v AS DOUBLE)), 6) AS DECIMAL(38,10))) AS s
               FROM tf f CROSS JOIN classes k
               LEFT JOIN ct ON ct.clang = k.clang AND ct.token = f.token
               GROUP BY 1, 2),
        sc AS (SELECT d.doc_id, d.lang, k.clang,
                      k.prior + COALESCE(ds.s, 0) AS score
               FROM documents d CROSS JOIN classes k
               LEFT JOIN ds ON ds.doc_id = d.doc_id AND ds.clang = k.clang),
        pick AS (SELECT doc_id, lang, clang AS pred,
                        ROW_NUMBER() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, clang) AS rn
                 FROM sc)
        SELECT lang, pred, COUNT(*) AS cnt FROM pick WHERE rn = 1
        GROUP BY lang, pred"""),
      (s, d) => {
        val base = docs(s, d)
        val (ct, classes) = nbTrain(base)
        nbScore(base, ct, classes)
          .groupBy(col("lang"), col("pred"))
          .agg(count(lit(1)).as("cnt"))
      }),

    // Out-of-vocabulary rate against an in-plan trained top-K
    // vocabulary — the standard tokenizer-coverage / garbage filter
    // (a doc whose tokens mostly miss the corpus vocabulary is noise,
    // OCR junk, or the wrong language). The vocabulary is a
    // TakeOrdered of K rows with a total order (count desc, token) —
    // driver/broadcast-bounded by the PARAMETER K, never corpus size;
    // scoring is one scan + a broadcast left join + a per-doc
    // aggregate with map-side combine. The rate is exact integer
    // micro-units (floor div) — no float rounding (g01/g02 rule).
    GQ("t29_oov_rate",
      Some(s"""WITH tok AS (SELECT doc_id, unnest($oracleTokens) AS token FROM documents),
        v AS (SELECT token FROM (SELECT token, COUNT(*) AS c FROM tok
              GROUP BY token ORDER BY c DESC, token LIMIT 1000))
        SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
               CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS INT)
                 AS oov_cnt,
               CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                 * 1000000 // COUNT(*) AS DOUBLE) / 1e6 AS oov_rate
        FROM tok LEFT JOIN v ON tok.token = v.token
        GROUP BY doc_id"""),
      (s, d) => {
        val tok = docs(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        val vocab = tok.groupBy("token").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("token")).limit(1000)
          .select(col("token"), lit(1).as("iv"))
        tok.join(broadcast(vocab), Seq("token"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("iv").isNull, 1L).otherwise(0L)).as("oov_cnt"))
          .select(col("doc_id"),
            col("n_tokens").cast(IntegerType).as("n_tokens"),
            col("oov_cnt").cast(IntegerType).as("oov_cnt"),
            (expr("(oov_cnt * 1000000) div n_tokens").cast(DoubleType) / 1e6)
              .as("oov_rate"))
      }),

    // Corpus report card — the per-(source, lang) health rollup a
    // curation team runs nightly: document counts, exact mean length,
    // exact mean whitespace-token count, and how many documents sit in
    // an exact-dup fingerprint group. Pure composition of existing
    // signals (t03 tokens, t04 fingerprint) into ONE scan + the
    // fingerprint aggregate + a broadcast semi join of the (small)
    // dup-group set; means are integer micro-units (floor div) so the
    // report is engine-exact. The output is |sources| x |langs| rows —
    // dashboard-sized at any corpus scale.
    GQ("t30_corpus_report", {
      val fp = """md5(trim(regexp_replace(regexp_replace(lower(text),
        '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))"""
      Some(s"""WITH d AS (SELECT doc_id, source, lang, n_chars,
               len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
                 AS wt,
               $fp AS fp
             FROM documents),
        dupg AS (SELECT fp FROM d GROUP BY fp HAVING COUNT(*) > 1)
        SELECT source, lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) * 1000000 // COUNT(*) AS DOUBLE) / 1e6
                 AS avg_chars,
               CAST(SUM(wt) * 1000000 // COUNT(*) AS DOUBLE) / 1e6
                 AS avg_ws_tokens,
               CAST(SUM(CASE WHEN dupg.fp IS NULL THEN 0 ELSE 1 END) AS INT)
                 AS dup_docs
        FROM d LEFT JOIN dupg ON d.fp = dupg.fp
        GROUP BY source, lang""")
    },
      (s, d) => {
        val base = docs(s, d).select(col("doc_id"), col("source"),
          col("lang"), col("n_chars"),
          size(filter(split(col("text"), "\\s+"), x => x =!= ""))
            .cast(LongType).as("wt"),
          fingerprint(col("text")).as("fp"))
        val dupg = base.groupBy("fp").agg(count(lit(1)).as("nfp"))
          .filter(col("nfp") > 1).select(col("fp"), lit(1).as("dup"))
        base.join(broadcast(dupg), Seq("fp"), "left")
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("n_docs"),
            (expr("(sum(n_chars) * 1000000) div count(1)").cast(DoubleType)
              / 1e6).as("avg_chars"),
            (expr("(sum(wt) * 1000000) div count(1)").cast(DoubleType)
              / 1e6).as("avg_ws_tokens"),
            sum(when(col("dup").isNull, 0).otherwise(1)).cast(IntegerType)
              .as("dup_docs"))
      }),

    // Vocabulary Zipf-slope diagnostic: OLS slope of ln(freq) on
    // ln(rank) over the top-100 vocabulary — natural corpora sit near
    // -1; a flat slope flags template spam, a cliff flags truncation.
    // Every point is an exact MILLI-unit integer (floor of an
    // IEEE-identical ln x 1e3), so all OLS sums and products stay
    // below 2^53: the two final int->double conversions are exact and
    // the single division is IEEE-identical — no decimal downcast, no
    // halfway ties. The vocabulary is a total-order TakeOrdered of
    // 100 rows; the OLS reduction is over those 100 points — the whole
    // statistic costs one vocab aggregation at any corpus scale.
    GQ("t31_zipf_slope",
      Some(s"""WITH tok AS (SELECT unnest($oracleTokens) AS token FROM documents),
        vocab AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token
                  ORDER BY c DESC, token LIMIT 100),
        pts AS (SELECT
            CAST(floor(ln(CAST(ROW_NUMBER() OVER (ORDER BY c DESC, token)
              AS DOUBLE)) * 1000) AS BIGINT) AS x,
            CAST(floor(ln(CAST(c AS DOUBLE)) * 1000) AS BIGINT) AS y
          FROM vocab),
        a AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x * y) AS BIGINT) AS sxy,
                     CAST(SUM(x * x) AS BIGINT) AS sxx FROM pts)
        SELECT CAST(n AS INT) AS n_terms,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope
        FROM a"""),
      (s, d) => {
        val vocab = docs(s, d)
          .select(explode(tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("token")).limit(100)
        val pts = vocab.select(
          floor(log(row_number().over(
            Window.orderBy(col("c").desc, col("token"))).cast(DoubleType))
            * 1000).cast(LongType).as("x"),
          floor(log(col("c").cast(DoubleType)) * 1000).cast(LongType).as("y"))
        pts.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("n").cast(IntegerType).as("n_terms"),
            round((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast(DoubleType)
              / (col("n") * col("sxx") - col("sx") * col("sx"))
                .cast(DoubleType), 6).as("slope"))
      }),

    // NB confidence margin — the active-learning / quality-triage
    // signal on top of t28: per doc, the top class and its DECIMAL-
    // exact score gap to the runner-up (small margin = ambiguous
    // document worth routing to review). Scores are 6dp-exact
    // decimals, so the margin emits through the decOut contract with
    // no engine divergence; the two-row-per-doc pick rides the same
    // bounded |classes|-row window as t28.
    GQ("t32_nb_margin",
      Some(s"""WITH tok AS (SELECT doc_id, lang, unnest($oracleTokens) AS token FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        ct AS (SELECT lang AS clang, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        tot AS (SELECT clang, SUM(c) AS tot FROM ct GROUP BY 1),
        vocab AS (SELECT COUNT(DISTINCT token) AS v FROM tok),
        nd AS (SELECT lang AS clang, COUNT(*) AS nd FROM documents GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        classes AS (SELECT clang,
                      CAST(round(ln(CAST(nd AS DOUBLE) / n), 6) AS DECIMAL(38,10)) AS prior,
                      tot, v
                    FROM nd CROSS JOIN n JOIN tot USING (clang) CROSS JOIN vocab),
        ds AS (SELECT f.doc_id, k.clang,
                      SUM(f.tf * CAST(round(ln((COALESCE(ct.c, 0) + 1)
                        / CAST(k.tot + k.v AS DOUBLE)), 6) AS DECIMAL(38,10))) AS s
               FROM tf f CROSS JOIN classes k
               LEFT JOIN ct ON ct.clang = k.clang AND ct.token = f.token
               GROUP BY 1, 2),
        sc AS (SELECT d.doc_id, k.clang,
                      k.prior + COALESCE(ds.s, 0) AS score,
                      ROW_NUMBER() OVER (PARTITION BY d.doc_id
                        ORDER BY k.prior + COALESCE(ds.s, 0) DESC, k.clang) AS rn
               FROM documents d CROSS JOIN classes k
               LEFT JOIN ds ON ds.doc_id = d.doc_id AND ds.clang = k.clang)
        SELECT p1.doc_id, p1.clang AS pred,
               CAST(CAST(p1.score - p2.score AS DECIMAL(38,6)) AS DOUBLE)
                 AS margin
        FROM sc p1 JOIN sc p2
          ON p1.doc_id = p2.doc_id AND p1.rn = 1 AND p2.rn = 2"""),
      (s, d) => {
        val base = docs(s, d)
        val (ct, classes) = nbTrain(base)
        nbMargins(base, ct, classes)
      }),

    // Train/validation split drift — the distribution-shift audit for
    // a deterministic content-hash split (the t05 criterion): per
    // source, each half's token-mass share and the absolute share
    // drift, all in exact integer micro-units (a large drift on any
    // source means the split is not exchangeable for that slice). One
    // scan + a |sources|-row aggregate + one-row totals — audit-sized
    // output at any corpus scale.
    GQ("t33_split_drift",
      Some("""WITH t AS (SELECT source,
                 substring(md5(text), 1, 2) < '80' AS ina,
                 CAST(len(list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '')) AS BIGINT) AS n
               FROM documents),
        agg AS (SELECT source,
                 CAST(SUM(CASE WHEN ina THEN n ELSE 0 END) AS BIGINT) AS ta,
                 CAST(SUM(CASE WHEN NOT ina THEN n ELSE 0 END) AS BIGINT) AS tb
               FROM t GROUP BY source),
        tot AS (SELECT CAST(SUM(ta) AS BIGINT) AS qa,
                       CAST(SUM(tb) AS BIGINT) AS qb FROM agg)
        SELECT source, ta, tb,
               CAST(ta * 1000000 // qa AS DOUBLE) / 1e6 AS share_a,
               CAST(tb * 1000000 // qb AS DOUBLE) / 1e6 AS share_b,
               CAST(abs(ta * 1000000 // qa - tb * 1000000 // qb) AS DOUBLE)
                 / 1e6 AS drift
        FROM agg CROSS JOIN tot"""),
      (s, d) => {
        val t = docs(s, d).select(col("source"),
          (substring(md5(col("text").cast(BinaryType)), 1, 2) < "80")
            .as("ina"),
          size(filter(split(col("text"), "\\s+"), x => x =!= ""))
            .cast(LongType).as("n"))
        val agg = t.groupBy("source").agg(
          sum(when(col("ina"), col("n")).otherwise(0L)).as("ta"),
          sum(when(!col("ina"), col("n")).otherwise(0L)).as("tb"))
        val tot = agg.agg(sum("ta").as("qa"), sum("tb").as("qb"))
        agg.crossJoin(broadcast(tot))
          .select(col("source"), col("ta"), col("tb"),
            (expr("(ta * 1000000) div qa").cast(DoubleType) / 1e6)
              .as("share_a"),
            (expr("(tb * 1000000) div qb").cast(DoubleType) / 1e6)
              .as("share_b"),
            (abs(expr("(ta * 1000000) div qa - (tb * 1000000) div qb"))
              .cast(DoubleType) / 1e6).as("drift"))
      })
  )

  /** Multinomial-NB training over (doc_id, lang, text): returns the t28
    * model as two DataFrames — classTokens (clang, token, c) and
    * classes (clang, prior DECIMAL, tot, v) — factored so Layout can
    * persist them as catalog tables (train once, score any slice
    * later; the serving-index story applied to models). */
  def nbTrain(base: DataFrame): (DataFrame, DataFrame) = {
    val DEC = DecimalType(38, 10)
    val tok = base.select(col("doc_id"), col("lang"),
      explode(tokens(col("text"))).as("token"))
    // r19 NOTE (the VERDICT item-4/5 regime question, measured and
    // answered RECOMPUTE): an ephemeral MEMORY_AND_DISK persist of ct
    // (vocab x |classes|-bounded output, corpus-priced tokenize build,
    // ~3 consumers) was tried behind graft.nb.cacheCt and LOST
    // order-independently at sf0.1 (t28 3.39/3.49 vs 2.40/2.67 s, t32
    // 3.12/2.57 vs 1.43/1.64 s — runtime ReusedExchange already serves
    // dense's two ct consumers from one execution, so the cache only
    // added a write + count + IMTS decodes) and TIED at sf10 (15.79 vs
    // 16.32 s). No measured scale where it wins -> recompute stays; at
    // true corpus scale the dial remains this one line.
    val ct = tok.groupBy(col("lang").as("clang"), col("token"))
      .agg(count(lit(1)).as("c"))
    val tot = ct.groupBy("clang").agg(sum("c").as("tot"))
    // r19: the vocabulary size derives from ct (every corpus token has
    // at least one (clang, token) row, so distinct tokens over ct ==
    // distinct tokens over the raw stream — same value), which lets
    // runtime exchange reuse serve tot AND vocab from ONE tokenization
    // instead of vocab paying its own corpus-wide count_distinct pass
    val vocab = ct.agg(count_distinct(col("token")).as("v"))
    val nDocs = base.agg(count(lit(1)).as("n"))
    val classes = base.groupBy(col("lang").as("clang"))
      .agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(nDocs))
      .join(tot, "clang")
      .crossJoin(broadcast(vocab))
      .select(col("clang"),
        round(log(col("nd").cast(DoubleType) / col("n")), 6).cast(DEC)
          .as("prior"),
        col("tot"), col("v"))
    (ct, classes)
  }

  /** Driver-collected NB class constants — ONE collect of the
    * `classes` subplan serving every consumer that previously ran it
    * separately (r18 optimization, guide §1.2/§5: the classes plan
    * embeds a full corpus tokenization — ct's token aggregation plus a
    * corpus-wide count_distinct — and the pre-r18 scoring path
    * collected it THREE times per query: the sorted class list, the
    * per-class out-of-vocabulary default w0, and the priors map were
    * three independent driver collects, i.e. three extra corpus passes
    * that at 100 TB are three full scans. All three now derive from
    * one collected row set; w0 is computed IN-PLAN in the same
    * projection (identical round6/DEC arithmetic, so values are
    * bit-identical), and the in-plan consumers (the dense model build,
    * the prior attach) read a local relation rebuilt from the same
    * rows — same values, zero recompute. |classes| is the bounded
    * centroid-k collect class. */
  private final case class NbClasses(
      clangs: IndexedSeq[String],
      priors: Map[String, java.math.BigDecimal],
      w0: Map[String, java.math.BigDecimal],
      local: DataFrame)

  private def collectClasses(classes: DataFrame): NbClasses = {
    val DEC = DecimalType(38, 10)
    val withW0 = classes.select(col("clang"), col("prior"), col("tot"),
      col("v"),
      round(log(lit(1L).cast(DoubleType)
        / (col("tot") + col("v")).cast(DoubleType)), 6)
        .cast(DEC).as("w0"))
    val rows = withW0.collect()
    val spark = classes.sparkSession
    val local = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), withW0.schema)
    NbClasses(
      rows.map(_.getString(0)).sorted.toIndexedSeq,
      rows.map(r => r.getString(0) -> r.getDecimal(1)).toMap,
      rows.map(r => r.getString(0) -> r.getDecimal(4)).toMap,
      local)
  }

  /** The full NB score table against an in-plan or persisted model:
    * one DECIMAL-exact class score per (doc, class). Split from
    * [[nbScore]] so margin/confidence consumers (t32) see all classes,
    * not just the argmax. */
  def nbClassScores(base: DataFrame, ct: DataFrame,
      classes: DataFrame): DataFrame =
    nbClassScoresWith(base, ct, collectClasses(classes))

  private def nbClassScoresWith(base: DataFrame, ct: DataFrame,
      k: NbClasses): DataFrame = {
    // Score ALL classes in ONE pass over the (doc, token, tf) stream
    // (r15, decade-3 find): the naive shape crossJoins tf with the
    // class table (|classes| x the stream = 750M rows at sf100) and —
    // because ct's corpus-scaled size estimate hid its vocabulary
    // bound — sort-merge-joined the model against that stream
    // (measured 11.7x on the 10x sf10 -> sf100 step). Instead the
    // MODEL is densified per token: class list collected (bounded by
    // |langs|, the centroid-k collect class), per-(token, class)
    // smoothed log-weights computed IN-PLAN (same round6/DEC
    // arithmetic — tokens absent from a class get the c=0 default, so
    // the left-join coalesce moves into the dense table), pivoted to
    // one weight column per class, and broadcast; scoring is then one
    // codegen'd hash aggregate of |classes| DECIMAL sums keyed by
    // doc_id alone, unpivoted afterward (|docs| x |classes| narrow
    // rows). DECIMAL sums are exact and order-independent, so the
    // regrouping is value-identical to the per-(doc, class) form —
    // measured at sf100: t28 148 -> 66-87 s, t32 192 -> 77-131 s
    // (run-to-run variance on the shared box is large at this size;
    // the bound is the 150M-row tf build + scoring pass either way).
    val (sums, clangs) = nbSums(base, ct, k)
    val stackArgs = clangs
      .map(c => s"'${c.replace("'", "''")}', `s_$c`").mkString(", ")
    val ds = sums.selectExpr("doc_id",
      s"stack(${clangs.length}, $stackArgs) AS (clang, s)")
    base.select(col("doc_id"), col("lang"))
      .crossJoin(broadcast(k.local.select("clang", "prior")))
      .join(ds, Seq("doc_id", "clang"), "left")
      .select(col("doc_id"), col("lang"), col("clang"),
        (col("prior") + coalesce(col("s"), lit(0))).as("score"))
  }

  /** t32's margin tail over [[nbClassScores]] — the top class and its
    * DECIMAL-exact score gap to the runner-up. Factored from the GQ
    * body (r16) so the sampled sf100 oracle can score a doc_id-sampled
    * slice with the FULL-corpus model: a margin depends only on the
    * model and the document itself (the per-doc independence argument
    * at [[nbScore]]), so row-local divergence reproduces in any
    * doc-sample. */
  def nbMargins(base: DataFrame, ct: DataFrame,
      classes: DataFrame): DataFrame = {
    // r18: top-2 selection is ROW-LOCAL over the per-class sum columns
    // — the same fold discipline nbScore adopted in r15 for the argmax,
    // extended to track (best, runner-up). The former stacked form
    // exploded |docs| x |classes| rows, ran a row_number window (a
    // full sort of that stream), filtered it twice and self-joined —
    // four operators whose cost all scales with docs x classes; the
    // fold is one projection over the one-pass per-doc sums frame.
    // Semantics are identical to row_number() OVER (ORDER BY score
    // DESC, clang) IN (1, 2): the fold walks classes in ascending
    // clang order with strict greater-than, so ties keep the smaller
    // clang for best AND runner-up; scores are exact DECIMALs, so
    // comparisons cannot diverge (MarginKernel parity pinned in
    // TextPipelineSpec; oracles unchanged). A <2-class corpus emits
    // zero rows, exactly like the former rn=2 inner join.
    val k = collectClasses(classes)
    val (sums, clangs) = nbSums(base, ct, k)
    if (clangs.length < 2)
      return base.sparkSession.emptyDataFrame
        .withColumn("doc_id", lit(0L)).withColumn("pred", lit(""))
        .withColumn("margin", lit(0.0)).limit(0)
        .select("doc_id", "pred", "margin")
    val zero = lit(new java.math.BigDecimal(0)).cast(DecimalType(38, 10))
    val cands = clangs.map(c => struct(
      (lit(k.priors(c)) + coalesce(col(s"`s_$c`"), zero)).as("score"),
      lit(c).as("clang")))
    val init = when(
      cands(1).getField("score") > cands(0).getField("score"),
      struct(cands(1).as("b"), cands(0).as("s")))
      .otherwise(struct(cands(0).as("b"), cands(1).as("s")))
    val top2 = cands.drop(2).foldLeft(init) { (acc, c) =>
      when(c.getField("score") > acc.getField("b").getField("score"),
        struct(c.as("b"), acc.getField("b").as("s")))
        .otherwise(
          when(c.getField("score") > acc.getField("s").getField("score"),
            struct(acc.getField("b").as("b"), c.as("s")))
            .otherwise(acc))
    }
    base.select(col("doc_id"))
      .join(sums, Seq("doc_id"), "left")
      .select(col("doc_id"), top2.as("t2"))
      .select(col("doc_id"), col("t2.b.clang").as("pred"),
        Engine.decOut(col("t2.b.score") - col("t2.s.score")).as("margin"))
  }

  /** One-pass per-doc class-sum columns + the sorted class list:
    * the shared scoring core of [[nbClassScores]] and [[nbScore]].
    * Takes the ONE-collect class constants ([[collectClasses]]) — the
    * class list, the w0 defaults, and the in-plan (clang, tot, v)
    * relation all come from the same collected rows. */
  private def nbSums(base: DataFrame, ct: DataFrame,
      k: NbClasses): (DataFrame, Seq[String]) = {
    val DEC = DecimalType(38, 10)
    // r19: row-local tf (tokenCounts RLE kernel) — the groupBy form
    // shuffled the corpus-sized (doc_id, token) stream for counts that
    // are doc-local; the multiset is identical (guide §8), so the
    // DECIMAL score sums downstream are value-unchanged
    val tf = base.select(col("doc_id"),
        explode(tokenCounts(tokens(col("text")))).as("tc"))
      .select(col("doc_id"), col("tc.token").as("token"),
        col("tc.tf").as("tf"))
    val clangs = k.clangs
    val dense = ct.select("token").distinct()
      .crossJoin(broadcast(k.local.select("clang", "tot", "v")))
      .join(ct, Seq("clang", "token"), "left")
      .select(col("token"), col("clang"),
        round(log((coalesce(col("c"), lit(0L)) + 1).cast(DoubleType)
          / (col("tot") + col("v")).cast(DoubleType)), 6).cast(DEC).as("w"))
    val wt = dense.groupBy("token")
      .pivot("clang", clangs.toIndexedSeq).agg(first(col("w")))
    // Out-of-vocabulary default (r16, judge r15 finding #1): a token
    // absent from the WHOLE vocabulary still contributes the smoothed
    // c=0 weight log(1/(tot_c+v_c)) — which differs PER CLASS, so the
    // r15 inner join's silent drop could flip an argmax on the
    // persisted-model serving path (Layout.nbClassify scoring future
    // documents with unseen tokens). The per-class defaults are
    // computed with the SAME in-plan arithmetic on the |classes|-row
    // frame and collected (the centroid-k bounded-collect class), then
    // coalesced in after a LEFT join. When the model trains on the
    // corpus being scored (every gated query) the vocabulary covers
    // all tokens and the coalesce never fires — committed oracles are
    // unchanged; the textbook semantics and the oracle SQL's
    // COALESCE(ct.c, 0) form are now matched on ANY scored slice.
    // (r18: w0 rides in the [[collectClasses]] row set — same in-plan
    // arithmetic, no second execution of the classes subplan.)
    val w0: Map[String, java.math.BigDecimal] = k.w0
    val sumCols = clangs.map(c =>
      sum(col("tf") * coalesce(col(s"`$c`"), lit(w0(c)).cast(DEC)))
        .as(s"s_$c"))
    (tf.join(broadcast(wt), Seq("token"), "left")
      .groupBy("doc_id").agg(sumCols.head, sumCols.tail: _*),
      clangs.toIndexedSeq)
  }

  /** NB scoring against an in-plan or persisted model: per-doc argmax
    * class with the DECIMAL-exact scores of t28. A document's score
    * depends only on the model and the document itself, so scoring a
    * slice with a full-corpus model gives exactly the full run's
    * predictions restricted to that slice (pinned in LayoutSpec).
    * Returns (doc_id, lang, pred).
    *
    * The argmax is ROW-LOCAL over the per-class sum columns (r15): a
    * left-to-right fold over the sorted class list with a strict
    * greater-than keeps the smallest clang on score ties — exactly
    * `row_number() OVER (ORDER BY score DESC, clang)` = 1 without the
    * |docs| x |classes| window sort the stacked form pays. Priors are
    * a driver-collected |classes|-bounded exact-DECIMAL map (the
    * centroid-k collect class); scores compare DECIMAL-exact. */
  def nbScore(base: DataFrame, ct: DataFrame, classes: DataFrame): DataFrame = {
    val k = collectClasses(classes)
    val (sums, clangs) = nbSums(base, ct, k)
    val priors: Map[String, java.math.BigDecimal] = k.priors
    val zero = lit(new java.math.BigDecimal(0)).cast(DecimalType(38, 10))
    val cands = clangs.map(c => struct(
      (lit(priors(c)) + coalesce(col(s"`s_$c`"), zero)).as("score"),
      lit(c).as("clang")))
    val best = cands.reduceLeft((a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a))
    base.select(col("doc_id"), col("lang"))
      .join(sums, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), best.getField("clang").as("pred"))
  }
}
