package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text primitives for the LLM-data-pipeline operators (new-build scope,
  * SURVEY §7.2 step 6). All are compositions of codegen'd builtins — no
  * UDFs — so they stay inside whole-stage codegen at 100 TB.
  *
  * The tokenizer is the single source of truth shared by dedup,
  * fingerprinting, language-ID and quality scoring; its oracle-SQL twin
  * (DuckDB) is kept literally alongside each definition so the two can
  * never drift.
  */
object TextFunctions {

  /** Lowercase word tokens: split on non-alphanumeric runs, drop empties.
    * Native one-pass kernel (functions.Tokens) — the HOF formulation
    * `filter(split(lower(x), "[^a-z0-9]+"), t => t <> "")` is evaluated
    * interpreted per element and dominated the dedup pipelines.
    * Oracle twin: list_filter(string_split_regex(lower(x),'[^a-z0-9]+'), t -> t <> '') */
  def tokens(text: Column): Column = GraftFunctions.tokensNative(text)

  /** Row-local (token, tf) pairs of a token array — the shuffle-free
    * tf table (r19, guide §8): token counts are doc-local, so
    * `select(doc_id, explode(tokenCounts(tokens(text))))` yields
    * exactly the `groupBy(doc_id, token).count()` multiset without the
    * corpus-sized exchange that aggregation pays. Native RLE kernel
    * (functions.TokenCounts). Output: array<struct<token, tf:bigint>>.
    * Oracle twins keep the GROUP BY formulation — same values. */
  def tokenCounts(tok: Column): Column = GraftFunctions.tokenCountsNative(tok)

  /** k-word shingles joined by single spaces — native one-pass kernel
    * (functions.Shingles; the transform/element_at/concat_ws HOF version
    * re-enters the interpreter k+2 times per shingle).
    * Oracle twin (k=3): CASE WHEN len(tok) >= 3 THEN list_transform(
    *   range(1, len(tok)-1), i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])
    *   ELSE [] END */
  def shingles(tok: Column, k: Int): Column =
    // NULL token array -> empty shingle set (the behavior of the original
    // when/otherwise form and the oracle's CASE ... ELSE []): without the
    // coalesce, a NULL-text doc would get a NULL signature and silently
    // drop out of dedup instead of pairing with other empty docs
    coalesce(GraftFunctions.shinglesNative(tok, k),
      array().cast(ArrayType(StringType, containsNull = false)))

  /** Canonical text normalization for fingerprinting: lowercase, strip
    * non-alphanumerics (keeping spaces), collapse runs, trim.
    * Oracle twin: trim(regexp_replace(regexp_replace(lower(x),
    *   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Document fingerprint = md5 of the normalized text. */
  def fingerprint(text: Column): Column =
    md5(normalized(text).cast(BinaryType))

  /** Marker stop-words per language for the n-gram/stopword language-ID
    * heuristic. Scores are exact LIKE-hit counts — identical in any SQL
    * engine, so the whole classifier is oracle-checkable. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "fr" -> Seq("le", "et", "les", "est"),
    "es" -> Seq("el", "y", "los", "es"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4"))

  /** Number of tokens exactly equal to any marker of `lang`. */
  def langScore(tok: Column, lang: String): Column = {
    val markers = langMarkers(lang)
    size(filter(tok, t => markers.map(m => t === m).reduce(_ || _)))
  }

  /** argmax over language scores with fixed precedence order (en, de, fr,
    * es, zh) for ties — deterministic. */
  def langGuess(tok: Column): Column = {
    val langs = Seq("en", "de", "fr", "es", "zh")
    val scores = langs.map(l => langScore(tok, l))
    val best = greatest(scores: _*)
    langs.zip(scores).foldRight(lit("und")) { case ((l, sc), acc) =>
      when(sc === best && best > 0, lit(l)).otherwise(acc)
    }
  }
}
