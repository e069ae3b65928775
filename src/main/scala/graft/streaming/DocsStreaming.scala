package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.fingerprint

/** Streaming corpus hygiene: continuous document ingest deduplicated
  * in-flight — the streaming twin of `operators.Dedup.dedupAgainstCorpus`
  * (same fingerprint semantics, same survivors).
  *
  * Scale shape: the static corpus side is touched only as fingerprints
  * (a precomputable side table); the stream side keeps one state row per
  * distinct fingerprint seen. In-stream dedup state is unbounded by
  * nature (an exact-dedup key set never expires); production deployments
  * bound it with a watermark on ingest time when "duplicate within N
  * days" is acceptable — exposed via `watermarkCol`/`watermark`.
  */
object DocsStreaming {

  /** New-document stream -> rows that are neither in-stream duplicates
    * (first arrival wins) nor exact duplicates of the corpus.
    * `corpusFp` = one `fp` column of the existing corpus' fingerprints.
    */
  def dedupAgainstCorpus(
      newDocs: DataFrame, corpusFp: DataFrame,
      textCol: String = "text",
      watermarkCol: Option[String] = None,
      watermark: String = "1 day"): DataFrame = {
    val fped = newDocs.withColumn("fp", fingerprint(col(textCol)))
    val marked = watermarkCol.map(c => fped.withWatermark(c, watermark))
      .getOrElse(fped)
    marked
      .dropDuplicates("fp") // in-stream: first arrival survives
      .join(corpusFp, Seq("fp"), "left_anti") // stream-static anti join
      .drop("fp")
  }
}
