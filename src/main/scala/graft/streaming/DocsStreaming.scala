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
  * nature (an exact-dedup key set never expires); pass `watermarkCol`
  * to accept "duplicate within the watermark delay" semantics instead —
  * that path uses dropDuplicatesWithinWatermark, the ONLY dedup form
  * whose state the watermark actually evicts (a plain
  * dropDuplicates("fp") ignores the watermark unless the event-time
  * column is part of the key).
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
    val deduped = watermarkCol match {
      // bounded state: first-arrival-wins within the watermark delay
      case Some(c) => fped.withWatermark(c, watermark)
        .dropDuplicatesWithinWatermark("fp")
      // exact forever-dedup: state grows with distinct fingerprints
      case None => fped.dropDuplicates("fp")
    }
    deduped
      .join(corpusFp, Seq("fp"), "left_anti") // stream-static anti join
      .drop("fp")
  }
}
