package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{LongType, StringType}

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

  /** Streaming sequence packing — the stateful twin of
    * `operators.Packing.packSequences`: documents arriving on a stream
    * are greedily packed into `budget`-token bins per shard, with the
    * running (bin, fill) carried ACROSS micro-batches as keyed group
    * state (`flatMapGroupsWithState`, the SURVEY §2.9 custom-state
    * shape). A batch boundary never resets a bin: a shard's stream packs
    * exactly as if it had arrived all at once.
    *
    * Ordering: a stream has no global doc_id order to sort by, so
    * packing order is arrival order, refined to doc_id order WITHIN each
    * micro-batch (deterministic for a given batch decomposition). State
    * per shard is two longs — bounded by the shard count, no timeout
    * needed.
    */
  def packSequences(newDocs: DataFrame, budget: Long,
      shardCol: String = "source"): DataFrame = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    val sized = newDocs.select(
      col(shardCol).cast(StringType).as("shard"),
      col("doc_id").cast(LongType).as("doc_id"),
      size(filter(split(col("text"), "\\s+"), x => x =!= ""))
        .cast(LongType).as("n_tokens"))
      .as[(String, Long, Long)]
    sized.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (String, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (shard, rows, state) =>
        // fill < 0 marks "no document packed yet" (first bin opens lazily
        // so the first document sets fill = n exactly like the batch op)
        var (bin, fill) = state.getOption.getOrElse((0L, -1L))
        val out = rows.toSeq.sortBy(_._2).map { case (_, id, n) =>
          if (fill < 0) fill = n
          else if (fill + n <= budget) fill += n
          else { bin += 1; fill = n }
          (shard, id, n, bin)
        }
        state.update((bin, fill))
        out.iterator
      }
      .toDF("source", "doc_id", "n_tokens", "bin")
  }

  /** Streaming twin of the t21 per-source cap: admit at most `n`
    * documents per source over the life of the stream, the admitted
    * count carried across micro-batches as keyed state (ONE long per
    * source — state is bounded by source cardinality, no timeout
    * needed). Admission is arrival order refined to doc_id order within
    * each micro-batch: Append-mode output cannot be retracted, so the
    * batch op's corpus-wide content-hash ranking is unreachable in a
    * stream — same admitted COUNT, arrival-dependent admitted SET (the
    * documented batch/stream divergence, like packSequences ordering).
    */
  def capPerSource(newDocs: DataFrame, n: Long): DataFrame = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    newDocs.select(
        col("source").cast(StringType).as("source"),
        col("doc_id").cast(LongType).as("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, rows, state) =>
        val admitted = state.getOption.getOrElse(0L)
        val room = math.min(math.max(0L, n - admitted), Int.MaxValue.toLong).toInt
        // bounded selection: a sortBy over the whole (source, batch)
        // group is unbounded task memory under hot-source skew (the
        // exact scale-killer the batch t21 two-phase cap avoids).
        // Instead keep the `room` smallest doc_ids in a size-bounded
        // max-heap over the iterator — task memory O(min(n, batch)),
        // same admitted set as the full sort.
        val keep = if (room == 0) Seq.empty[(String, Long)] else {
          val heap = scala.collection.mutable.PriorityQueue
            .empty[(String, Long)](Ordering.by(_._2))
          rows.foreach { r =>
            if (heap.size < room) heap.enqueue(r)
            else if (r._2 < heap.head._2) { heap.dequeue(); heap.enqueue(r) }
          }
          heap.dequeueAll.reverse // ascending doc_id, like the sort
        }
        state.update(admitted + keep.size)
        keep.iterator
      }
      .toDF("source", "doc_id")
  }

  /** Streaming twin of `operators.Cluster.semanticDedup`'s corpus-guard
    * stage: drop incoming embedding rows that are semantic near-dups
    * (cosine > `tau`) of a kept corpus row in the SAME centroid cell.
    * Centroids are a driver-side k x dim array (the
    * `Cluster.seedCentroids` / `Cluster.kmeans` output) shipped once in
    * the plan; the kept corpus participates only as (cid, embedding) —
    * precomputable and bucketable by cid. The stream-static left_anti
    * join keys on cid equality with the codegen'd cosine as the join
    * residual, so each incoming row scores only against its own cell
    * (the SemDeDup bound, not the whole corpus). In-stream near-dups
    * are NOT deduped here — that would need stream-derived join state;
    * chain [[dedupAgainstCorpus]] upstream for exact-payload dups.
    */
  def semanticDedupAgainstCorpus(newVecs: DataFrame, corpusKept: DataFrame,
      centroids: Array[Array[Double]], tau: Double): DataFrame = {
    val asg = newVecs.withColumn("cid",
      graft.operators.Cluster.assignByCosine(col("embedding"), centroids))
    val kept = corpusKept.select(col("cid").as("k_cid"),
      col("embedding").as("kv"))
    asg.join(kept,
      col("cid") === col("k_cid") &&
        graft.functions.GraftFunctions.cosine(col("embedding"), col("kv")) > tau,
      "left_anti")
  }

  /** Continuous ANN index maintenance: embedding rows arriving on a
    * stream are encoded with the FIXED PqModel the index was built with
    * (graft.Layout.appendIvfIndex discipline — re-deriving the model
    * from the grown corpus would re-cell existing entries) and appended
    * to the cid-partitioned index table per micro-batch. Encode is a
    * stateless projection, so a per-batch append IS the exact streaming
    * semantics; each batch touches only the partitions its rows hash
    * to. Searches (`VectorSearch.ivfPqTopKIndexed`) see every row
    * committed so far.
    *
    * Durability: writes go through `Layout.idempotentBatchAppend`
    * ((cid, batch_id) dynamic partition overwrite), so a replayed
    * micro-batch after failure/restart REPLACES its own rows instead of
    * appending duplicates — duplicate index rows would violate
    * pqSearch's "one cid per corpus row" invariant and let the same
    * neighbor occupy several top-k slots. Pass `checkpointLocation` in
    * production so restarts resume from committed offsets; the
    * idempotent write keeps even at-least-once replays exact. */
  def ivfIndexIngestQuery(newVecs: DataFrame,
      model: graft.operators.VectorSearch.PqModel,
      table: String,
      checkpointLocation: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = newVecs.writeStream
    checkpointLocation.fold(w)(l => w.option("checkpointLocation", l))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.Layout.idempotentBatchAppend(
          graft.operators.VectorSearch.encodeIvfPq(batch, model),
          table, batchId, Seq("cid"))
      }.start()
  }

  /** Streaming twin of `operators.Dedup.decontaminate`: drop incoming
    * documents that share any k-word shingle with a static eval set.
    * `evalGrams` = the eval set's (h1, h2) shingle-hash table (built once
    * with `Dedup.shingleHashes` — precomputable, tiny, broadcastable).
    *
    * Shape: per-micro-batch exact decontamination via `foreachBatch`.
    * The doc-level filter is "NO shingle hits the eval set", which as a
    * streaming dataflow would need a stream-derived anti-join side
    * (unsupported: the contaminated-id set comes from the stream
    * itself). Inside foreachBatch the micro-batch is a plain DataFrame,
    * so the batch operator's exact semi+anti join shape applies
    * verbatim — stateless across batches (the eval side is static, and
    * contamination of a doc depends only on that doc), so per-batch
    * application IS the correct streaming semantics, not an
    * approximation of it.
    *
    * Returns a started query writing surviving rows through `sink`.
    */
  def decontaminateQuery(
      newDocs: DataFrame, evalGrams: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      shingleK: Int = 8)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val contaminated = graft.operators.Dedup
        .shingleHashes(batch, idCol, textCol, shingleK)
        .join(evalGrams, Seq("h1", "h2"), "left_semi")
        .select(col("id").as(idCol)).distinct()
      sink(batch.join(contaminated, Seq(idCol), "left_anti"), batchId)
    }.start()

  /** Continuous inverted-index maintenance — the TEXT twin of
    * [[ivfIndexIngestQuery]]: documents arriving on a stream land as
    * postings rows (doc_id, token, tf, dl) plus one doclen row
    * (doc_id, dl) per micro-batch. Tokenize/count is a stateless
    * per-document projection and a (doc_id, token) never spans batches
    * (a document arrives whole, exactly once — run the stream behind
    * [[dedupAgainstCorpus]] if arrivals can repeat), so per-batch
    * append IS the exact semantics: query-time df/n/avgdl computed
    * over the accumulated tables equal a batch scan of the full
    * corpus, and `TextPipeline.bm25FromIndex` serves scores IDENTICAL
    * to `TextPipeline.bm25Scores` on the union (the scoring tail is
    * literally shared). Writes go through
    * `Layout.idempotentBatchAppend`, so replayed batches replace
    * their own rows — a duplicated posting would inflate tf/df. */
  def invertedIndexIngestQuery(newDocs: DataFrame,
      postingsTable: String, doclenTable: String,
      checkpointLocation: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.functions.TextFunctions.tokens
    val w = newDocs.writeStream
    checkpointLocation.fold(w)(l => w.option("checkpointLocation", l))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // tokenize runs once per output table (twice per batch) — the
        // codegen'd kernel on a micro-batch is cheaper than holding a
        // localCheckpoint across the two writes (principle 9: no
        // hidden state outlives the invocation)
        val base = batch.select(col("doc_id"), tokens(col("text")).as("tok"))
        val postings = base
          .select(col("doc_id"), size(col("tok")).as("dl"),
            explode(col("tok")).as("token"))
          .groupBy("doc_id", "token")
          .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
        val doclens = base.select(col("doc_id"), size(col("tok")).as("dl"))
        graft.Layout.idempotentBatchAppend(postings, postingsTable, batchId, Seq.empty)
        graft.Layout.idempotentBatchAppend(doclens, doclenTable, batchId, Seq.empty)
      }.start()
  }

  /** Streaming twin of `operators.Dedup.entityPairs`: names arriving on
    * a stream emit fuzzy-match pairs against every previously-seen name
    * sharing a blocking token, as they arrive.
    *
    * State is keyed by TOKEN (the batch op's blocking key): each group
    * holds the distinct names seen with that token — at most `dfCap`
    * of them, so per-group state is bounded by the parameter, not the
    * stream. A group that would exceed the cap goes DEAD: its name list
    * is dropped (state shrinks to a flag) and it never pairs again —
    * the batch df-cap guard under append semantics, with the one
    * documented divergence that pairs emitted while the group was
    * under the cap cannot be retracted (batch drops an over-cap block's
    * pairs entirely; Append output is immutable).
    *
    * Cross-token dedup cannot use a second stateful operator (the pair
    * would need its own keyed state), so each pair routes through
    * exactly ONE group: the lexicographically smallest token the two
    * names share. A pair whose routing token's group is dead is lost
    * even if the names share another live token — the same explicit
    * recall trade the cap already makes. When no group exceeds the
    * cap, the emitted pair set EQUALS the batch operator's (name-level)
    * pair set on the same names (DocsStreamingSpec pins this).
    */
  def entityPairsStream(newNames: DataFrame, maxDist: Int = 3,
      dfCap: Int = 1000): DataFrame = {
    val spark = newNames.sparkSession
    import spark.implicits._
    val routed = newNames.select(col("name").cast(StringType).as("name"))
      .select(explode(split(col("name"), " ")).as("tok"), col("name"))
      .as[(String, String)]
    routed.groupByKey(_._1)
      .flatMapGroupsWithState[(List[String], Boolean), (String, String, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (tok, rows, state) =>
        var (known, dead) = state.getOption.getOrElse((List.empty[String], false))
        // membership via a Set rebuilt once per batch invocation (the
        // persisted state stays the List — no encoder change): O(1) per
        // arrival instead of an O(dfCap) List scan, which compounded to
        // O(dfCap^2) string compares per group per batch at the default
        var knownSet = known.toSet
        val out = List.newBuilder[(String, String, Int)]
        rows.foreach { case (_, name) =>
          if (!dead && !knownSet(name)) {
            if (known.size >= dfCap) { dead = true; known = Nil }
            else {
              known.foreach { old =>
                if (minSharedToken(old, name) == tok) {
                  val d = editDistance(old, name)
                  if (d <= maxDist) {
                    val (a, b) = if (old < name) (old, name) else (name, old)
                    out += ((a, b, d))
                  }
                }
              }
              known = name :: known
              knownSet += name
            }
          }
        }
        state.update((known, dead))
        out.result().iterator
      }
      .toDF("name_a", "name_b", "dist")
  }

  /** Smallest token two names share — the deterministic pair-routing
    * rule of [[entityPairsStream]] (both names sit in at least one
    * common group, so the set is never empty when called from one). */
  private def minSharedToken(a: String, b: String): String = {
    val sa = a.split(" ").toSet
    b.split(" ").filter(sa.contains).min
  }

  /** Plain Levenshtein distance (insert/delete/substitute, unit costs)
    * — the same function `functions.levenshtein` computes in the batch
    * plan, needed here as driver-free Scala inside the state update. */
  private[graft] def editDistance(a: String, b: String): Int = {
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }
}
