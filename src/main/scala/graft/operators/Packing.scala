package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, GQ}

/** Sequence packing — the LLM-training batch-assembly op: greedily pack
  * documents (in deterministic doc_id order, per source shard) into bins
  * of at most `budget` tokens, starting a new bin whenever the next
  * document would overflow; an oversized document gets a bin of its own.
  *
  * Packing is inherently sequential WITHIN a shard (bin assignment
  * depends on the running fill), so the implementation is the documented
  * `mapPartitions` case (SURVEY §4.3(d)): hash-partition on the shard
  * key, sort within partitions by (shard, doc_id), then a single
  * stateful pass per partition. Parallelism = number of shards — at
  * 100 TB the shard key is (source, date-bucket) so thousands of packers
  * run at once and no shard's token stream leaves its task; here the
  * testdata's `source` column is the shard. The pass is O(rows), holds
  * O(1) state, and never collects to the driver.
  */
object Packing {

  private def docs(s: SparkSession, d: String): DataFrame =
    Engine.table(s, d, "documents")

  /** Greedy first-fit-in-order packing of `documents` into `budget`-token
    * bins per `shardCol`. Returns (<shardCol>, doc_id, n_tokens, bin) —
    * the first output column carries the caller's shard-key name. */
  def packSequences(documents: DataFrame, budget: Long,
      shardCol: String = "source"): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val sized = documents.select(
      col(shardCol).cast(StringType).as("shard"),
      col("doc_id").cast(LongType).as("doc_id"),
      size(filter(split(col("text"), "\\s+"), x => x =!= ""))
        .cast(LongType).as("n_tokens"))
    sized
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        // partitions hold whole shards (hash-partitioned on shard) in
        // contiguous sorted runs; state resets on shard change
        var cur: String = null
        var bin = 0L
        var fill = 0L
        it.map { case (shard, id, n) =>
          if (shard != cur) { cur = shard; bin = 0L; fill = n }
          else if (fill + n <= budget) { fill += n }
          else { bin += 1; fill = n }
          (shard, id, n, bin)
        }
      }
      .toDF(shardCol, "doc_id", "n_tokens", "bin")
      .select(col(shardCol), col("doc_id"),
        col("n_tokens").cast(IntegerType).as("n_tokens"),
        col("bin").cast(IntegerType).as("bin"))
  }

  val defs: Seq[GQ] = Seq(
    // Oracle replays the same greedy recurrence with a recursive CTE
    // (the d05 pattern: sequential semantics verified by a sequential
    // oracle).
    GQ("p01_sequence_packing",
      Some("""WITH RECURSIVE tok AS (
          SELECT source, doc_id,
                 CAST(len(list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '')) AS BIGINT) AS n_tokens,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM documents),
        pack AS (
          SELECT source, doc_id, n_tokens, rn,
                 CAST(0 AS BIGINT) AS bin, n_tokens AS fill
          FROM tok WHERE rn = 1
          UNION ALL
          SELECT t.source, t.doc_id, t.n_tokens, t.rn,
                 CASE WHEN p.fill + t.n_tokens <= 256 THEN p.bin ELSE p.bin + 1 END,
                 CASE WHEN p.fill + t.n_tokens <= 256 THEN p.fill + t.n_tokens ELSE t.n_tokens END
          FROM pack p JOIN tok t ON t.source = p.source AND t.rn = p.rn + 1)
        SELECT source, doc_id, CAST(n_tokens AS INT) AS n_tokens,
               CAST(bin AS INT) AS bin
        FROM pack"""),
      (s, d) => packSequences(docs(s, d), 256L)),

    // Packing efficiency report — the observability rollup on top of
    // p01 (what fraction of each shard's token budget the packer
    // actually fills; low fill = fragmentation from oversized or
    // awkwardly-sized documents). Per-source aggregate of the packed
    // table; fill rate in exact integer micro-units (floor div) against
    // bins x budget. Shard-count rows out at any corpus scale.
    GQ("p02_packing_report",
      Some("""WITH RECURSIVE tok AS (
          SELECT source, doc_id,
                 CAST(len(list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '')) AS BIGINT) AS n_tokens,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM documents),
        pack AS (
          SELECT source, doc_id, n_tokens, rn,
                 CAST(0 AS BIGINT) AS bin, n_tokens AS fill
          FROM tok WHERE rn = 1
          UNION ALL
          SELECT t.source, t.doc_id, t.n_tokens, t.rn,
                 CASE WHEN p.fill + t.n_tokens <= 256 THEN p.bin ELSE p.bin + 1 END,
                 CASE WHEN p.fill + t.n_tokens <= 256 THEN p.fill + t.n_tokens ELSE t.n_tokens END
          FROM pack p JOIN tok t ON t.source = p.source AND t.rn = p.rn + 1)
        SELECT source, COUNT(*) AS n_docs,
               CAST(COUNT(DISTINCT bin) AS INT) AS n_bins,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_tokens) * 1000000 // (COUNT(DISTINCT bin) * 256)
                 AS DOUBLE) / 1e6 AS fill_rate
        FROM pack GROUP BY source"""),
      (s, d) => packSequences(docs(s, d), 256L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("bin")).cast(IntegerType).as("n_bins"),
          sum(col("n_tokens").cast(LongType)).as("total_tokens"))
        .select(col("source"), col("n_docs"), col("n_bins"),
          col("total_tokens"),
          (expr("(total_tokens * 1000000) div (n_bins * 256)")
            .cast(DoubleType) / 1e6).as("fill_rate"))),

    // Curriculum ordering — easy-to-hard training order: every document
    // gets a GLOBAL position in the (n_tokens, doc_id) total order,
    // WITHOUT a global sort. Two-phase rank (the t21 discipline): a
    // tiny per-token-count histogram yields cumulative offsets (its
    // single-partition running-sum window is over at most max-doc-length
    // rows — driver-size, not data-size), broadcast back; within each
    // token-count the row_number window partitions on n_tokens. Result
    // is pinned identical to the oracle's row_number() OVER (ORDER BY
    // n_tokens, doc_id) — a plan a 1000-executor cluster runs without
    // ever funneling the corpus through one task.
    GQ("p03_curriculum_order",
      Some("""WITH tok AS (SELECT doc_id,
                 CAST(len(list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '')) AS BIGINT) AS n_tokens
               FROM documents)
        SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
               CAST(row_number() OVER (ORDER BY n_tokens, doc_id) AS BIGINT)
                 AS pos
        FROM tok"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val c = docs(s, d).select(col("doc_id"),
          size(filter(split(col("text"), "\\s+"), x => x =!= ""))
            .cast(LongType).as("n_tokens"))
        val hist = c.groupBy("n_tokens").agg(count(lit(1)).as("n"))
        val offs = hist.withColumn("offset",
          coalesce(sum("n").over(Window.orderBy("n_tokens")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        c.join(broadcast(offs.select(col("n_tokens"), col("offset"))),
            "n_tokens")
          .select(col("doc_id"),
            col("n_tokens").cast(IntegerType).as("n_tokens"),
            (row_number().over(Window.partitionBy("n_tokens")
              .orderBy("doc_id")).cast(LongType) + col("offset")).as("pos"))
      })
  )
}
