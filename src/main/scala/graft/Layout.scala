package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical table layout for 100 TB: partitioning and bucketing.
  *
  * The reference's storage layout is L0/L1/L2 column files under a
  * per-table directory with a manifest (reference src/access/sv.rs:
  * 130-138); the Spark-native equivalents that carry its *intent* are:
  *
  *  - **date/hash partition directories** — the unit of pruning: a
  *    filter on the partition column never opens non-matching files
  *    (PartitionFilters in the scan, vs the manifest's file-level xmin
  *    filtering);
  *  - **bucketed tables** — pre-shuffled layout on the join/agg key: a
  *    join of two tables bucketed on the same key by the same bucket
  *    count runs with NO exchange on either side (the co-located join
  *    discipline for repeated fact-fact joins);
  *  - the parquet commit protocol — the manifest/atomic-publish analogue
  *    (sv.rs:537-554).
  *
  * At 100 TB: partition by ingestion date (or hash of a high-cardinality
  * key) so single-day queries touch 1/Nth of the lake; bucket the fact
  * tables on their dominant join key (e.g. orderkey) so the daily joins
  * skip both shuffles; let AQE coalesce small output partitions.
  */
object Layout {

  /** Write `df` as a partitioned parquet table (directory per value of
    * `partitionCols`). */
  def writePartitioned(df: DataFrame, table: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Write `df` bucketed (+ sorted) on `key` — co-located layout for
    * shuffle-free equi-joins/aggregations on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Derived date partition column for event-shaped data. */
  def withEventDate(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("event_date", to_date(col(tsCol)))

  /** Compact a table's small files: rewrite with ~`targetFileMB` output
    * files (continuous ingest produces one file per micro-batch/task —
    * the classic small-files problem; compaction restores scan
    * efficiency: fewer footers, full row groups, better codec ratios).
    *
    * Publish discipline (the reference's manifest-publish analogue,
    * sv.rs:537-554): the compacted data is staged under
    * `<table>__compacted`, then published with a single INSERT OVERWRITE
    * commit — the table name exists at every failure point. A crash
    * before the publish leaves the original untouched; a crash after
    * leaves only a stale staging table, which the next compact() run
    * drops first.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, table: String,
      targetFileMB: Int = 128): Unit = {
    val staging = s"${table}__compacted"
    spark.sql(s"DROP TABLE IF EXISTS $staging") // recover a prior failed run
    val df = spark.table(table)
    val bytes = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .stats.map(_.sizeInBytes.toLong)
      .getOrElse(df.queryExecution.optimizedPlan.stats.sizeInBytes.toLong)
    val files = math.max(1, (bytes / (targetFileMB * 1024L * 1024L)).toInt)
    df.repartition(files).write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(staging)
    spark.table(staging).write.mode(SaveMode.Overwrite).insertInto(table)
    spark.sql(s"DROP TABLE $staging")
  }
}
