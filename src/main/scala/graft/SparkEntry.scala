package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (plus the north-star
  * LLM-pipeline operators) appears here once, with a DuckDB oracle where
  * the semantics are SQL-expressible; hash-scheme/approximate operators
  * carry rows-only gates and are unit-tested instead (src/test/scala).
  */
object SparkEntry {

  /** The complete verifiable operator inventory. */
  val all: Seq[GQ] =
    operators.Relational.defs ++
      operators.Analytics.defs ++
      operators.AsOf.defs ++
      operators.Dedup.defs ++
      operators.VectorSearch.defs ++
      operators.Cluster.defs ++
      operators.Graph.defs ++
      operators.TextPipeline.defs ++
      operators.Bpe.defs ++
      operators.Packing.defs ++
      operators.Events.defs ++
      multimodal.Blob.defs ++
      Serving.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 5-way star join + aggregate (SURVEY §7.1's "minimum end-to-end
    * slice", widened). */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case GQ(n, Some(o), _) => n -> o }.toMap
}
