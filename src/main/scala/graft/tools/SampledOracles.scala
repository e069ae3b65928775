package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Engine
import graft.operators.VectorSearch

/** Partial oracle verification for the decade-3 (sf100) entries whose
  * FULL oracles are DuckDB-cost-bound (r14 verdict, "What's missing"
  * #4): restrict the pair-mining family to a DETERMINISTIC bucket
  * subset — (tbl * 2^planes + bucket) % mod = 0, pure integer
  * arithmetic the oracle re-derives from the same literals — and
  * hash-pin the exact result of that sub-problem. The sampled run
  * exercises every semantic the full run has (bucket codes at the
  * corpus's own derived planes, the [2, maxBucket] cap, in-bucket
  * cosine, cross-table dedup, the directed distinct top-k and mutual
  * tail for the graph family) on ~1/mod of the bucket volume, so a
  * divergence class that is bucket-independent (all of the r13/r14
  * finds were) cannot hide in the unsampled remainder.
  *
  * Usage: runMain graft.tools.SampledOracles <sfDir> <outDir> [mod]
  * then:  python3 tools/drivercheck.py <sfDir> <outDir>
  */
object SampledOracles {

  def family(spark: SparkSession, dir: String, mod: Int): Seq[(String, String)] = {
    val e = Engine.table(spark, dir, "embeddings")
    val p4 = VectorSearch.derivePlanes(e, -1, 4) // d07
    val p5 = VectorSearch.derivePlanes(e, -1, 5) // s05 / s10
    val cc = VectorSearch.deriveCells(e, -1) // s03 / s04 / s15
    val np = VectorSearch.deriveNprobe(cc, -1)
    println(s"[sampled] N=${Engine.memoCount(e)} planes(d07)=$p4 " +
      s"planes(s05/s10)=$p5 cells=$cc nprobe=$np mod=$mod")
    Seq(
      "d07_embedding_neardup_lsh" ->
        VectorSearch.oracleNearDupLshSql(p4, sampleMod = mod),
      "s05_mutual_knn_graph" ->
        VectorSearch.oracleMutualKnnSql(p5, sampleMod = mod),
      "s10_label_purity" ->
        VectorSearch.oracleLabelPuritySql(p5, sampleMod = mod),
      // IVF family: corpus-ROW sampled (model full-corpus; assignment
      // is per-row independent, so the sample covers every semantic)
      "s03_ann_ivf" ->
        VectorSearch.oracleIvfSql(cc, np, sampleMod = mod),
      "s04_ann_ivfpq" ->
        VectorSearch.oracleIvfPqSql(cc, np, sampleMod = mod),
      "s15_ann_ivfpq_indexed" ->
        VectorSearch.oracleIvfPqSql(cc, np, sampleMod = mod))
  }

  def main(args: Array[String]): Unit = {
    val Array(dir, out) = args.take(2)
    val mod = if (args.length > 2) args(2).toInt else 97
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Engine.prepare(spark)
    val e = Engine.table(spark, dir, "embeddings")
    import org.apache.spark.sql.functions.col
    def q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val sparkSide = Map(
      "d07_embedding_neardup_lsh" ->
        (() => VectorSearch.cosineNearDupPairsLsh(e, 0.3, sampleMod = mod)),
      "s05_mutual_knn_graph" ->
        (() => VectorSearch.mutualKnnGraph(e, 5, sampleMod = mod)),
      "s10_label_purity" ->
        (() => VectorSearch.labelPurityLsh(e, sampleMod = mod)),
      "s03_ann_ivf" ->
        (() => VectorSearch.ivfTopK(e, q, 10, sampleMod = mod)),
      "s04_ann_ivfpq" ->
        (() => VectorSearch.ivfPqTopK(e, q, 10, sampleMod = mod)),
      "s15_ann_ivfpq_indexed" -> (() => {
        val model = VectorSearch.pqModel(e)
        VectorSearch.ivfPqTopKIndexed(
          VectorSearch.encodeIvfPq(e.filter(col("vec_id") % mod === 0), model),
          e, q, model, 10)
      }))
    val fam = family(spark, dir, mod)
    for ((name, _) <- fam) {
      val t0 = System.nanoTime()
      sparkSide(name)().write.mode("overwrite").parquet(s"$out/$name")
      println(f"[sampled] $name dumped in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    new java.io.File(out).mkdirs()
    val json = fam.map { case (n, sql) =>
      s"${Json.str(n)}: ${Json.str(sql)}"
    }.mkString("{", ", ", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      json.getBytes("UTF-8"))
    println(s"[sampled] oracle_sql.json written (${fam.size} queries, mod=$mod)")
    spark.stop()
  }
}
