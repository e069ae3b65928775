package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextPipeline, VectorSearch}

/** The SQL-callable serving surface (r17 verdict #2): the index-served
  * retrieval operators registered as table functions must return results
  * IDENTICAL to the Scala serving APIs they wrap — the TVF builders emit
  * the same analyzed plans, so any drift is a registration bug. Also
  * pins the serving properties a SQL caller inherits: lazy plans (no
  * cache entries, no ephemerals) and loud argument errors. */
class ServingSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val installed: Unit = {
    Serving.buildIndexes(spark, TestSpark.sf, "svq")
    Serving.install(spark, "svq")
  }

  private def canon(df: DataFrame): Seq[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.toSeq.tail.mkString("|"))).sortBy(identity).toSeq

  test("graft_ann_topk equals the Scala index-served ANN path") {
    installed
    val sql = spark.sql("SELECT * FROM graft_ann_topk(0, 10)")
    assert(sql.columns.toSeq == Seq("qid", "nid", "sim"))
    val e = spark.table("svq_emb")
    val model = Serving.readModel(spark, "svq_pqmodel")
    val q = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scala_ = VectorSearch.ivfPqTopKIndexed(spark.table("svq_ivf"), e, q,
      model.copy(rerank = math.max(model.rerank, 10)), 10, boundedQ = true)
    assert(canon(sql) == canon(scala_))
    assert(sql.count() == 10)
  }

  test("graft_bm25_topk equals the corpus-scan BM25 top-k") {
    installed
    val sql = spark.sql("SELECT * FROM graft_bm25_topk('scan hash merge', 20)")
    assert(sql.columns.toSeq == Seq("doc_id", "bm25"))
    val docs = Engine.table(spark, TestSpark.sf, "documents")
    val inline = TextPipeline.bm25Scores(docs, Seq("scan", "hash", "merge"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
    assert(canon(sql) == canon(inline))
  }

  test("graft_hybrid_topk equals the inline hybrid (IVF-PQ vector arm)") {
    installed
    val sql = spark.sql(
      "SELECT * FROM graft_hybrid_topk(0, 'scan hash merge', 20)")
    assert(sql.columns.toSeq == Seq("doc_id", "rrf"))
    val docs = Engine.table(spark, TestSpark.sf, "documents")
    val e = Engine.table(spark, TestSpark.sf, "embeddings")
    val q0 = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val inline = VectorSearch.hybridRrfFuse(
      VectorSearch.rankLex(
        TextPipeline.bm25Scores(docs, Seq("scan", "hash", "merge")), 20),
      VectorSearch.rankVec(VectorSearch.ivfPqTopK(e, q0, 20)))
    assert(canon(sql) == canon(inline))
  }

  test("SQL serving stays lazy: no ephemerals, composable in plain SQL") {
    installed
    Engine.releaseEphemeral(spark)
    // composability: the TVF result is a normal relation — joins, CTEs,
    // aggregates over it all analyze and run
    val n = spark.sql("""
      WITH hits AS (SELECT * FROM graft_ann_topk(0, 5))
      SELECT COUNT(*) AS n FROM hits JOIN svq_emb ON hits.nid = svq_emb.vec_id
    """).collect().head.getLong(0)
    assert(n == 5)
    // the boundedQ serving path registered NOTHING for later release
    assert(Engine.releaseEphemeral(spark) == 0,
      "a lazy serving call must not register ephemeral frames")
  }

  test("non-literal or malformed arguments fail loudly") {
    installed
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM graft_ann_topk(vec_id, 10)").collect())
    assert(e1.getMessage.contains("literal arguments")
      || e1.getMessage.toLowerCase.contains("unresolved"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM graft_hybrid_topk(0, 10)").collect())
    assert(e2.getMessage.contains("graft_hybrid_topk"), e2.getMessage)
  }
}
