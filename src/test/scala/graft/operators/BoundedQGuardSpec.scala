package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The boundedQ serving contract is ENFORCED, not assumed (r17 verdict
  * #2 / advice): a caller passing `boundedQ = true` with more than
  * [[VectorSearch.MaxBoundedQids]] distinct qids must fail loudly with
  * the contract named — the silent alternative is the external-sort
  * fallback of the full candidate stream on the parent session's
  * protective 128-group ObjectHashAggregate default, the exact
  * scale-killer the lazy serving path exists to avoid. */
class BoundedQGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = graft.Engine.table(spark, TestSpark.sf, "embeddings")

  test("129 distinct qids through a boundedQ=true path fail loudly") {
    val q129 = emb.filter(col("vec_id") < VectorSearch.MaxBoundedQids + 1)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val ex = intercept[Exception](
      VectorSearch.bruteForceTopK(emb, q129, 3, boundedQ = true).collect())
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("boundedQ serving contract violated"), s"got: $msg")
  }

  test("at the bound, boundedQ=true equals the eager batch path") {
    val qs = emb.filter(col("vec_id") < VectorSearch.MaxBoundedQids)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, -t._3, t._2)).toSeq
    val lazy_ = VectorSearch.bruteForceTopK(emb, qs, 3, boundedQ = true)
    val eager = VectorSearch.bruteForceTopK(emb, qs, 3, boundedQ = false)
    assert(canon(lazy_) == canon(eager))
    graft.Engine.releaseEphemeral(spark) // the eager arm registered its frame
  }
}
