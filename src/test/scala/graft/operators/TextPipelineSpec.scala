package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{TestSpark, SparkEntry}

/** The text family is oracle-gated (hash-match vs DuckDB); these specs pin
  * the SEMANTIC claims the oracle cannot see — that the scores order the
  * corpus the way the operator's purpose demands. */
class TextPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("t18 DSIR weights rank target-domain (en) docs above the rest") {
    val w = SparkEntry.queries("t18_dsir_weights")(spark, TestSpark.sf)
    val docs = graft.Engine.table(spark, TestSpark.sf, "documents")
      .select("doc_id", "lang")
    val byLang = w.join(docs, "doc_id")
      .groupBy(col("lang") === "en").agg(avg("dsir_weight"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"en mean ${byLang(true)} should exceed non-en ${byLang(false)}")
  }

  test("t17 keywords come from their own document and are capped at 3") {
    val kw = SparkEntry.queries("t17_tfidf_keywords")(spark, TestSpark.sf)
    val perDoc = kw.groupBy("doc_id").count().agg(max("count")).collect()(0).getLong(0)
    assert(perDoc <= 3)
    val docs = graft.Engine.table(spark, TestSpark.sf, "documents")
    val stray = kw.join(docs, "doc_id")
      .filter(!col("text").contains(col("token"))).count()
    assert(stray == 0, s"$stray keywords not present in their source doc")
  }

  test("t21 two-phase cap == the naive single-window cap") {
    // the oracle shares t21's two-phase derivation, so a decomposition
    // flaw would pass the gate on both engines — pin the equivalence to
    // the semantic definition (one global ROW_NUMBER per source) here
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Engine.table(spark, TestSpark.sf, "documents")
    val twoPhase = SparkEntry.queries("t21_per_source_cap")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = docs.select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("hk"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy("source").orderBy(col("hk"), col("doc_id"))))
      .filter(col("rn") <= 10)
      .select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(twoPhase == naive,
      s"missing=${(naive -- twoPhase).take(5)} extra=${(twoPhase -- naive).take(5)}")
  }
}
