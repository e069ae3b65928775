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

  test("t18 rounding contract is tie-free on the gate corpus (g01 boundary property)") {
    // Proves (not assumes) that cross-engine ulp noise cannot flip either
    // rounding step: every per-token raw term sits > 1e-9 from a 6dp
    // HALF_UP boundary, and every per-doc quotient sits > 1e-7 from a 4dp
    // boundary — while engine ln/÷ disagreement is bounded by a few ulps
    // (< 1e-12 at these magnitudes). Checked on BOTH the spec corpus and
    // the driver's sf0.01 gate corpus.
    for (sf <- Seq(TestSpark.sf, "/root/testdata/sf0.01")) {
      val terms = graft.operators.TextPipeline.dsirTerms(spark, sf)
      val d6 = terms.select(
        min(abs(pmod(abs(col("term_raw")) * 1e6, lit(1.0)) - 0.5)).as("d"))
        .collect()(0).getDouble(0)
      assert(d6 > 1e-3, s"$sf: a per-token term sits ${d6 * 1e-6} from a 6dp boundary")
      val q = terms.groupBy("doc_id")
        .agg((graft.Engine.dsum(round(col("term_raw"), 6)) / count(lit(1))).as("q"))
      val d4 = q.select(
        min(abs(pmod(abs(col("q")) * 1e4, lit(1.0)) - 0.5)).as("d"))
        .collect()(0).getDouble(0)
      assert(d4 > 1e-3, s"$sf: a per-doc quotient sits ${d4 * 1e-4} from a 4dp boundary")
    }
  }

  test("t18 signed-zero normalization: emitted zeros are +0.0, and zeroNorm kills -0.0") {
    // the r7/r8 red was ONE doc whose mean rounds to zero from below:
    // DuckDB emits -0.0, Spark +0.0 — hash-different, `=`-equal
    val zeros = SparkEntry.queries("t18_dsir_weights")(spark, "/root/testdata/sf0.01")
      .filter(col("dsir_weight") === 0.0).collect()
    assert(zeros.nonEmpty, "gate corpus lost its zero-weight doc; boundary spec may be vacuous")
    assert(zeros.forall(r => java.lang.Double.doubleToLongBits(r.getDouble(2)) == 0L))
    val direct = spark.range(1)
      .select(graft.Engine.zeroNorm(lit(-0.0)).as("z")).collect()(0).getDouble(0)
    assert(java.lang.Double.doubleToLongBits(direct) == 0L, "zeroNorm must collapse -0.0")
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

  test("row-local NB margin fold == the windowed top-2 definition") {
    // r18: nbMargins selects (best, runner-up) with a row-local fold
    // over the per-class sum columns; pin it against the semantic
    // definition — row_number() OVER (PARTITION BY doc ORDER BY score
    // DESC, clang) IN (1, 2) over the full class-score table — on the
    // gate corpus, whose engineered near-ties exercise the tie-break.
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Engine.table(spark, TestSpark.sf, "documents")
    val (ct, classes) = TextPipeline.nbTrain(docs)
    val fold = TextPipeline.nbMargins(docs, ct, classes)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("clang"))
    val ranked = TextPipeline.nbClassScores(docs, ct, classes)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
    val top = ranked.filter(col("rn") === 1)
      .select(col("doc_id"), col("clang").as("pred"), col("score").as("s1"))
    val second = ranked.filter(col("rn") === 2)
      .select(col("doc_id"), col("score").as("s2"))
    val windowed = top.join(second, "doc_id")
      .select(col("doc_id"), col("pred"),
        graft.Engine.decOut(col("s1") - col("s2")).as("margin"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(fold == windowed,
      s"missing=${(windowed -- fold).take(3)} extra=${(fold -- windowed).take(3)}")
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
