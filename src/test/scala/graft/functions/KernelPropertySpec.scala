package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests: the native one-pass kernels (Tokens, Shingles,
  * SigMatchCount) are drop-in replacements for the higher-order-function
  * formulations they replaced — the oracle exactness of every text
  * operator rests on this equivalence, so it is checked over generated
  * inputs (fixed seeds: deterministic), not just the fixture corpus.
  */
class KernelPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // strings mixing alnum runs, separators, unicode, and edge shapes
  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf(" ", "\t", "\n", "--", "!!", "...", "_", "é", "ß", "中文", "K"),
    Gen.const(""),
    Gen.numStr.map(_.take(6)))).map(_.mkString)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def hofTokens(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")

  private def hofShingles(tok: org.apache.spark.sql.Column, k: Int) =
    when(size(tok) >= k,
      transform(sequence(lit(1), size(tok) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(tok, i + lit(j))): _*)))
      .otherwise(array().cast(ArrayType(StringType)))

  test("native Tokens == HOF filter/split/lower on arbitrary strings") {
    import spark.implicits._
    val texts = (1L to 60L).map(s => sample(textGen, s)) ++
      Seq("", "   ", "a", "K 42", "ÉéÉ", "0x00--ff", "\n\t")
    val rows = texts.toDF("t").select(
      col("t"),
      TextFunctions.tokens(col("t")).as("native"),
      hofTokens(col("t")).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"tokens diverged on input '${r.getString(0)}'")
    }
  }

  test("native Shingles == HOF transform/concat_ws for k in 2..4") {
    import spark.implicits._
    val texts = (100L to 140L).map(s => sample(textGen, s))
    for (k <- 2 to 4) {
      val rows = texts.toDF("t")
        .select(TextFunctions.tokens(col("t")).as("tok"))
        .select(col("tok"),
          TextFunctions.shingles(col("tok"), k).as("native"),
          hofShingles(col("tok"), k).as("hof")).collect()
      rows.foreach { r =>
        val native = r.getSeq[String](1)
        val hof = if (r.isNullAt(2)) Seq.empty[String] else r.getSeq[String](2)
        assert(native == hof, s"shingles k=$k diverged on ${r.getSeq[String](0)}")
      }
    }
  }

  test("SigMatchCount == zip_with+aggregate agreement count") {
    import spark.implicits._
    val sigGen = Gen.listOfN(16, Gen.choose(-4L, 4L)) // small range -> collisions
    val sigs = (200L to 212L).map(s => sample(sigGen, s))
    val pairs = for (a <- sigs; b <- sigs) yield (a, b)
    val rows = pairs.toDF("a", "b").select(
      GraftFunctions.sigMatch(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
        .as("hof")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // sanity: self-pairs agree fully
    assert(rows.length == sigs.size * sigs.size)
  }
}
