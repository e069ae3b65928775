package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.{GraftFunctions => GF}

class GraftExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fnv64 matches the published FNV-1a test vector") {
    // FNV-1a 64("abc") = 0xe71fa2190541574b (public reference vectors)
    assert(GraftHash.fnv64("abc".getBytes("UTF-8")) == 0xe71fa2190541574bL)
    val got = Seq("abc").toDF("s").select(GF.fnv64(col("s"))).head.getLong(0)
    assert(got == 0xe71fa2190541574bL)
  }

  test("fnv64 survives SQL registration (fmgr analogue)") {
    Seq("x").toDF("s").createOrReplaceTempView("fnv_in")
    val viaSql = spark.sql("SELECT graft_fnv64(s) FROM fnv_in").head.getLong(0)
    assert(viaSql == GraftHash.fnv64("x".getBytes("UTF-8")))
  }

  test("minhash: identical token sets -> identical signatures; est sim 1") {
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("c", "b", "a")), // order must not matter
      (3L, Seq("x", "y", "z"))).toDF("id", "tok")
    val sigs = df.select($"id", GF.minhash($"tok", 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == 32)
    // each component is min over tokens of h*A(j)+B(j)
    val hs = Seq("a", "b", "c").map(t => GraftHash.fnv64(t.getBytes("UTF-8")))
    val expected0 = hs.map(h => h * GraftHash.A(0) + GraftHash.B(0))
      .reduce((x, y) => if (java.lang.Long.compareUnsigned(x, y) < 0) x else y)
    assert(sigs(1L).head == expected0)
  }

  test("simhash: single token signature equals its fnv64 hash bits") {
    val tok = "hello"
    val got = Seq(Seq(tok)).toDF("t").select(GF.simhash($"t")).head.getLong(0)
    assert(got == GraftHash.fnv64(tok.getBytes("UTF-8")))
  }

  test("cosine: known geometry over float and double arrays") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)), // orthogonal
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f)), // parallel
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))  // zero norm -> 0
    ).toDF("a", "b")
    val sims = df.select(GF.cosine($"a", $"b")).collect().map(_.getDouble(0))
    assert(math.abs(sims(0)) < 1e-12)
    assert(math.abs(sims(1) - 1.0) < 1e-12)
    assert(sims(2) == 0.0)
    val d = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(math.abs(d.select(GF.cosine($"a", $"b")).head.getDouble(0) - 1.0) < 1e-12)
  }

  test("dot: sequential double accumulation") {
    val d = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b") // mixed float/double element types
    assert(d.select(GF.dot($"a", $"b")).head.getDouble(0) == 32.0)
  }
}
