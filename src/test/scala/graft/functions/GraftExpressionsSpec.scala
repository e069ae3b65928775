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

  test("tokenCounts: exploded pairs equal the groupBy tf multiset") {
    // r19: the row-local RLE kernel replaces groupBy(doc_id, token)
    // in every tf-building text query — the (doc_id, token, tf)
    // multiset must be EXACTLY the aggregation's, including dup-heavy,
    // single-token, and empty docs
    val docs = Seq(
      (1L, "the cat the hat the end"),
      (2L, "solo"),
      (3L, ""), // tokenizes to an empty array -> zero rows, like groupBy
      (4L, "a a a b1 b1 z")).toDF("doc_id", "text")
    val viaKernel = docs
      .select(col("doc_id"),
        explode(GF.tokenCountsNative(GF.tokensNative(col("text")))).as("tc"))
      .select(col("doc_id"), col("tc.token").as("token"), col("tc.tf").as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val viaGroupBy = docs
      .select(col("doc_id"), explode(GF.tokensNative(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(viaKernel.toSeq == viaGroupBy.toSeq)
    assert(viaKernel.exists(t => t == ((1L, "the", 3L))))
    assert(!viaKernel.exists(_._1 == 3L))
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

  test("max shingle count: unigram/bigram/trigram + degenerate inputs") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "b", "a")), // top word a=3; top bigram "a b"=2
      (2L, Seq("x")),                     // single token
      (3L, Seq.empty[String])             // empty
    ).toDF("id", "tok")
    val got = df.select($"id",
      GF.maxShingleCount($"tok", 1).as("m1"),
      GF.maxShingleCount($"tok", 2).as("m2"),
      GF.maxShingleCount($"tok", 3).as("m3"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3)))
      .toMap
    assert(got(1L) == ((3, 2, 2))) // trigrams: "a b a" x2, "b a b" x1
    assert(got(2L) == ((1, 0, 0))) // too short for k=2,3 -> 0
    assert(got(3L) == ((0, 0, 0)))
  }

  test("max shingle count counts exact strings, not token boundaries") {
    // "ab"+"c" vs "a"+"bc": joined with a separator they differ — the
    // kernel must not collapse them the way plain concatenation would
    val df = Seq((Seq("ab", "c", "ab", "c"), Seq("a", "bc", "a", "bc")))
      .toDF("t1", "t2")
    val r = df.select(GF.maxShingleCount($"t1", 2), GF.maxShingleCount($"t2", 2)).head
    assert(r.getInt(0) == 2 && r.getInt(1) == 2) // each repeats its OWN bigram twice
  }

  test("cms floor probe never loses a true heavy hitter, even when sloppy") {
    val tokens = (Seq.fill(50)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 40).map(i => s"cold_$i")).map(Tuple1(_))
    val df = tokens.toDF("token")
    // deliberately coarse sketch (huge eps) -> heavy overestimation
    val cms = df.stat.countMinSketch("token", eps = 0.5, confidence = 0.9, seed = 1)
    val out = df.filter(GF.cmsAtLeast(spark, col("token"), cms, 30L))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 30)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact despite the sloppy sketch: overestimates only ever let
    // extra candidates through to the exact re-count
    assert(out == Map("hot" -> 50L, "warm" -> 30L))
  }

  test("graft_bands enforces bands-divides-length on the SQL surface") {
    Seq(Tuple1(Seq(1L, 2L, 3L, 4L))).toDF("sig").createOrReplaceTempView("bands_in")
    // dividing: fine
    assert(spark.sql("SELECT graft_bands(sig, 2) FROM bands_in")
      .head.getSeq[Long](0).length == 2)
    // non-dividing and bands > length: rejected, not silently wrong
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_bands(sig, 3) FROM bands_in").collect()
    }
    assert(e1.getMessage.contains("must divide"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_bands(sig, 8) FROM bands_in").collect()
    }
    assert(e2.getMessage.contains("must divide"))
  }

  test("distinct top-k heap == dropDuplicates + plain heap on dup streams") {
    // the multi-table LSH stream shape: every duplicate is an exact
    // (nid, sim) repeat; duplicates must neither crowd out distinct
    // neighbors nor appear twice in the result
    val rnd = new scala.util.Random(7)
    val rows = (for {
      qid <- 0 until 20; nid <- 0 until 30
      copies = 1 + rnd.nextInt(3) // 1-3 exact repeats
      sim = math.rint(rnd.nextDouble() * 1e6) / 1e6
      c <- 0 until copies
    } yield (qid.toLong, nid.toLong, sim)).toDF("qid", "nid", "sim")
      .repartition(7) // duplicates spread across partitions
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1).map(p =>
        (p.getLong(0), p.getDouble(1))))).sortBy(_._1).toSeq
    val viaDistinct = rows.groupBy("qid")
      .agg(GF.topKPairsDistinct(col("nid"), col("sim"), 5).as("topk"))
    val viaDedup = rows.dropDuplicates("qid", "nid").groupBy("qid")
      .agg(GF.topKPairs(col("nid"), col("sim"), 5).as("topk"))
    assert(canon(viaDistinct) == canon(viaDedup))
  }
}
