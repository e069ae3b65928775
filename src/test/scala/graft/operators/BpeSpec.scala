package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("BPE learns the classic toy-corpus merges in frequency order") {
    // "low" x5, "lower" x2, "newest" x6, "widest" x3 — the Sennrich
    // running example. Highest pair: (e,s) 9 (newest+widest), then
    // (es,t) 9, then (l,o) 7 (low+lower), ...
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    // NOTE: trainMerges counts word TYPES from the token stream; here
    // every doc is one word, so stream counts == the example's counts
    val m = Bpe.trainMerges(docs, "text", 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1, "e", "s", 9L)))
    assert(m(1) == ((2, "es", "t", 9L)))
    assert(m(2) == ((3, "l", "o", 7L)))
    // 4th merge: remaining top pair is (lo,w) 7
    assert(m(3) == ((4, "lo", "w", 7L)))
  }

  test("merge application is greedy left-to-right (no overlap reuse)") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val out = Bpe.applyMerges(docs, "text", Seq(("a", "a")))
      .select("bpe_tokens").as[Seq[String]].head
    assert(out == Seq("aa", "a"), s"got $out")
  }

  test("training is deterministic and ranks strictly ordered") {
    val docs = Seq.tabulate(40)(i => (i.toLong, s"pack my box with five dozen jugs item$i"))
      .toDF("doc_id", "text")
    val a = Bpe.trainMerges(docs, "text", 6).collect().toSeq
    val b = Bpe.trainMerges(docs.repartition(7), "text", 6).collect().toSeq
    assert(a == b, "merge sequence changed under repartitioning")
    assert(a.map(_.getInt(0)) == (1 to a.size).toSeq)
  }

  test("applying the learned merges shrinks the symbol stream") {
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", 6).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val toks = Bpe.applyMerges(docs.limit(1), "text", merges)
      .select("bpe_tokens").as[Seq[String]].head
    val raw = "the quick brown fox jumps over the lazy dog".length
    assert(toks.size < raw, s"merges did not shrink: ${toks.size} vs $raw")
    assert(toks.mkString("") == "the quick brown fox jumps over the lazy dog",
      "concatenating BPE tokens must reproduce the text")
  }
}
