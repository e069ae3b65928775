package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.{Engine, TestSpark}

class BlobSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("media frame carries typed metadata for binary payloads") {
    val m = Blob.toMediaFrame(
      Engine.table(spark, TestSpark.sf, "documents").limit(20),
      "doc_id", "text", "text/plain")
    assert(m.schema.fieldNames.toSeq ==
      Seq("media_id", "payload", "mime", "meta"))
    val r = m.selectExpr("meta.n_bytes", "meta.checksum", "octet_length(payload)")
      .collect()
    assert(r.forall(x => x.getInt(0) == x.getInt(2))) // n_bytes == payload bytes
    assert(r.forall(_.getString(1).length == 32)) // md5 hex
  }

  test("stubbed decode is deterministic and partition-shaped") {
    val m = Blob.toMediaFrame(
      Engine.table(spark, TestSpark.sf, "documents").limit(50),
      "doc_id", "text", "text/plain").repartition(4)
    val f1 = Blob.decodeFeatures(spark, m).collect().sortBy(_.media_id)
    val f2 = Blob.decodeFeatures(spark, m).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(f => f.brightness >= 0.0 && f.brightness <= 1.0))
    assert(f1.forall(f => f.width >= 16 && f.height >= 16))
  }

  test("frame sampling: stride windows, frame cap, and empty payload") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val long = "ab" * 1500  // 3000 bytes -> frames at offsets 0, 1024, 2048
    val media = Seq((1L, long), (2L, ""), (3L, "x" * 6000))
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))
    val f = Blob.frameSample(media).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getString(3))).toMap
    // 3000-byte payload: 3 frames; windows are 256B except we verify offsets
    assert(f.keySet.count(_._1 == 1L) == 3)
    assert(f((1L, 0))._1 == 256 && f((1L, 2))._1 == 256)
    val md5_0 = java.security.MessageDigest.getInstance("MD5")
      .digest(long.substring(0, 256).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(f((1L, 0))._2 == md5_0) // window content = bytes [0, 256)
    val md5_2 = java.security.MessageDigest.getInstance("MD5")
      .digest(long.substring(2048, 2048 + 256).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(f((1L, 2))._2 == md5_2) // stride offset arithmetic
    // empty payload: exactly one empty frame
    assert(f.keySet.count(_._1 == 2L) == 1 && f((2L, 0))._1 == 0)
    // 6000-byte payload: capped at maxFrames = 4
    assert(f.keySet.count(_._1 == 3L) == 4)
  }

  test("perceptual hash: locality — a small payload edit stays in radius") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog " * 40)
    val edited = base.updated(100, 'X').updated(900, 'Y') // 2-char edit
    val unrelated = base.map(c => if (c.isLetter) ('z' - (c - 'a')).toChar else c)
    val media = Seq((1L, base), (2L, edited), (3L, unrelated))
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))
    val sig = Blob.perceptualHash(spark, media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L), sig(2L)) <= 6,
      s"2-char edit moved ${ham(sig(1L), sig(2L))} bits — locality broken")
    assert(ham(sig(1L), sig(3L)) > 6,
      s"unrelated payload only ${ham(sig(1L), sig(3L))} bits away")
  }

  test("m04 bucket scheme finds EVERY pair within the radius (recall=1)") {
    import org.apache.spark.sql.functions._
    // corpus + a same-length edited copy of every 10th doc (ids offset
    // by 100000): guarantees in-radius positives at the tiny test scale
    // factor. The edit must preserve length — block windows are
    // length-relative, so an append shifts every block (exactly like
    // real aHash, where resize normalizes dimensions first).
    val base = Engine.table(spark, TestSpark.sf, "documents")
      .select("doc_id", "text")
    val edits = base.filter(col("doc_id") % 10 === 0).select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(lit("Q"), substring(col("text"), 2, 1000000)).as("text"))
    val docs = base.unionByName(edits)
    val media = Blob.toMediaFrame(docs, "doc_id", "text", "text/plain")
    val sig = Blob.perceptualHash(spark, media)
    val got = graft.operators.Dedup.hammingNeighborPairs(sig, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth over collected signatures
    val s = sig.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, sa) <- s; (ib, sb) <- s
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 6
    } yield (ia, ib)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty, "corpus has no near-dup payloads — test is vacuous")
  }
}
