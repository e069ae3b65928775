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
}
