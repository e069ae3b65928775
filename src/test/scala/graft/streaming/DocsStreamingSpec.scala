package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions.fingerprint
import org.apache.spark.sql.functions._

/** Streaming corpus dedup: in-stream exact dedup (first arrival wins,
  * across micro-batches) + anti join against static corpus fingerprints —
  * the streaming twin of Dedup.dedupAgainstCorpus' exact stage. */
class DocsStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stream dedups within itself, across batches, and against the corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = Seq("an existing corpus document about shuffle partitioning")
      .toDF("text").select(fingerprint(col("text")).as("fp"))

    val in = MemoryStream[(Long, String)]
    val out = DocsStreaming.dedupAgainstCorpus(
      in.toDF().toDF("doc_id", "text"), corpus)
    val q = out.writeStream.format("memory")
      .queryName("docs_out").outputMode(OutputMode.Append).start()

    val fresh = "a brand new document discussing watermark semantics"
    // batch 1: corpus dup, fresh doc, in-batch dup of the fresh doc
    in.addData((1L, "an existing corpus document about shuffle partitioning"),
      (2L, fresh), (3L, fresh))
    q.processAllAvailable()
    // batch 2: cross-batch dup of the fresh doc + another new doc
    in.addData((4L, fresh), (5L, "another distinct document entirely"))
    q.processAllAvailable()
    q.stop()

    val survivors = spark.table("docs_out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(2L, 5L))
  }

  test("streaming decontamination drops docs leaking an eval 8-gram") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val evalGrams = graft.operators.Dedup.shingleHashes(
      Seq((100L, s"question containing $shared as the answer"))
        .toDF("doc_id", "text"), "doc_id", "text", 8)
      .select("h1", "h2").distinct()

    val in = MemoryStream[(Long, String)]
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = DocsStreaming.decontaminateQuery(
      in.toDF().toDF("doc_id", "text"), evalGrams) { (batch, _) =>
      kept.synchronized {
        kept ++= batch.select("doc_id").as[Long].collect()
      }
    }

    in.addData(
      (1L, s"training text that leaks $shared inside its body"),
      (2L, "clean training text with no benchmark overlap whatsoever here"))
    q.processAllAvailable()
    // second micro-batch: decontamination is stateless per batch
    in.addData((3L, s"another leaky doc repeating $shared verbatim"),
      (4L, "and another clean one about join reordering strategies"))
    q.processAllAvailable()
    q.stop()

    assert(kept.sorted.toSeq == Seq(2L, 4L))
  }
}
