package graft
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The derived-density-knob functions (SemDeDup k, LSH planes, IVF
  * cells) call Engine.memoCount at plan-build time; without a
  * cross-build cache hit every rebuild of the same query (bench
  * warm+timed, lint sweeps, repeated model builds) would re-run the
  * count job. Frame CONSTRUCTION itself may run a footer/listing job,
  * so the probe isolates exactly the memoCount call — and the counting
  * listener is scoped to a job group + removed in a finally block so
  * concurrent suite activity cannot flake it and nothing leaks into
  * the shared session. */
class MemoCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def jobsInGroup(body: => Unit): Int =
    JobCounter.jobsInGroup(spark, "memo-count-spec")(body)

  test("memoCount hits across separate builds of the same source") {
    val a = Engine.table(spark, TestSpark.sf, "embeddings")
    val n1 = Engine.memoCount(a)
    val b = Engine.table(spark, TestSpark.sf, "embeddings") // fresh build
    var n2 = -1L
    val jobs = jobsInGroup { n2 = Engine.memoCount(b) }
    assert(n1 == n2 && n1 > 0)
    assert(jobs == 0, s"memoCount MISSED on a rebuilt frame: $jobs job(s) ran")
    // different dirs must NOT collide (key includes root paths)
    val other = Engine.table(spark, "/root/testdata/sf0.01", "embeddings")
    assert(Engine.memoCount(other) != n1 || other.count() == n1)
  }

  test("an append under the same root invalidates on rebuild — derived k follows") {
    val dir = java.nio.file.Files.createTempDirectory("memoinv").toString
    val src = Engine.table(spark, TestSpark.sf, "embeddings").limit(400)
    src.write.mode(SaveMode.Overwrite).parquet(s"$dir/corpus.parquet")

    val before = Engine.table(spark, dir, "corpus")
    assert(Engine.memoCount(before) == 400L)
    // gate regime: ceil(400/100) < 8 -> derived k floors at 8
    assert(operators.Cluster.derivedK(before, targetCluster = 100L) == 8)

    // streaming-append shape: more part files land UNDER the same root
    // (what DocsStreaming's foreachBatch / Layout compaction do) —
    // no cache clear, no invalidation call anywhere
    Engine.table(spark, TestSpark.sf, "embeddings")
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .write.mode(SaveMode.Append).parquet(s"$dir/corpus.parquet")

    val after = Engine.table(spark, dir, "corpus")
    assert(Engine.memoCount(after) == 900L,
      "rebuilt frame served a stale memoized count after an append")
    // the derived knob reflects the new corpus: ceil(900/100) = 9
    assert(operators.Cluster.derivedK(after, targetCluster = 100L) == 9)

    // and the pre-append FRAME still serves its own (old-listing) count —
    // the documented staleness contract of the frame's own scan
    assert(Engine.memoCount(before) == 400L)
  }

  test("Layout batch tables use the commit-version token: new batch invalidates, replay hits") {
    val table = "memo_batch_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val docs = Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("source"))
    Layout.idempotentBatchAppend(docs.limit(50), table, 0L, Seq.empty)
    spark.catalog.refreshTable(table)
    val n0 = Engine.memoCount(spark.table(table))
    assert(n0 == 50L)
    // zero-job hit on a rebuilt frame (the key is the partition set —
    // the batch_id high-water — not the leaf listing)
    val jobs = jobsInGroup {
      assert(Engine.memoCount(spark.table(table)) == 50L)
    }
    assert(jobs == 0, s"memoCount MISSED on a rebuilt batch table: $jobs job(s)")
    // a NEW batch is a new partition -> token moves -> fresh count
    Layout.idempotentBatchAppend(docs.limit(30), table, 1L, Seq.empty)
    spark.catalog.refreshTable(table)
    assert(Engine.memoCount(spark.table(table)) == 80L,
      "stale count after a new streaming batch landed")
    // an idempotent REPLAY of batch 1 rewrites the same partition with
    // the same rows — same commit version, so the memo may (and does)
    // keep serving without a job
    Layout.idempotentBatchAppend(docs.limit(30), table, 1L, Seq.empty)
    spark.catalog.refreshTable(table)
    val replayJobs = jobsInGroup {
      assert(Engine.memoCount(spark.table(table)) == 80L)
    }
    assert(replayJobs == 0,
      s"replayed batch (same commit version) re-ran the count: $replayJobs job(s)")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
