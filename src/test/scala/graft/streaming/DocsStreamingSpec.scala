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

  test("streaming packing carries (bin, fill) state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // ~5 tokens per doc; budget 12 -> two docs per bin
    def doc(i: Long, src: String) =
      (i, src, s"word$i text of five tokens")
    val in = MemoryStream[(Long, String, String)]
    val out = DocsStreaming.packSequences(
      in.toDF().toDF("doc_id", "source", "text"), budget = 12L)
    val q = out.writeStream.format("memory")
      .queryName("pack_out").outputMode(OutputMode.Append).start()

    in.addData(doc(1, "web"), doc(2, "web"), doc(3, "web"))
    q.processAllAvailable()
    // batch 2 continues the open bin: doc 3 left bin 1 at fill 5, so
    // doc 4 joins bin 1 (5+5 <= 12) — a reset would wrongly open bin 0
    in.addData(doc(4, "web"), doc(5, "web"), doc(10, "books"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("pack_out")
      .select("doc_id", "source", "bin").as[(Long, String, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ("web", 0L) && got(2L) == ("web", 0L)) // 5+5 fits
    assert(got(3L) == ("web", 1L)) // 15 > 12 -> new bin
    assert(got(4L) == ("web", 1L)) // continued across the batch boundary
    assert(got(5L) == ("web", 2L))
    assert(got(10L) == ("books", 0L)) // independent shard state
    // exactly the batch operator's result on the same arrival order
    val batch = graft.operators.Packing.packSequences(
      Seq(doc(1, "web"), doc(2, "web"), doc(3, "web"), doc(4, "web"),
        doc(5, "web"), doc(10, "books"))
        .toDF("doc_id", "source", "text"), 12L)
      .select("doc_id", "source", "bin").as[(Long, String, Int)]
      .collect().map(r => r._1 -> (r._2, r._3.toLong)).toMap
    assert(batch == got)
  }

  test("streaming semantic dedup drops in-cell cosine near-dups of the corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val centroids = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val kept = Seq((0, Seq(1.0, 0.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("cid", "embedding")

    val in = MemoryStream[(Long, Seq[Double])]
    val out = DocsStreaming.semanticDedupAgainstCorpus(
      in.toDF().toDF("vec_id", "embedding"), kept, centroids, tau = 0.8)
    val q = out.writeStream.format("memory")
      .queryName("sem_out").outputMode(OutputMode.Append).start()

    in.addData(
      (1L, Seq(0.9, 0.1, 0.0, 0.0)),  // cell 0, cos vs kept ~0.99 -> drop
      (2L, Seq(0.0, 0.0, 1.0, 0.0)))  // orthogonal to its cell's kept row -> keep
    q.processAllAvailable()
    // second batch: the static side is consulted identically per batch
    in.addData(
      (3L, Seq(0.1, 0.9, 0.0, 0.0)),  // cell 1 near-dup -> drop
      (4L, Seq(-1.0, 0.2, 0.0, 0.0))) // cell 1 (cos 0.196 < 0.8) -> keep
    q.processAllAvailable()
    q.stop()

    val survivors = spark.table("sem_out")
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(2L, 4L))
  }

  test("streaming per-source cap admits at most n docs across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[(Long, String)]
    val out = DocsStreaming.capPerSource(
      in.toDF().toDF("doc_id", "source"), n = 3)
    val q = out.writeStream.format("memory")
      .queryName("cap_out").outputMode(OutputMode.Append).start()

    // batch 1: 2 from srcA (room for both), 1 from srcB
    in.addData((10L, "srcA"), (11L, "srcA"), (20L, "srcB"))
    q.processAllAvailable()
    // batch 2: 3 more from srcA -> only ONE admitted (state = 2),
    // and doc_id order within the batch picks 12 over 13/14
    in.addData((14L, "srcA"), (12L, "srcA"), (13L, "srcA"), (21L, "srcB"))
    q.processAllAvailable()
    // batch 3: srcA full; srcB still has room
    in.addData((15L, "srcA"), (22L, "srcB"))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("cap_out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(10L, 11L, 12L, 20L, 21L, 22L))
  }

  test("IVF ingest restarts from its checkpoint without losing or duplicating rows") {
    import java.nio.file.Files
    import graft.operators.VectorSearch
    val srcDir = Files.createTempDirectory("graft_ivf_src").toString
    val ckpt = Files.createTempDirectory("graft_ivf_ckpt").toString
    val e = graft.Engine.table(spark, TestSpark.sf, "embeddings")
    val model = VectorSearch.pqModel(e)
    val table = "ivf_ckpt_idx"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (loc.exists) rm(loc)

    def start() = DocsStreaming.ivfIndexIngestQuery(
      spark.readStream.schema(e.schema).parquet(srcDir), model, table,
      checkpointLocation = Some(ckpt))

    e.filter(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    val afterHalf = spark.table(table).count()
    assert(afterHalf > 0 && afterHalf < e.count())

    // new vectors land while the stream is down; the restart resumes
    // from the checkpointed offsets — exactly one index row per corpus
    // vector afterwards (no loss, no replay duplication)
    e.filter(col("vec_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(spark.table(table).count() == e.count())
    assert(spark.table(table).select("vec_id").distinct().count() == e.count())

    // the restart-built index answers identically to the batch build
    val queries = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(canon(VectorSearch.ivfPqTopKIndexed(
        spark.table(table), e, queries, model, k = 10))
      == canon(VectorSearch.ivfPqTopK(e, queries, k = 10)))
  }

  test("streaming IVF ingest: searches see all committed batches") {
    import spark.implicits._
    import graft.operators.VectorSearch
    implicit val sqlCtx = spark.sqlContext
    val e = graft.Engine.table(spark, TestSpark.sf, "embeddings")
    val model = VectorSearch.pqModel(e)
    val table = "ivf_stream_idx"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (loc.exists) rm(loc)

    // feed the whole embeddings table through the stream in two batches
    val rows = e.select("vec_id", "embedding")
      .as[(Long, Seq[Double])].collect().toSeq
    val (b1, b2) = rows.partition(_._1 % 2 == 0)
    val in = MemoryStream[(Long, Seq[Double])]
    val q = DocsStreaming.ivfIndexIngestQuery(
      in.toDF().toDF("vec_id", "embedding"), model, table)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val queries = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    val streamed = VectorSearch.ivfPqTopKIndexed(
      spark.table(table), e, queries, model, k = 10)
    val inline = VectorSearch.ivfPqTopK(e, queries, k = 10)
    assert(canon(streamed) == canon(inline),
      "stream-built index diverged from the batch-built answer")
  }

  test("streaming entity pairs equal the batch pair set across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val names = Seq(
      "the red bolt", "the red boat", "the blue gear",
      "the wide gear", "old ring", "cold ring")
    val in = MemoryStream[String]
    val out = DocsStreaming.entityPairsStream(
      in.toDF().toDF("name"), maxDist = 3, dfCap = 100)
    val q = out.writeStream.format("memory")
      .queryName("er_out").outputMode(OutputMode.Append).start()
    // split across batches; a batch-2 name must pair against batch-1
    // state ("cold ring" vs "old ring"), and a repeated arrival must
    // not re-pair
    in.addData(names.take(3): _*); q.processAllAvailable()
    in.addData(names.drop(3) :+ "the red bolt": _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("er_out").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val batch = graft.operators.Dedup
      .entityPairs(names.toDF("p_name"), maxDist = 3, dfCap = 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(streamed == batch,
      s"stream=$streamed batch=$batch")
    assert(streamed.contains(("cold ring", "old ring", 1)))
  }

  test("streaming entity pairs: an over-cap token group goes dead and stops pairing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[String]
    // dfCap = 2: the "x" block dies when "x c" (its 3rd distinct name)
    // arrives; "x d" can then never pair through it
    val out = DocsStreaming.entityPairsStream(
      in.toDF().toDF("name"), maxDist = 10, dfCap = 2)
    val q = out.writeStream.format("memory")
      .queryName("er_cap_out").outputMode(OutputMode.Append).start()
    in.addData("x a", "x b"); q.processAllAvailable()
    in.addData("x c", "x d"); q.processAllAvailable()
    q.stop()

    val got = spark.table("er_cap_out").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // the under-cap pair survives (append output cannot retract — the
    // documented divergence from the batch drop-the-block semantics);
    // nothing pairs after the death
    assert(got == Set(("x a", "x b")), got.toString)
  }

  test("streamed inverted index serves bm25 identical to the corpus scan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def fresh(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists) new scala.reflect.io.Directory(loc).deleteRecursively()
    }
    fresh("inv_postings"); fresh("inv_doclens")

    val docsAll = Seq(
      (1L, "spark shuffle hash join strategies"),
      (2L, "hash aggregation and shuffle partitions"),
      (3L, "columnar parquet scan pruning"),
      (4L, "join reorder with hash statistics"),
      (5L, "a document about nothing relevant"))
    val in = MemoryStream[(Long, String)]
    val q = DocsStreaming.invertedIndexIngestQuery(
      in.toDF().toDF("doc_id", "text"), "inv_postings", "inv_doclens")
    in.addData(docsAll.take(2): _*); q.processAllAvailable()
    in.addData(docsAll.drop(2): _*); q.processAllAvailable()
    q.stop()

    val terms = Seq("hash", "shuffle", "join")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val served = graft.operators.TextPipeline.bm25FromIndex(
      spark.table("inv_postings"), spark.table("inv_doclens"), terms)
    val scanned = graft.operators.TextPipeline.bm25Scores(
      docsAll.toDF("doc_id", "text"), terms)
    assert(canon(served) == canon(scanned),
      s"served=${canon(served)} scanned=${canon(scanned)}")
    // n/avgdl must count doc 5 even though it holds no query term
    assert(spark.table("inv_doclens").count() == 5)
  }

  test("chaos: index-ingest crash before checkpoint commit — BM25 serve equals uninterrupted twin") {
    // the DocsStreaming half of the crash-window chaos (see
    // EventsStreamingSpec's twin case for the window anatomy): the
    // inverted-index ingest does TWO idempotentBatchAppend writes per
    // batch (postings + doclens), so a crash between them leaves the
    // index tables mutually inconsistent — exactly what the replay
    // must heal. Batch 1's postings land, its doclens partition is
    // mangled to one row, commits/1 is deleted; restart must replay
    // and serve bit-identical BM25.
    import java.nio.file.Files
    import spark.implicits._
    val src = Files.createTempDirectory("doc_chaos_src").toString
    val ckpt = Files.createTempDirectory("doc_chaos_ckpt").toString
    def rmDir(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmDir); f.delete(); ()
    }
    for (t <- Seq("chaos_postings", "chaos_doclens",
        "twin_postings", "twin_doclens")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists) rmDir(loc)
    }
    val docsAll = Seq(
      (1L, "hash join against the shuffle service"),
      (2L, "sort merge join spills to disk"),
      (3L, "broadcast hash join skips the shuffle"),
      (4L, "adaptive execution re-plans the join"),
      (5L, "columnar scan with predicate pushdown"))
    def schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def start(pt: String, dt: String, cp: Option[String]) =
      DocsStreaming.invertedIndexIngestQuery(
        spark.readStream.schema(schema).parquet(src), pt, dt, cp)
    docsAll.take(2).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    var q = start("chaos_postings", "chaos_doclens", Some(ckpt))
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    docsAll.drop(2).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    q = start("chaos_postings", "chaos_doclens", Some(ckpt))
    q.processAllAvailable(); q.stop(); q.awaitTermination()

    val commit = new java.io.File(s"$ckpt/commits/1")
    assert(commit.exists, "expected commits/1 in the checkpoint")
    assert(commit.delete())
    // the checksum FS shadows every log file with .N.crc; a stale crc
    // makes the replay's atomic rename fail as "concurrent use"
    new java.io.File(s"$ckpt/commits/.1.crc").delete()
    spark.catalog.refreshTable("chaos_doclens")
    val b1 = spark.table("chaos_doclens")
      .filter(col("batch_id") === 1L).drop("batch_id").cache()
    val b1Rows = b1.count()
    assert(b1Rows == 3)
    graft.Layout.idempotentBatchAppend(b1.limit(1), "chaos_doclens", 1L, Seq.empty)
    b1.unpersist()

    q = start("chaos_postings", "chaos_doclens", Some(ckpt))
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    val tq = start("twin_postings", "twin_doclens", None)
    tq.processAllAvailable(); tq.stop(); tq.awaitTermination()

    val terms = Seq("hash", "shuffle", "join")
    def serve(pt: String, dt: String) = {
      spark.catalog.refreshTable(pt); spark.catalog.refreshTable(dt)
      graft.operators.TextPipeline.bm25FromIndex(
          spark.table(pt), spark.table(dt), terms)
        .collect().map(r => r.getLong(0) ->
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
        .sortBy(_._1).toSeq
    }
    assert(serve("chaos_postings", "chaos_doclens") ==
      serve("twin_postings", "twin_doclens"),
      "post-crash BM25 serve diverged from the uninterrupted twin")
    spark.catalog.refreshTable("chaos_doclens")
    assert(spark.table("chaos_doclens")
      .filter(col("batch_id") === 1L).count() == b1Rows)
  }

  test("property: state-side editDistance == Spark's levenshtein") {
    // the streaming twin computes distances inside the state update (no
    // Column functions there); its DP must agree with the batch plan's
    // levenshtein() on arbitrary strings or stream/batch pairs diverge
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def word() = (0 until rnd.nextInt(12))
      .map(_ => "abc xyz".charAt(rnd.nextInt(7))).mkString
    val cases = Seq(("", ""), ("", "abc"), ("kitten", "sitting")) ++
      Seq.fill(200)((word(), word()))
    val fromSpark = cases.toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).as[Int].collect()
    cases.zip(fromSpark).foreach { case ((a, b), expect) =>
      assert(DocsStreaming.editDistance(a, b) == expect, s"'$a' vs '$b'")
    }
  }
}
