package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Engine, TestSpark}
import graft.functions.{GraftFunctions => GF, Round6Kernel}

/** Pins the s05/s10 candidate-graph restructure (r15): the per-bucket
  * top-k kernel ([[graft.functions.BucketTopKKernel]]) composed with the
  * global distinct heap must equal the flat all-pairs emission composed
  * with the same heap — exactly, row for row. The algebraic argument
  * (per-group top-k under the strict (sim desc, nid asc) total order
  * distributes over candidate-set union) lives at the kernel; these
  * tests are its adversarial pin: engineered cosine TIES (small-grid
  * vectors collide after round6), duplicate vectors (sim 1.0 groups
  * larger than k), and the real multi-table gate corpus where
  * cross-bucket repeats and cap-dropped buckets all occur. */
class BucketTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Reference: per-member top-k within one bucket by (sim desc, nid
    * asc), sims via the same round6(cosine) the engine emits. */
  private def reference(ids: Array[Long], vecs: Array[Array[Double]],
      k: Int): Set[(Long, Long, Double)] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var t = 0
      while (t < n) { dot += a(t) * b(t); na += a(t) * a(t); nb += b(t) * b(t); t += 1 }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    ids.indices.flatMap { i =>
      ids.indices.filter(_ != i)
        .map(j => (ids(j), Round6Kernel.round6(cos(vecs(i), vecs(j)))))
        .sortBy { case (nid, sim) => (-sim, nid) }
        .take(k)
        .map { case (nid, sim) => (ids(i), nid, sim) }
    }.toSet
  }

  test("kernel equals the brute per-member top-k under ties and duplicates") {
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 30) {
      val m = 2 + rnd.nextInt(24)
      val k = 1 + rnd.nextInt(6)
      // small integer grid -> many exact cosine collisions (= rounded
      // ties), plus planted exact-duplicate vectors (sim 1.0 runs
      // longer than k force the nid-asc tie break to decide the cut)
      val base = Array.fill(m)(Array.fill(6)((rnd.nextInt(5) - 2).toDouble))
      val vecs = base.zipWithIndex.map { case (v, i) =>
        if (i > 0 && rnd.nextInt(3) == 0) base(rnd.nextInt(i)).clone else v
      }
      val ids = rnd.shuffle((0 until m).map(_ * 7919L + rnd.nextInt(7))
        .toVector).toArray // non-contiguous, unordered, possibly colliding? no: distinct below
      val dids = ids.zipWithIndex.map { case (id, i) => id * 100 + i } // force distinct
      val rows = dids.zip(vecs).map { case (id, v) => (id, v.toSeq) }
      import spark.implicits._
      val df = rows.toSeq.toDF("vec_id", "embedding")
        .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("members"))
        .select(explode(GF.bucketTopK(col("members"), k)).as("e"))
        .select(col("e.qid"), col("e.nid"), col("e.sim"))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = reference(dids, vecs, k)
      assert(got == want, s"trial=$trial m=$m k=$k")
    }
  }

  test("bucketed directed top-k equals the flat pair emission on the gate corpus") {
    val e = Engine.table(spark, TestSpark.sf, "embeddings")
    val planes = VectorSearch.derivePlanes(e, -1, 5)
    for (k <- Seq(1, 5)) {
      // legacy path: flat m^2/2 pair emission, exploded both ways, same
      // distinct heap (the shape the r15 kernel replaced)
      val pairs = VectorSearch.lshPairSims(e, planes, 8, 64,
        Dedup.MaxBucket, dedup = false)
      val directed = pairs.select(explode(array(
          struct(col("id_a").as("qid"), col("id_b").as("nid"), col("sim")),
          struct(col("id_b").as("qid"), col("id_a").as("nid"), col("sim")))).as("e"))
        .select(col("e.qid"), col("e.nid"), col("e.sim"))
      val legacy = VectorSearch.topKPerQid(directed, k, distinct = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val got = VectorSearch.lshDirectedTopK(e, k, planes, 8, 64, Dedup.MaxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == legacy, s"k=$k")
    }
  }

  test("mutual-kNN graph and label purity are unchanged by the kernel path") {
    val e = Engine.table(spark, TestSpark.sf, "embeddings")
    val planes = VectorSearch.derivePlanes(e, -1, 5)
    val pairs = VectorSearch.lshPairSims(e, planes, 8, 64,
      Dedup.MaxBucket, dedup = false)
    val directed = pairs.select(explode(array(
        struct(col("id_a").as("qid"), col("id_b").as("nid"), col("sim")),
        struct(col("id_b").as("qid"), col("id_a").as("nid"), col("sim")))).as("e"))
      .select(col("e.qid"), col("e.nid"), col("e.sim"))
    val legacyTopk = VectorSearch.topKPerQid(directed, 5, distinct = true)
    val legacyMutual = legacyTopk
      .select(least(col("qid"), col("nid")).as("id_a"),
        greatest(col("qid"), col("nid")).as("id_b"), col("sim"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n"), max(col("sim")).as("sim"))
      .filter(col("n") === 2)
      .select("id_a", "id_b", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = VectorSearch.mutualKnnGraph(e, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == legacyMutual)
  }
}
