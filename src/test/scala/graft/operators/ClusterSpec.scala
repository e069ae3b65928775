package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Engine, TestSpark}

class ClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def emb = Engine.table(spark, TestSpark.sf, "embeddings")

  test("semanticDedup keeps the minimum id of every near-dup group") {
    val kept = Cluster.semanticDedup(emb, k = 8, tau = 0.35)
    val keptIds = kept.collect().map(_.getLong(0)).toSet
    assert(keptIds.nonEmpty && keptIds.size < emb.count())
    // survivor rule: a kept row has NO kept-or-dropped lower-id neighbor
    // above tau in its own cluster — verify on the raw pair set
    val cents = Cluster.seedCentroids(emb, 8)
    val asg = emb.select(col("vec_id"),
        Cluster.assignByCosine(col("embedding"), cents).as("cid"),
        col("embedding"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getSeq[Number](2).map(_.doubleValue).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    for (id <- keptIds) {
      val (cid, v) = asg(id)
      val lowerDup = asg.exists { case (oid, (ocid, ov)) =>
        oid < id && ocid == cid && cos(ov, v) > 0.35
      }
      assert(!lowerDup, s"kept $id has a lower-id near-dup in cluster $cid")
    }
  }

  test("semanticDedup assignment ties break to the lower cid") {
    // duplicate centroid rows assign to the FIRST occurrence in both the
    // Spark argmax (array_position finds the first max) and the oracle
    // (ORDER BY sim DESC, cid) — pin the Spark half of that contract
    val cents = Cluster.seedCentroids(emb, 4)
    val dup = cents ++ cents // cids 4..7 duplicate 0..3
    val asg = emb.select(Cluster.assignByCosine(col("embedding"), dup).as("cid"))
    assert(asg.filter(col("cid") >= 4).count() == 0)
  }

  test("assignment arms agree past the k=16 switch (round6 kernel == literal argmax)") {
    // semanticDedup ranks round(cos, 6) with ties to the lower cid in
    // BOTH arms: the literal array argmax (k <= 16, oracle-expressible)
    // and the native kernel with round6 = true (large k). A k = 20
    // centroid set exercises the kernel arm against the literal form on
    // the full corpus — any precision or tie divergence shifts a cid.
    val cents = Cluster.seedCentroids(emb, 20, step = 11)
    assert(cents.length == 20)
    val lit = emb.select(col("vec_id"),
      Cluster.assignByCosine(col("embedding"), cents).as("cid"))
    val ker = emb.select(col("vec_id"),
      graft.functions.GraftFunctions
        .nearestCells(col("embedding"), cents, 1, round6 = true)(0).as("cid"))
    val diff = lit.as("l").join(ker.as("k"), "vec_id")
      .filter(col("l.cid") =!= col("k.cid"))
    assert(diff.count() == 0, "kernel and literal arms disagree")
    // and the rounded kernel differs from the RAW kernel's contract
    // only via precision — sanity: both still produce in-range cids
    assert(lit.filter(col("cid") < 0 || col("cid") >= 20).count() == 0)
  }

  test("kmeans is deterministic and partitions the whole corpus") {
    val (asg1, c1) = Cluster.kmeans(emb, "embedding", k = 10, iters = 3)
    val (_, c2) = Cluster.kmeans(emb, "embedding", k = 10, iters = 3)
    // decimal-exact centroid sums -> bit-identical across runs
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    // every row assigned, every cid in range (the testdata's `label`
    // column is NOT cosine-separable — measured within-label cosine ==
    // cross-label == ~0 — so cluster quality is asserted geometrically
    // in the convergence test below, not against labels)
    val n = emb.count()
    assert(asg1.count() == n)
    val cids = asg1.select("cid").distinct().collect().map(_.getInt(0)).toSet
    assert(cids.subsetOf((0 until 10).toSet) && cids.size > 1)
  }

  test("kmeans centroid VALUES equal an exact in-memory Lloyd's reference") {
    import spark.implicits._
    // two well-separated 4-dim blobs; every coordinate is a multiple of
    // 0.25 (binary-exact AND shortest-decimal-exact), so the
    // cast-to-DECIMAL(38,12) in the distributed update and the
    // BigDecimal reference see identical exact values — the comparison
    // below is == on doubles, no tolerance
    val vecs: Seq[(Long, Seq[Double])] = (0L until 20L).map { i =>
      val base = if (i % 2 == 0) Array(10.0, 0.0, 1.0, 0.0)
                 else Array(0.0, 10.0, 0.0, 1.0)
      (i, base.zipWithIndex.map { case (b, d) =>
        b + 0.25 * ((i * 7 + d) % 5) }.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val (asg, cents) = Cluster.kmeans(df, "embedding", k = 2, iters = 3, dim = 4)

    // the seed CHOICE reuses the engine's hash ordering (murmur3 is not
    // hand-computable); the pinned property is the Lloyd's arithmetic:
    // cosine argmin assignment (ties -> lower cid) + decimal-exact mean
    val seedIds = df.select(col("vec_id"))
      .orderBy(hash(col("vec_id")), col("vec_id"))
      .limit(2).collect().map(_.getLong(0)).sorted
    val byId = vecs.toMap
    var ref: Array[Array[Double]] = seedIds.map(id => byId(id).toArray)
    def cos(a: Array[Double], c: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nc = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * c(i); na += a(i) * a(i); nc += c(i) * c(i); i += 1
      }
      if (na == 0.0 || nc == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nc))
    }
    def refAssign(cents: Array[Array[Double]]): Seq[(Long, Int)] =
      vecs.map { case (id, v) =>
        val arr = v.toArray
        var best = 0; var bestSim = Double.NegativeInfinity; var j = 0
        while (j < cents.length) { // strict > == lower-index tie break
          val s = cos(arr, cents(j))
          if (s > bestSim) { bestSim = s; best = j }
          j += 1
        }
        (id, best)
      }
    for (_ <- 1 to 3) {
      val assign = refAssign(ref)
      ref = ref.indices.map { cid =>
        val members = assign.collect { case (id, c) if c == cid => byId(id) }
        if (members.isEmpty) ref(cid)
        else Array.tabulate(4) { d =>
          val sx = members.map(m => java.math.BigDecimal.valueOf(m(d))
              .setScale(12, java.math.RoundingMode.HALF_UP))
            .reduce(_.add(_)) // the DECIMAL(38,12) exact sum
          sx.doubleValue / members.size // one double division, like kmeans
        }
      }.toArray
    }
    assert(cents.map(_.toSeq).toSeq == ref.map(_.toSeq).toSeq,
      s"centroids diverged:\n got ${cents.map(_.toSeq).mkString("; ")}\n ref ${ref.map(_.toSeq).mkString("; ")}")
    // final assignments agree with the reference argmin over ref centroids
    val gotAsg = asg.select("vec_id", "cid").as[(Long, Int)].collect().toMap
    refAssign(ref).foreach { case (id, cid) =>
      assert(gotAsg(id) == cid, s"vec $id assigned ${gotAsg(id)}, ref $cid") }
  }

  test("kmeans centroid update reduces mean cosine distance to centroids") {
    def meanSim(iters: Int): Double = {
      val (asg, cents) = Cluster.kmeans(emb, "embedding", k = 10, iters = iters)
      val simToCent = cents.toIndexedSeq.zipWithIndex
        .foldLeft(lit(Double.NaN)) { case (acc, (c, i)) =>
          when(col("cid") === i,
            graft.functions.GraftFunctions.cosine(col("embedding"),
              typedLit(c.toIndexedSeq))).otherwise(acc)
        }
      asg.select(avg(simToCent)).collect()(0).getDouble(0)
    }
    val after1 = meanSim(1)
    val after3 = meanSim(3)
    assert(after3 >= after1 - 1e-9, s"iter3 $after3 < iter1 $after1")
  }

  test("centroidClassifier equals an exact in-memory reference") {
    val got = Cluster.centroidClassifier(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val rows = emb.select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Number](1).map(_.doubleValue).toArray))
    // reference centroids with the SAME fixed-point arithmetic: exact
    // long micro-sums, one double division
    val cents = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, rs) =>
      val dim = rs.head._2.length
      val sums = Array.ofDim[Long](dim)
      rs.foreach { case (_, v) =>
        var i = 0
        while (i < dim) { sums(i) += math.floor(v(i) * 1e6).toLong; i += 1 }
      }
      l -> Array.tabulate(dim)(i => sums(i).toDouble / (rs.length.toDouble * 1e6))
    }
    def cos6(a: Array[Double], c: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nc = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * c(i); na += a(i) * a(i); nc += c(i) * c(i); i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nc)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = rows.map { case (l, v) =>
      // first max == lowest class label on ties (cents sorted by label)
      val pred = cents.map { case (cl, c) => (cl, cos6(v, c)) }
        .reduceLeft((a, b) => if (b._2 > a._2) b else a)._1
      (l, pred)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expected)
    assert(got.values.sum == rows.length) // every vector classified once
  }

  test("cluster operator plans stay scale-safe (no BNLJ, no cartesian)") {
    for (gq <- Cluster.defs) {
      val p = gq.run(spark, TestSpark.sf).queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), s"${gq.name}:\n$p")
      assert(!p.contains("CartesianProduct"), s"${gq.name}:\n$p")
    }
  }
}
