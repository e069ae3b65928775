package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests: the native one-pass kernels (Tokens, Shingles,
  * SigMatchCount) are drop-in replacements for the higher-order-function
  * formulations they replaced — the oracle exactness of every text
  * operator rests on this equivalence, so it is checked over generated
  * inputs (fixed seeds: deterministic), not just the fixture corpus.
  */
class KernelPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // strings mixing alnum runs, separators, unicode, and edge shapes
  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf(" ", "\t", "\n", "--", "!!", "...", "_", "é", "ß", "中文", "K"),
    Gen.const(""),
    Gen.numStr.map(_.take(6)))).map(_.mkString)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def hofTokens(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")

  private def hofShingles(tok: org.apache.spark.sql.Column, k: Int) =
    when(size(tok) >= k,
      transform(sequence(lit(1), size(tok) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(tok, i + lit(j))): _*)))
      .otherwise(array().cast(ArrayType(StringType)))

  test("native Tokens == HOF filter/split/lower on arbitrary strings") {
    import spark.implicits._
    val texts = (1L to 60L).map(s => sample(textGen, s)) ++
      Seq("", "   ", "a", "K 42", "ÉéÉ", "0x00--ff", "\n\t")
    val rows = texts.toDF("t").select(
      col("t"),
      TextFunctions.tokens(col("t")).as("native"),
      hofTokens(col("t")).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"tokens diverged on input '${r.getString(0)}'")
    }
  }

  test("native Shingles == HOF transform/concat_ws for k in 2..4") {
    import spark.implicits._
    val texts = (100L to 140L).map(s => sample(textGen, s))
    for (k <- 2 to 4) {
      val rows = texts.toDF("t")
        .select(TextFunctions.tokens(col("t")).as("tok"))
        .select(col("tok"),
          TextFunctions.shingles(col("tok"), k).as("native"),
          hofShingles(col("tok"), k).as("hof")).collect()
      rows.foreach { r =>
        val native = r.getSeq[String](1)
        val hof = if (r.isNullAt(2)) Seq.empty[String] else r.getSeq[String](2)
        assert(native == hof, s"shingles k=$k diverged on ${r.getSeq[String](0)}")
      }
    }
  }

  test("SigMatchCount == zip_with+aggregate agreement count") {
    import spark.implicits._
    val sigGen = Gen.listOfN(16, Gen.choose(-4L, 4L)) // small range -> collisions
    val sigs = (200L to 212L).map(s => sample(sigGen, s))
    val pairs = for (a <- sigs; b <- sigs) yield (a, b)
    val rows = pairs.toDF("a", "b").select(
      GraftFunctions.sigMatch(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
        .as("hof")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // sanity: self-pairs agree fully
    assert(rows.length == sigs.size * sigs.size)
  }

  test("PQ ADC table+lookup == direct subspace dot products on generated vectors") {
    import spark.implicits._
    val dim = 16; val m = 4; val sub = dim / m; val cb = 8
    val vecGen = Gen.listOfN(dim, Gen.choose(-5.0, 5.0))
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      Array.tabulate(cb) { c =>
        sample(vecGen, 1000L + j * 31 + c).slice(j * sub, (j + 1) * sub).toArray
      }
    }
    val vecs = (300L to 330L).map(s => sample(vecGen, s))
    val rows = vecs.toDF("v")
      .select(col("v"),
        GraftFunctions.pqEncode(col("v"), books).as("codes"),
        GraftFunctions.pqAdcSum(
          GraftFunctions.pqEncode(col("v"), books),
          GraftFunctions.pqAdcTable(col("v"), books)).as("adc"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      val codes = r.getSeq[Int](1)
      assert(codes.length == m && codes.forall(c => c >= 0 && c < cb))
      // the ADC estimate of a vector against ITSELF must equal the sum of
      // its subspace dots with its own codewords, computed directly
      val direct = (0 until m).map { j =>
        val cw = books(j)(codes(j))
        (0 until sub).map(t => v(j * sub + t) * cw(t)).sum
      }.sum
      assert(math.abs(r.getDouble(2) - direct) < 1e-9)
      // each code is genuinely the argmax-cosine codeword of its subspace
      (0 until m).foreach { j =>
        def cos(cw: Array[Double]): Double = {
          val s = v.slice(j * sub, (j + 1) * sub)
          val dot = s.zip(cw).map { case (x, y) => x * y }.sum
          val na = math.sqrt(s.map(x => x * x).sum)
          val nb = math.sqrt(cw.map(x => x * x).sum)
          if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
        }
        val best = (0 until cb).maxBy(c => cos(books(j)(c)))
        assert(cos(books(j)(codes(j))) >= cos(books(j)(best)) - 1e-12)
      }
    }
  }

  test("NearestCells fast path == exact round6 ranking, incl. forced near-ties") {
    // The margin-gated fast path (raw-sim ranking + per-centroid norm
    // reuse) must be indistinguishable from the legacy loop that ranks
    // every centroid by BigDecimal-rounded cosine: d10's arm-parity
    // contract rests on it. Adversarial shapes force the close-call
    // fallback: duplicate centroids (gap 0), scaled copies (cosine
    // identical under scaling), and 1e-7-perturbed clones (raw gap
    // under the 1.1e-6 margin).
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(4242)
    def vec(dim: Int): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    for (trial <- 0 until 200) {
      val dim = 8 + rnd.nextInt(9)
      val k = 3 + rnd.nextInt(38)
      val base = Array.fill(k)(vec(dim))
      val cents: Array[Array[Double]] = trial % 4 match {
        case 0 => base
        case 1 => // duplicates: rounded ties must break by INDEX
          base.zipWithIndex.map { case (c, i) => if (i % 3 == 0) base(0) else c }
        case 2 => // scaled copies: same cosine, different vectors
          base.zipWithIndex.map { case (c, i) =>
            if (i % 2 == 0) base(i / 2 % k).map(_ * (1.0 + i)) else c }
        case _ => // sub-margin perturbations of one direction
          base.zipWithIndex.map { case (c, i) =>
            if (i % 2 == 0) {
              val a = base(0).clone(); a(0) += i * 1e-7; a
            } else c }
      }
      val v = new GenericArrayData(vec(dim).map(x => x: Any))
      val norms = NearestCellsKernel.sqrtNorms(cents)
      for (n <- Seq(1, 3, k)) {
        val fast = NearestCellsKernel
          .topN(v, DoubleType, cents, norms, n, round6 = true)
          .toIntArray().toSeq
        val exact = NearestCellsKernel.topNExact(v, DoubleType, cents, n)
          .toIntArray().toSeq
        assert(fast == exact,
          s"trial=$trial n=$n k=$k dim=$dim: fast $fast != exact $exact")
      }
    }
  }

  test("NearestCells raw ranking (round6=false) unchanged by the norm hoist") {
    // IVF/k-means rank by RAW cosine; the precomputed sqrt-norm must be
    // arithmetic-identical (same accumulation order, same divide shape)
    // to the per-row recompute it replaced.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(77)
    for (_ <- 0 until 100) {
      val dim = 4 + rnd.nextInt(13)
      val k = 2 + rnd.nextInt(30)
      val cents = Array.fill(k)(Array.fill(dim)(rnd.nextGaussian()))
      val raw = Array.fill(dim)(rnd.nextGaussian())
      val v = new GenericArrayData(raw.map(x => x: Any))
      val norms = NearestCellsKernel.sqrtNorms(cents)
      val got = NearestCellsKernel
        .topN(v, DoubleType, cents, norms, 2, round6 = false).toIntArray().toSeq
      // reference: rank by dot/(sqrt(nv)*sqrt(nc)) exactly as written
      val nv = math.sqrt(raw.map(x => x * x).sum)
      val sims = cents.map { c =>
        val dot = raw.zip(c).map { case (a, b) => a * b }.sum
        val nc = math.sqrt(c.map(x => x * x).sum)
        if (nv == 0 || nc == 0) 0.0 else dot / (nv * nc)
      }
      val want = sims.zipWithIndex
        .sortBy { case (s, i) => (-s, i) }.take(2).map(_._2).toSeq
      assert(got == want, s"raw ranking diverged: $got != $want")
    }
  }

  test("hierAssign fast path == exact rank reference, incl. forced near-ties") {
    // d10's hierarchical assignment: route top-p supers (round6 exact
    // via topN), then bestOfRound6's raw-sim scan with the margin
    // fallback. Reference recomputes the whole decision with BigDecimal
    // rounding at every rank. Adversarial shapes: duplicated centroids
    // (rounded ties -> lowest global cid), scaled copies, sub-margin
    // perturbations — each must route AND resolve identically.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(9292)
    def vec(dim: Int): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    def cos6(a: Array[Double], c: Array[Double]): Double = {
      val m = math.min(a.length, c.length)
      var dot = 0.0; var i = 0
      while (i < m) { dot += a(i) * c(i); i += 1 }
      val na = math.sqrt(a.map(x => x * x).sum)
      val nc = math.sqrt(c.map(x => x * x).sum)
      val raw = if (na == 0 || nc == 0) 0.0 else dot / (na * nc)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for (trial <- 0 until 200) {
      val dim = 8 + rnd.nextInt(9)
      val k = 6 + rnd.nextInt(35)
      val base = Array.fill(k)(vec(dim))
      val cents: Array[Array[Double]] = trial % 4 match {
        case 0 => base
        case 1 => base.zipWithIndex.map { case (c, i) =>
          if (i % 3 == 0) base(0) else c }
        case 2 => base.zipWithIndex.map { case (c, i) =>
          if (i % 2 == 0) base(i / 2 % k).map(_ * (1.0 + i)) else c }
        case _ => base.zipWithIndex.map { case (c, i) =>
          if (i % 2 == 0) { val a = base(0).clone(); a(0) += i * 1e-7; a }
          else c }
      }
      val (supers, members) = graft.operators.Cluster.superRoute(cents)
      val raw = vec(dim)
      val v = new GenericArrayData(raw.map(x => x: Any))
      val p = graft.operators.Cluster.HierProbes
      val got = NearestCellsKernel.hierAssign(v, DoubleType, cents,
        NearestCellsKernel.sqrtNorms(cents), supers,
        NearestCellsKernel.sqrtNorms(supers), members, p)
      val routed = supers.indices
        .sortBy(g => (-cos6(raw, supers(g)), g)).take(p)
      val cand = routed.flatMap(members(_)).sorted
      val want = cand.map(ci => (ci, cos6(raw, cents(ci))))
        .reduceLeft((a, b) => if (b._2 > a._2) b else a)._1
      assert(got == want,
        s"trial=$trial k=$k dim=$dim: hierAssign $got != ref $want")
    }
  }

  test("TopKPairsAgg's primitive update path binds on the canonical plan shape") {
    // The interpreted update path reads getLong/getDouble directly when
    // both children bind to plain references — assert that the canonical
    // topKPerQid shape (narrow (qid, nid, sim) projection feeding the
    // aggregate) actually takes that path, so the fast path isn't dead
    // code, and that its output equals the general-eval path's.
    import spark.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.7), (2L, 12L, 0.1))
      .toDF("qid", "nid", "sim")
    val agg = df.groupBy("qid")
      .agg(GraftFunctions.topKPairs(col("nid").cast("long"), col("sim"), 2).as("t"))
    import org.apache.spark.sql.catalyst.expressions.BindReferences
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    val rows0 = agg.select(col("qid"), explode(col("t"))).collect()
    assert(rows0.length == 3)
    // the partial-mode instance is the one fed 15M-row candidate
    // streams; bind it against its child's output exactly as the exec
    // does and check the primitive path engaged (unwrap AQE's final plan)
    val finalPlan = agg.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val partials = finalPlan.collect {
      case p: ObjectHashAggregateExec if p.aggregateExpressions.exists(
          _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial) =>
        p.aggregateExpressions.map(ae =>
          BindReferences.bindReference(
            ae.aggregateFunction.asInstanceOf[
              org.apache.spark.sql.catalyst.expressions.Expression],
            p.child.output))
    }.flatten.collect { case t: TopKPairsAgg => t }
    assert(partials.nonEmpty, "expected partial TopKPairsAgg in the physical plan")
    assert(partials.exists(_.primitiveOrds != null),
      s"primitive path did not bind: children were ${partials.map(_.children)}")
  }

  test("Round6Kernel == BigDecimal HALF_UP 6dp on boundaries, negatives, extremes") {
    // The fast double-space path must be indistinguishable from Spark
    // Round's BigDecimal arithmetic — the sim6 emission and both d10
    // assignment arms rank on these values, so a single divergent ulp
    // is a hash-grade oracle failure. Adversarial inputs: exact 6dp
    // halves (decimal-string .5 exactly), band edges, negatives, tiny
    // values rounding to zero (sign of zero!), magnitudes near the 1e3
    // cutoff, and bulk random cosines.
    def chk(d: Double): Unit = {
      val fast = Round6Kernel.round6(d)
      val exact = if (d.isNaN || d.isInfinite) d else Round6Kernel.exact(d)
      assert(java.lang.Double.compare(fast, exact) == 0,
        s"round6($d): fast $fast != exact $exact")
    }
    val rnd = new scala.util.Random(99)
    for (n <- -20 to 20) {
      chk((n + 0.5) / 1e6)          // exact decimal halves
      chk((n + 0.5 + 1e-5) / 1e6)   // just outside the band, above
      chk((n + 0.5 - 1e-5) / 1e6)   // just outside the band, below
      chk((n + 0.5 + 1e-7) / 1e6)   // inside the band
      chk(n / 1e6)                  // exact 6dp values
    }
    Seq(0.0, -0.0, 1e-9, -1e-9, 1e-12, -1e-12, 0.1234565, -0.1234565,
      0.9999995, -0.9999995, 1.0, -1.0, 999.9999995, -999.9999995,
      1000.0000005, 1e6 + 0.1234565, -1e6 - 0.1234565,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, -Double.MinPositiveValue).foreach(chk)
    var i = 0
    while (i < 2000000) {
      chk(rnd.nextDouble() * 2 - 1) // the cosine domain
      i += 1
    }
    i = 0
    while (i < 200000) {
      chk(rnd.nextGaussian() * math.pow(10, rnd.nextInt(12) - 8))
      i += 1
    }
  }

  test("GF.round6 column == Spark round(col, 6) end-to-end") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(5000)(rnd.nextDouble() * 2 - 1) ++
      (-9 to 9).map(n => (n + 0.5) / 1e6) ++ Seq(0.0, -1e-9, 0.1234565)
    val rows = vals.toDF("x")
      .select(col("x"), GraftFunctions.round6(col("x")).as("fast"),
        round(col("x"), 6).as("spark"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) == 0,
        s"column round6 diverged on x=${r.getDouble(0)}")
    }
  }

  test("Tokens participates in whole-stage codegen (no CodegenFallback boxing)") {
    // r8 flag: a CodegenFallback tokenizer broke the codegen span of
    // every text-family scan — the hottest loop in the pipeline at
    // 100 TB. Pin that the generated code calls the static kernel
    // directly (and that nothing in the span routes through the
    // interpreted-eval fallback).
    import org.apache.spark.sql.execution.debug._
    val df = graft.Engine.table(spark, graft.TestSpark.sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
    val code = df.queryExecution.debug.codegenToSeq().map(_._2).mkString("\n")
    assert(code.contains("GraftHash.tokenize"),
      "tokenizer must compile into the whole-stage-codegen span")
    assert(!code.contains("CodegenFallback"), "no fallback boxing in the token scan")
  }
}
