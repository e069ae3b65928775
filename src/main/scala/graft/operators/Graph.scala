package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType,
  StructField, StructType}

import graft.{Engine, GQ}

/** Graph analytics over document/embedding similarity graphs — the
  * iterative-dataflow companion to [[Dedup.nearDupClusters]] (connected
  * components) and [[VectorSearch.mutualKnnGraph]] (edge construction).
  * PageRank-style centrality is the standard curation signal on top of a
  * near-dup or kNN graph: high-rank nodes are "hub" documents whose
  * content recurs across the corpus (boilerplate, mirrors), low-rank
  * isolated nodes are unique content.
  *
  * 100 TB shape: the rank table is one row per node and the adjacency
  * list one row per edge — both orders smaller than the corpus (only
  * near-dup candidates appear). Per iteration there are exactly two
  * shuffles (contributions keyed by dst; the node left-join), the
  * adjacency is materialized ONCE and re-read from its checkpointed
  * form every round, and the iteration count is a fixed parameter, so
  * total cost is O(iters x |E|) with no plan growth (lineage is cut at
  * the materialized adjacency; each round's plan is 2 joins deep).
  *
  * Summation is decimal-exact ([[Engine.dsum]]): double addition is not
  * associative, so a plain double SUM would diverge from any oracle —
  * and from its own re-run under a different partitioning. Ranks are
  * rounded to 6dp each round, making the fixpoint engine-independent.
  */
object Graph {

  /** r18 dual-regime switch for the ITERATIVE operators (pageRank,
    * labelPropagation, kCorePeel, bfsHops, hits) — the d05 pattern
    * (see Dedup.componentsByMinLabel): below a measured edge count the
    * whole fixpoint runs driver-locally with zero per-round job
    * scheduling; above it the distributed loops below are unchanged.
    * A gate-scale fixpoint pays ~2-4 Spark jobs per round in fixed
    * scheduling/cut overhead on frames of a few hundred rows — pure
    * latency at any scale, and on a real cluster each round is a
    * stage-latency floor too. Both regimes compute identical values:
    * all five loops are exact integer/fixed-point arithmetic (micros,
    * floor div) replicated op-for-op, pinned by GraphSpec parity
    * tests. Session-tunable via `graft.graph.driverMaxEdges` (0 forces
    * the distributed arm — how the parity specs and the ClusterCheck
    * chaos harness exercise the distributed loops at gate scale).
    *
    * The default threshold bounds driver memory (~32 MB of edge longs,
    * the d05 sizing) AND keeps hits' normalization product in Long:
    * raw <= 1e6 micros x 2e6 edges = 2e12, x 1e6 = 2e18 < 2^63. */
  private val DriverMaxEdgesDefault = 2000000L

  private def driverMaxEdges(spark: SparkSession): Long =
    spark.conf.getOption("graft.graph.driverMaxEdges").map(_.toLong)
      .getOrElse(DriverMaxEdgesDefault)

  /** Overflow-safe local-regime cap for [[hits]] (r19, advice item):
    * hitsLocal normalizes with `raw * 1000000L` in plain Long while the
    * distributed arm widens through DECIMAL(38,0). raw <= 1e6 micros x
    * |E|, so the product stays under 2^63 only while |E| <= ~9.2e6.
    * `graft.graph.driverMaxEdges` is an unguarded session knob — without
    * this clamp, raising it past that bound (safe for pageRank/kCore/
    * bfs, whose local arithmetic never leaves the seed scale) would
    * silently overflow and corrupt hits scores in the local regime
    * only. 9e6 leaves a margin below the exact 2^63/1e12 ~ 9.22e6. */
  private val HitsLocalMaxEdges = 9000000L

  /** Cut + count the edge plan once; collect it when the driver regime
    * applies. Returns the cut frame either way (the distributed arms
    * keep reading it; callers release it). The threshold probe count is
    * memoized on the PRE-cut edge plan ([[Engine.memoStat]], the BPE
    * driverMaxVocab discipline — r18 advice: the unconditional
    * `e.count()` added one full scan of the checkpointed edge table per
    * invocation even when the graph is far above the threshold, e.g.
    * the decade-3 sf100 pageRank fixture). A memo hit costs zero jobs;
    * a miss counts the already-materialized cut frame (cheap re-read,
    * never a re-execution of the edge-producing plan).
    *
    * `capAt` bounds the local regime independently of the session conf
    * (hits' overflow clamp above); limit = 0 keeps forcing the
    * distributed arm with no count at all (chaos/pricing harness). */
  private def cutAndMaybeCollect(edges: DataFrame,
      capAt: Long = Long.MaxValue): (DataFrame, Option[Array[(Long, Long)]]) = {
    val e = edges.transform(Engine.cut)
    val limit = math.min(driverMaxEdges(e.sparkSession), capAt)
    if (limit > 0 && Engine.memoStat(edges, "graphEdges")(e.count()) <= limit) {
      val arr = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      (e, Some(arr))
    } else (e, None)
  }

  /** Gate + collect for the ONE-SHOT pair-graph operators (triangle
    * counts, local clustering, adamic-adar, assortativity) — the same
    * driverMaxEdges regime as the fixpoints, r19, with the
    * [[cutAndMaybeCollect]] cut-and-reuse discipline: the pair plan
    * executes exactly ONCE (the cut), the gate count and the local
    * fetch are cheap re-reads of the materialized blocks, and the
    * distributed arms consume the SAME cut instead of re-cutting
    * (review finding: the first cut-less version executed the lazy
    * pair plan twice on a cold gate hit). Below threshold the cut is
    * pair-set-sized (KBs at gate scale — not the q69 disk class);
    * callers release it either way. Ids are cast to Long (the
    * kCorePeel discipline). */
  private def cutAndMaybeCollectPairs(pairs: DataFrame)
      : (DataFrame, Option[Array[(Long, Long)]]) = {
    val pl = pairs.select(col("id_a").cast(LongType).as("id_a"),
      col("id_b").cast(LongType).as("id_b"))
    val cut = pl.transform(Engine.cut)
    val limit = driverMaxEdges(pairs.sparkSession)
    if (limit > 0 && Engine.memoStat(pl, "graphEdges")(cut.count()) <= limit)
      (cut, Some(cut.collect().map(r => (r.getLong(0), r.getLong(1)))))
    else (cut, None)
  }

  /** Degree + per-node-triangle maps over a collected canonical pair
    * multiset — the local twin of [[triangleCounts]]' dataflow,
    * multiset-exact: deg counts BOTH endpoints per pair instance (the
    * unionAll groupBy), each edge instance re-orients low -> high in
    * the (deg, id) total order, and a triangle chain (u->v, v->w, u->w)
    * contributes m(u,v)*m(v,w)*m(u,w) instances, one count to each
    * corner per instance — exactly the three-way join + explode. */
  private def triangleMapsLocal(pairs: Array[(Long, Long)])
      : (scala.collection.mutable.HashMap[Long, Long],
         scala.collection.mutable.HashMap[Long, Long]) = {
    val deg = new scala.collection.mutable.HashMap[Long, Long]()
    pairs.foreach { case (a, b) =>
      deg(a) = deg.getOrElse(a, 0L) + 1L
      deg(b) = deg.getOrElse(b, 0L) + 1L
    }
    def aFirst(a: Long, b: Long): Boolean = {
      val da = deg(a); val db = deg(b)
      da < db || (da == db && a < b)
    }
    val m = new scala.collection.mutable.HashMap[(Long, Long), Long]()
    pairs.foreach { case (a, b) =>
      val e = if (aFirst(a, b)) (a, b) else (b, a)
      m(e) = m.getOrElse(e, 0L) + 1L
    }
    val out = new scala.collection.mutable.HashMap[
      Long, scala.collection.mutable.ArrayBuffer[(Long, Long)]]()
    m.foreach { case ((u, v), c) =>
      out.getOrElseUpdate(u,
        new scala.collection.mutable.ArrayBuffer[(Long, Long)]()) += ((v, c))
    }
    val tri = new scala.collection.mutable.HashMap[Long, Long]()
    m.foreach { case ((u, v), muv) =>
      out.get(v).foreach(_.foreach { case (w, mvw) =>
        val muw = m.getOrElse((u, w), 0L)
        if (muw > 0) {
          val c = muv * mvw * muw
          tri(u) = tri.getOrElse(u, 0L) + c
          tri(v) = tri.getOrElse(v, 0L) + c
          tri(w) = tri.getOrElse(w, 0L) + c
        }
      })
    }
    (deg, tri)
  }

  /** Materialize a frame PRE-PARTITIONED on `key`, with the hash layout
    * PRESERVED into the cut (r19, verdict item 3 — guide §2.1/§2.4).
    * The iterative operators that cut lineage PER ROUND re-execute each
    * round as its own job, so runtime exchange reuse cannot help them:
    * every round re-shuffled the static |E|-sized adjacency before this.
    * A cut frame pre-partitioned on the round join key makes each
    * round's join read an already-partitioned table; only the small
    * (|V|-sized) score/frontier side still exchanges. The partition
    * count pins to spark.sql.shuffle.partitions — the session's scale
    * dial — and the materializing execution runs with AQE scoped off
    * ([[Engine.withoutAqe]]: an AQE-planned eager checkpoint reports
    * UnknownPartitioning and silently loses the layout; consumers still
    * plan under AQE and see the LogicalRDD's HashPartitioning). Only
    * the DISTRIBUTED regime calls this — the driver regime collects. */
  private def cutByKey(df: DataFrame, key: String): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption("graft.graph.copartition").contains("off"))
      return Engine.cut(df) // A/B escape hatch: the pre-r19 plain cut
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    Engine.withoutAqe(spark) {
      Engine.cut(df.repartition(p, col(key)))
    }
  }

  /** The node ids appearing in a collected edge list, as a local
    * relation — the broadcast-semi-join key set that lets the driver
    * regime read only the edge-touched slice of a distributed node /
    * seed table (isolated rows keep their closed-form value, attached
    * by coalesce exactly like the distributed left joins). */
  private def touchedDf(spark: SparkSession,
      edges: Array[(Long, Long)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val ids = edges.iterator.flatMap(e => Iterator(e._1, e._2))
      .toSet.toSeq.map(org.apache.spark.sql.Row(_: Long))
    spark.createDataFrame(ids.asJava,
      StructType(Seq(StructField("id", LongType))))
  }

  private def longMapDf(spark: SparkSession, m: Iterable[(Long, Long)],
      valueName: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      m.toSeq.map { case (k, v) => org.apache.spark.sql.Row(k, v) }.asJava,
      StructType(Seq(StructField("id", LongType),
        StructField(valueName, LongType))))
  }

  /** Fixed-iteration PageRank. `edges` is the DIRECTED edge list (src,
    * dst) — pass both directions for an undirected graph; `nodes` is
    * (id), the full node set (isolated nodes keep the damping floor).
    * rank_0 = 1; rank_{i+1}(v) = (1-d) + d * sum_{u->v} rank_i(u)/deg(u)
    * (the unnormalized formulation: ranks sum to ~|V|, avoiding a 1/N
    * division whose rounding the oracle would have to reproduce).
    * Damping is fixed at 0.8 (the 4/5 in the update).
    *
    * Arithmetic is FIXED-POINT (rank in integer micro-units, `div`
    * floor division for both the per-edge rank/deg and the damping
    * 4s/5) — the [[labelPropagation]] determinism discipline. The
    * earlier float formulation rounded each rank/deg quotient to 6dp,
    * which is a TRUE 7th-digit halfway case whenever an odd-6th-digit
    * rank meets a degree-2 node: Spark rounds the shortest decimal
    * repr ("0.xxxxxx5" -> HALF_UP up) while DuckDB rounds the binary
    * value (x*1e6 lands a hair below .5 -> down), so the engines split
    * ~half of such ties (observed with damping 0.85: 0.5930625 ->
    * 0.593063 vs 0.593062; the same class as g02's observed
    * 0.483333/0.483334 split). Integer floor division has no ties to
    * disagree on, under ANY partitioning or engine. Emission is the
    * exact micros/1e6 double conversion (exact while rank micros stay
    * below 2^52 — ranks are O(|V|) only for a star hub). */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    // materialize adjacency + out-degree once; every iteration re-reads
    // this LogicalRDD instead of re-running the (possibly expensive)
    // edge-producing plan
    // the adjacency plan references `edges` twice (degree + join), so
    // materialize the edge source first — otherwise the edge-producing
    // plan executes once per reference (the d05 lesson)
    val (e, small) = cutAndMaybeCollect(
      edges.select(col("src").cast(LongType), col("dst").cast(LongType)))
    small.foreach { arr =>
      Engine.releaseCheckpoint(e)
      return pageRankLocal(arr, nodes, iters)
    }
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // r19: adjacency materialized pre-partitioned on the round join key
    // — each round's contribution join then reads it without an |E|-
    // sized exchange (only the rank side shuffles)
    val adj = cutByKey(e.join(deg, "src")
      .select(col("src"), col("dst"), col("deg")), "src")
    Engine.releaseCheckpoint(e)
    var ranks = nodes.select(col("id"), lit(1000000L).as("micros"))
    for (_ <- 1 to iters) {
      // contribution pass: one integer floor division per edge; the
      // shuffle on dst carries (dst, c) longs only
      val contribs = adj.join(ranks, col("src") === col("id"))
        .select(col("dst"), expr("micros div deg").as("c"))
      val sums = contribs.groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = nodes.join(sums, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(200000L) + expr("(4 * coalesce(s, 0L)) div 5")).as("micros"))
    }
    val out = ranks
      .select(col("id"), (col("micros").cast(DoubleType) / 1e6).as("rank"))
      .transform(Engine.cut)
    Engine.releaseCheckpoint(adj)
    out
  }

  /** Driver-local pageRank twin — op-for-op the distributed loop above
    * in Long arithmetic (micros div deg, 200000 + (4*s) div 5; all
    * operands nonnegative, so Java `/` IS the integral `div`).
    * Contributors are edge srcs PRESENT IN `nodes` (the distributed
    * inner join on ranks), receivers are nodes; isolated nodes land on
    * the closed-form damping floor the loop assigns them (1e6 at
    * iters=0, 2e5 after any iteration — the distributed left-join
    * coalesce path), attached here by the same left join. */
  private def pageRankLocal(edges: Array[(Long, Long)], nodes: DataFrame,
      iters: Int): DataFrame = {
    val spark = nodes.sparkSession
    // cast BEFORE collecting (r19, advice item): an IntegerType id
    // column — which the distributed arm accepts via implicit join
    // casts, and which bfsHopsLocal already casts — would otherwise
    // throw ClassCastException in the default (local) regime only
    val nodeSet = nodes.select(col("id").cast(LongType).as("id"))
      .join(broadcast(touchedDf(spark, edges)), Seq("id"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    val deg = new scala.collection.mutable.HashMap[Long, Long]()
    edges.foreach { case (s, _) => deg(s) = deg.getOrElse(s, 0L) + 1L }
    var micros = scala.collection.mutable.HashMap.empty[Long, Long]
    nodeSet.foreach(id => micros(id) = 1000000L)
    for (_ <- 1 to iters) {
      val sums = new scala.collection.mutable.HashMap[Long, Long]()
      edges.foreach { case (s, d) =>
        micros.get(s).foreach { m =>
          sums(d) = sums.getOrElse(d, 0L) + m / deg(s)
        }
      }
      val next = scala.collection.mutable.HashMap.empty[Long, Long]
      nodeSet.foreach { id =>
        next(id) = 200000L + (4L * sums.getOrElse(id, 0L)) / 5L
      }
      micros = next
    }
    val isolated = if (iters == 0) 1000000L else 200000L
    nodes.join(broadcast(longMapDf(spark, micros, "micros")), Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("micros"), lit(isolated)).cast(DoubleType) / 1e6)
          .as("rank"))
  }

  /** Fixed-iteration score/label propagation — the label-spreading
    * curation primitive (Zhu & Ghahramani 2002 family): a per-node seed
    * score (a quality rating, a trust label, a classifier output on a
    * labeled subset) diffuses over the similarity graph so unlabeled /
    * noisily-labeled members of a near-dup or kNN neighborhood inherit
    * their neighbors' consensus.
    * s_{t+1}(v) = (2*s_t(v) + 8*floor(sum_{u->v} s_t(u) / deg(v))) div 10;
    * isolated nodes keep their seed exactly.
    *
    * Arithmetic is FIXED-POINT: `seeds` carries integer micro-units
    * (`micros`, score x 1e6) and every step is integer sum + floor
    * division — no floating round() anywhere. This is deliberate: the
    * float formulation (mean of 6dp scores, alpha-blend, round 6)
    * lands EXACTLY on 7th-digit halfway points whenever a degree-2
    * node's neighbor sum has an odd 6th digit, and engines disagree on
    * halfway ties (Spark HALF_UP on the shortest repr vs DuckDB's
    * binary rounding — observed 0.483333 vs 0.483334 on this very
    * graph). Integer floor-div has no ties to disagree on, under ANY
    * partitioning. The floor-div-via-double here is exact while
    * |sum| < 2^52 and quotients sit >= 1/maxDeg from integers — both
    * hold by construction (micros <= 1e6, integer numerators).
    *
    * Same 100 TB iteration shape as [[pageRank]]: adjacency+degree
    * materialized once, two shuffles per round (neighbor scores keyed
    * by dst; the score left-join), score table one row per node,
    * lineage cut per round. Emits (id, score DOUBLE) via the exact
    * micros/1e6 conversion.
    *
    * INPUT BOUND (r19, advice item): |micros| must stay < 2^53/10
    * (~9e14). Both regimes floor-divide VIA DOUBLE, so the identity
    * step floor((2s+8s)/10) = s that carries an untouched seed is
    * exact only inside that range; beyond it the local regime (which
    * attaches untouched-by-edges seeds by coalesce, skipping the
    * step) and the distributed regime (which runs every node through
    * it) could diverge. Gate inputs are bounded at 1e6 micros — nine
    * orders inside the bound. */
  def labelPropagation(edges: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    val (e0, small) = cutAndMaybeCollect(
      edges.select(col("src").cast(LongType), col("dst").cast(LongType)))
    small.foreach { arr =>
      Engine.releaseCheckpoint(e0)
      return labelPropagationLocal(arr, seeds, iters)
    }
    val e = e0
    val deg = e.groupBy("dst").agg(count(lit(1)).as("deg"))
    // r19: pre-partitioned on src (the per-round score-join key); each
    // round executes as its own cut job, so without this the static
    // adjacency re-shuffled every round
    val adj = cutByKey(e.join(deg, "dst")
      .select(col("src"), col("dst"), col("deg")), "src")
    Engine.releaseCheckpoint(e)
    var scores = seeds.select(col("id"), col("micros").cast(LongType).as("micros"))
    for (_ <- 1 to iters) {
      val means = adj.join(scores, col("src") === col("id"))
        .groupBy(col("dst"), col("deg"))
        .agg(sum(col("micros")).as("sm"))
        .select(col("dst"),
          floor(col("sm").cast(DoubleType) / col("deg")).cast(LongType).as("m"))
      val next = scores.join(means, col("id") === col("dst"), "left")
        .select(col("id"),
          floor((lit(2L) * col("micros")
            + lit(8L) * coalesce(col("m"), col("micros"))).cast(DoubleType) / 10)
            .cast(LongType).as("micros"))
        .transform(Engine.cut)
      Engine.releaseCheckpoint(scores)
      scores = next
    }
    val out = scores.select(col("id"),
      (col("micros").cast(DoubleType) / 1e6).as("score"))
    Engine.releaseCheckpoint(adj)
    out
  }

  /** Driver-local labelPropagation twin — the SAME floor-div-via-double
    * steps as the distributed loop (Math.floor over the identical IEEE
    * double division, so the regimes cannot split even on the values
    * the floor-div exactness note bounds). Contributors are seed rows
    * (the distributed inner join on scores); a seed with no incoming
    * edge keeps its value through the identity step
    * floor((2s + 8s)/10) = s, which is also EXACT for untouched seeds
    * — they are attached by coalesce without simulation. */
  private def labelPropagationLocal(edges: Array[(Long, Long)],
      seeds: DataFrame, iters: Int): DataFrame = {
    val spark = seeds.sparkSession
    val touched = touchedDf(spark, edges)
    // id cast mirrors pageRankLocal/bfsHopsLocal (advice item): an
    // IntegerType seed id must not CCE in the local regime only
    var micros = scala.collection.mutable.HashMap.empty[Long, Long] ++
      seeds.select(col("id").cast(LongType).as("id"),
          col("micros").cast(LongType))
        .join(broadcast(touched), Seq("id"), "left_semi")
        .collect().map(r => r.getLong(0) -> r.getLong(1))
    val deg = new scala.collection.mutable.HashMap[Long, Long]()
    edges.foreach { case (_, d) => deg(d) = deg.getOrElse(d, 0L) + 1L }
    for (_ <- 1 to iters) {
      val sums = new scala.collection.mutable.HashMap[Long, Long]()
      edges.foreach { case (s, d) =>
        micros.get(s).foreach { m => sums(d) = sums.getOrElse(d, 0L) + m }
      }
      val next = scala.collection.mutable.HashMap.empty[Long, Long]
      micros.foreach { case (id, cur) =>
        val m = sums.get(id) match {
          case Some(sm) => math.floor(sm.toDouble / deg(id)).toLong
          case None => cur
        }
        next(id) =
          math.floor((2L * cur + 8L * m).toDouble / 10).toLong
      }
      micros = next
    }
    seeds.join(broadcast(longMapDf(spark, micros, "out_micros")),
        Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("out_micros"), col("micros").cast(LongType))
          .cast(DoubleType) / 1e6).as("score"))
  }

  /** Per-node triangle counts over an undirected graph — the local
    * clustering signal on a near-dup/kNN graph (a document inside a
    * dense triangle cluster is mutually-corroborated duplicate
    * material; a high-degree node with NO triangles is hub-like
    * boilerplate touching many unrelated docs).
    *
    * `pairs` is the canonical (id_a < id_b) undirected edge list;
    * `nodes` is (id). Every edge is re-oriented low -> high in the
    * (degree, id) TOTAL order and each triangle is enumerated exactly
    * once as the oriented chain u->v, v->w, u->w. The orientation is
    * the textbook skew bound (Schank/Wagner): every out-neighborhood is
    * O(sqrt |E|), so the wedge join's per-key fan-out is bounded even
    * at a celebrity node — a plain id-orientation would put a hub's
    * whole neighborhood in one join key. The triangle SET is
    * orientation-independent (any total order enumerates each triangle
    * exactly once), which is what lets the SQL oracle use plain id
    * order while this side uses degree order.
    *
    * 100 TB shape: two self-join shuffles over the (bounded, capped
    * upstream) pair graph plus one count exchange; no iteration, no
    * driver state. */
  def triangleCounts(pairs: DataFrame, nodes: DataFrame): DataFrame = {
    // r19 dual-regime (the d05/fixpoint pattern applied to the one-shot
    // ops): below driverMaxEdges the count runs driver-locally;
    // GraphSpec parity pins it against the distributed arm below, which
    // consumes the gate's cut directly (referenced 5x; plan runs once)
    val (p, small) = cutAndMaybeCollectPairs(pairs)
    small.foreach { arr =>
      Engine.releaseCheckpoint(p)
      val tri = triangleMapsLocal(arr)._2
      return nodes
        .join(broadcast(longMapDf(nodes.sparkSession, tri, "tri")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("tri"), lit(0L)).as("triangles"))
    }
    val deg = p.select(col("id_a").as("id"))
      .unionAll(p.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("id_a") < col("id_b"))
    val e = p
      .join(deg.select(col("id").as("id_a"), col("deg").as("da")), "id_a")
      .join(deg.select(col("id").as("id_b"), col("deg").as("db")), "id_b")
      .select(when(aFirst, col("id_a")).otherwise(col("id_b")).as("u"),
        when(aFirst, col("id_b")).otherwise(col("id_a")).as("v"))
      .transform(Engine.cut)
    Engine.releaseCheckpoint(p)
    val e1 = e.select(col("u").as("a"), col("v").as("b"))
    val e2 = e.select(col("u").as("b"), col("v").as("c"))
    val e3 = e.select(col("u").as("a2"), col("v").as("c2"))
    val tri = e1.join(e2, "b")
      .join(e3, col("a") === col("a2") && col("c") === col("c2"))
      .select("a", "b", "c")
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    val out = nodes.join(perNode, Seq("id"), "left")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
      .transform(Engine.cut)
    Engine.releaseCheckpoint(e)
    out
  }

  /** Bounded-round k-core peeling — the dense-subgraph curation signal
    * (a near-dup cluster that survives 2-core peeling is mutually-
    * corroborated template/boilerplate material; pendant chains peel
    * away). Each round drops every node with current degree < k and
    * the edges touching it; `rounds` is FIXED (the g01/g02 oracle
    * discipline — an unrolled CTE cannot express run-to-fixpoint), and
    * in practice peeling converges within graph-diameter rounds.
    * Returns every node with its degree inside the surviving subgraph
    * (0 = peeled). All arithmetic is integer counting — nothing to
    * round, nothing to diverge.
    *
    * `edges` is the directed both-ways edge list of an undirected
    * graph. 100 TB shape: per round, one degree aggregation + two semi
    * joins on the shrinking edge table, materialized per round with the
    * previous round's blocks released (the iterative-consumer case
    * where checkpointing IS the right call — each round's table feeds
    * two joins and the next round). */
  def kCorePeel(edges: DataFrame, nodes: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    val (e1, small) = cutAndMaybeCollect(
      edges.select(col("src").cast(LongType), col("dst").cast(LongType)))
    small.foreach { arr =>
      Engine.releaseCheckpoint(e1)
      return kCorePeelLocal(arr, nodes, k, rounds)
    }
    val spark = edges.sparkSession
    if (!spark.conf.getOption("graft.kcore.delta").contains("off"))
      return kCorePeelDelta(e1, nodes, k, rounds)
    var e = e1
    for (_ <- 1 to rounds) {
      val alive = e.groupBy("src").agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= k).select(col("src").as("id"))
      val next = e.join(alive.select(col("id").as("src")), "src")
        .join(alive.select(col("id").as("dst")), "dst")
        .select("src", "dst").transform(Engine.cut)
      Engine.releaseCheckpoint(e)
      e = next
    }
    val deg = e.groupBy("src").agg(count(lit(1)).as("core_deg"))
    val out = nodes.join(deg, col("id") === col("src"), "left")
      .select(col("id"), coalesce(col("core_deg"), lit(0L)).as("core_deg"))
      .transform(Engine.cut)
    Engine.releaseCheckpoint(e)
    out
  }

  /** Delta-maintained distributed k-core (r19, the round's "Not yet
    * optimized" kCorePeel item): the rescan loop above re-aggregated
    * degrees from the FULL shrinking edge table and re-materialized
    * |E| blocks every round (one |E| exchange + one |E| localCheckpoint
    * write per round — the dominant decade-scale cost, and the q69
    * disk-window exposure class). Here the edge table materializes
    * ONCE, pre-partitioned on dst ([[cutByKey]], the r19 copartition
    * law), and each round maintains the |V|-sized degree table:
    *
    *   peel_r  = deg rows with dg < k           (nodes leaving now)
    *   delta   = eByDst ⋈ peel_r on dst, grouped by src
    *   deg_r+1 = (deg_r minus peel_r) - coalesce(delta, 0)
    *
    * Value identity with the rescan loop: an edge instance (v, u) is
    * subtracted from deg(v) exactly in the round u is peeled while v
    * is still alive — the round the rescan loop's double semi join
    * drops it (both-endpoints-same-round edges vanish with both rows;
    * earlier-dead endpoints cannot re-match peel_r because peel_r only
    * ever holds currently-alive rows). A node whose degree decays to 0
    * is peeled the following round with an empty probe — a no-op, and
    * its final coalesce(0) output matches the rescan arm's absent-row
    * 0. Per round this exchanges only peel/delta/deg (all <= |V|) and
    * SCANS the static partitioned edge table with no shuffle and no
    * re-write. Escape hatch `graft.kcore.delta=off` keeps the
    * pre-r19 rescan loop byte-identical (the A/B arm); GraphSpec
    * parity + the decade fingerprint A/B pin value identity. */
  private def kCorePeelDelta(e1: DataFrame, nodes: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    val eByDst = cutByKey(e1, "dst")
    Engine.releaseCheckpoint(e1)
    // Seed the degree table with EVERY endpoint: a dst-only node (an
    // asymmetric input — no out-edges) has no src-degree row, yet the
    // rescan loop treats it as dead in round 1 (alive = srcs with
    // deg >= k), dropping its incoming edges. A dg = 0 seed row makes
    // the delta arm peel it in round 1 and subtract those in-edges
    // identically. Symmetric inputs (every in-repo caller) produce an
    // empty anti join — no extra rows, no behavior change there; the
    // asymmetric case is pinned by GraphSpec's directed-triple test.
    val srcDeg = eByDst.groupBy("src").agg(count(lit(1)).as("dg"))
    val dstOnly = eByDst.select(col("dst").as("src")).distinct()
      .join(srcDeg.select("src"), Seq("src"), "left_anti")
      .withColumn("dg", lit(0L))
    var deg = srcDeg.unionByName(dstOnly).transform(Engine.cut)
    for (_ <- 1 to rounds) {
      val peel = deg.filter(col("dg") < k).select(col("src").as("pid"))
      val delta = eByDst.join(peel, col("dst") === col("pid"))
        .groupBy("src").agg(count(lit(1)).as("rm"))
      val next = deg.filter(col("dg") >= k)
        .join(delta, Seq("src"), "left")
        .select(col("src"),
          (col("dg") - coalesce(col("rm"), lit(0L))).as("dg"))
        .transform(Engine.cut)
      Engine.releaseCheckpoint(deg)
      deg = next
    }
    val out = nodes.join(deg, col("id") === col("src"), "left")
      .select(col("id"), coalesce(col("dg"), lit(0L)).as("core_deg"))
      .transform(Engine.cut)
    Engine.releaseCheckpoint(deg)
    Engine.releaseCheckpoint(eByDst)
    out
  }

  /** Driver-local kCorePeel twin — the exact multiset peel of the
    * distributed loop: per round, degree = count by src over the
    * CURRENT edge list (duplicates counted, like the groupBy), alive =
    * srcs at degree >= k, edges survive only with BOTH endpoints
    * alive. Pure integer counting — nothing to diverge. */
  private def kCorePeelLocal(edges0: Array[(Long, Long)], nodes: DataFrame,
      k: Int, rounds: Int): DataFrame = {
    val spark = nodes.sparkSession
    var edges = edges0
    for (_ <- 1 to rounds) {
      val deg = new scala.collection.mutable.HashMap[Long, Long]()
      edges.foreach { case (s, _) => deg(s) = deg.getOrElse(s, 0L) + 1L }
      val alive = deg.collect { case (id, d) if d >= k => id }.toSet
      edges = edges.filter { case (s, d) => alive(s) && alive(d) }
    }
    val deg = new scala.collection.mutable.HashMap[Long, Long]()
    edges.foreach { case (s, _) => deg(s) = deg.getOrElse(s, 0L) + 1L }
    nodes.join(broadcast(longMapDf(spark, deg, "dg")), Seq("id"), "left")
      .select(col("id"), coalesce(col("dg"), lit(0L)).as("core_deg"))
  }

  /** Bounded-round multi-source BFS: minimum hop distance from any
    * seed node, exploring `rounds` hops (r-hop reachability — the
    * "neighborhood of a known-bad/known-good set" curation query:
    * everything within 2 hops of a spam cluster, everything reachable
    * from a trusted seed set). Pure integer min-distance propagation —
    * nothing to round. Fixed rounds keep the unrolled-CTE oracle exact
    * (the g01/g02/g04 discipline); unreached nodes are absent from the
    * output.
    *
    * 100 TB shape: per round, one frontier-edge join (keyed on src) +
    * one min-aggregate, both over the distance table (<= |V| rows, one
    * row per reached node), materialized per round with the previous
    * round's blocks released.
    *
    * CONTRACT (r19, advice item): rounds >= 1 and Long-typed seed ids.
    * At rounds = 0 the distributed arm returns the seed frame verbatim
    * (duplicates preserved, original id type) while the local twin
    * dedups into a HashMap and emits LongType — a multiplicity/schema
    * divergence no in-repo caller can hit (every caller passes a
    * distinct-id seed table and rounds >= 1), documented rather than
    * papered over with a groupBy the real callers would pay for. */
  def bfsHops(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame =
    // constraint propagation disabled for the loop's planning: the
    // frontier-union shape trips Union.rewriteConstraints on some
    // inputs (first seen on the decade-3 mutual-kNN edge fixture —
    // planner NoSuchElementException, see Engine Scaladoc); each
    // round's cut materializes inside this scope, and the returned
    // frame is the last cut (ExistingRDD), so no consumer replans the
    // union outside it
    Engine.withoutConstraintPropagation(edges.sparkSession) {
      // one materialization of the edge plan for BOTH regimes (r18:
      // the pre-r18 loop joined the RAW edge plan every round — a
      // possibly-expensive build executed `rounds` times)
      val (e, small) = cutAndMaybeCollect(
        edges.select(col("src").cast(LongType), col("dst").cast(LongType)))
      small.foreach { arr =>
        Engine.releaseCheckpoint(e)
        return bfsHopsLocal(arr, seeds, rounds)
      }
      // r19 NOTE: bfs deliberately does NOT pre-partition the edge
      // table (unlike pageRank/labelPropagation/hits): the frontier
      // side is |reached|-sized and BROADCASTS, so the per-round join
      // never exchanged the edge side to begin with — the decade-3 A/B
      // measured the eager |E| repartition+cut as a 3.5x REGRESSION
      // (3.65 s plain vs 12.74 s pre-partitioned, fingerprints equal).
      var dist = seeds.select(col("id"), lit(0).as("dist")).transform(Engine.cut)
      for (r <- 1 to rounds) {
        val next = dist.join(e, col("id") === col("src"))
          .select(col("dst").as("id"), lit(r).as("dist"))
          .unionByName(dist)
          .groupBy("id").agg(min("dist").as("dist"))
          .transform(Engine.cut)
        Engine.releaseCheckpoint(dist)
        dist = next
      }
      Engine.releaseCheckpoint(e)
      dist
    }

  /** Driver-local bfsHops twin — the same min-distance propagation in
    * integer hops; the dist table is seeds ∪ reached nodes, exactly
    * the distributed union-min. Seeds are collected (the frontier
    * table is bounded by the reachable set, itself bounded by the
    * collected edge list plus the seed count). */
  private def bfsHopsLocal(edges: Array[(Long, Long)], seeds: DataFrame,
      rounds: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    val spark = seeds.sparkSession
    val dist = scala.collection.mutable.HashMap.empty[Long, Int] ++
      seeds.select(col("id").cast(LongType)).collect().map(_.getLong(0) -> 0)
    for (r <- 1 to rounds) {
      val reached = edges.iterator.collect {
        case (s, d) if dist.get(s).exists(_ < r) => d
      }.toArray
      reached.foreach { d => if (!dist.get(d).exists(_ <= r)) dist(d) = r }
    }
    spark.createDataFrame(
      dist.toSeq.map { case (id, h) => org.apache.spark.sql.Row(id, h) }.asJava,
      StructType(Seq(StructField("id", LongType),
        StructField("dist", IntegerType))))
  }

  private def docs(s: SparkSession, d: String): DataFrame =
    Engine.table(s, d, "documents")

  val defs: Seq[GQ] = Seq(
    // PageRank over the d04/d05 bounded near-dup graph, 3 iterations.
    // The oracle unrolls the iteration as a CTE chain with the SAME
    // integer floor-div arithmetic — both engines compute identical
    // micro-unit ranks with no float rounding in the loop at all, so
    // this hash-matches despite being an iterative algorithm (see
    // pageRank's determinism note for why fixed point, not 6dp floats).
    GQ("g01_pagerank", {
      def step(prev: String, cur: String): String =
        s"""c$cur AS (SELECT e.dst, r.micros // d.deg AS c
              FROM edges e JOIN deg d ON e.src = d.src
              JOIN r$prev r ON r.id = e.src),
            r$cur AS (SELECT n.id,
                200000 + (4 * COALESCE(SUM(c), 0)) // 5 AS micros
              FROM nodes n LEFT JOIN c$cur ON n.id = c$cur.dst
              GROUP BY n.id)"""
      Some(s"""WITH ${Dedup.ngramPairCtes},
        p AS (SELECT id_a, id_b FROM it
              JOIN sz sa ON id_a = sa.doc_id
              JOIN sz sb ON id_b = sb.doc_id
              WHERE round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 6) >= 0.02),
        edges AS (SELECT id_a AS src, id_b AS dst FROM p
                  UNION ALL SELECT id_b, id_a FROM p),
        nodes AS (SELECT doc_id AS id FROM documents WHERE doc_id < 300),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS micros FROM nodes),
        ${step("0", "1")}, ${step("1", "2")}, ${step("2", "3")}
        SELECT id, CAST(micros AS DOUBLE) / 1000000 AS rank FROM r3""")
    },
      (s, d) => {
        val dd = docs(s, d).filter(col("doc_id") < 300)
        val pairs = Dedup.ngramJaccardPairs(dd, "doc_id", "text", 3, 0.02)
          .select("id_a", "id_b")
        val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        pageRank(edges, dd.select(col("doc_id").as("id")), iters = 3)
      }),

    // Label propagation over the same near-dup graph, 2 iterations,
    // seeded with a deterministic fixed-point score ((doc_id % 11) x
    // 100000 micro-units — a stand-in for a quality rating on a
    // labeled subset). Oracle = the unrolled CTE chain with the
    // identical integer floor-div arithmetic, so the iterative
    // diffusion hash-matches across engines with no float rounding in
    // the loop at all (see labelPropagation's determinism note).
    GQ("g02_label_prop", {
      def step(prev: String, cur: String): String =
        s"""m$cur AS (SELECT e.dst AS id,
                CAST(floor(CAST(SUM(s.micros) AS DOUBLE) / d.deg) AS BIGINT) AS m
              FROM edges e JOIN deg d ON e.dst = d.dst
              JOIN s$prev s ON s.id = e.src GROUP BY e.dst, d.deg),
            s$cur AS (SELECT s.id,
                CAST(floor(CAST(2 * s.micros + 8 * COALESCE(m.m, s.micros)
                  AS DOUBLE) / 10) AS BIGINT) AS micros
              FROM s$prev s LEFT JOIN m$cur m USING (id))"""
      Some(s"""WITH ${Dedup.ngramPairCtes},
        p AS (SELECT id_a, id_b FROM it
              JOIN sz sa ON id_a = sa.doc_id
              JOIN sz sb ON id_b = sb.doc_id
              WHERE round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 6) >= 0.02),
        edges AS (SELECT id_a AS src, id_b AS dst FROM p
                  UNION ALL SELECT id_b, id_a FROM p),
        deg AS (SELECT dst, COUNT(*) AS deg FROM edges GROUP BY dst),
        s0 AS (SELECT doc_id AS id,
                 CAST((doc_id % 11) * 100000 AS BIGINT) AS micros
               FROM documents WHERE doc_id < 300),
        ${step("0", "1")}, ${step("1", "2")}
        SELECT id, CAST(micros AS DOUBLE) / 1000000 AS score FROM s2""")
    },
      (s, d) => {
        val dd = docs(s, d).filter(col("doc_id") < 300)
        val pairs = Dedup.ngramJaccardPairs(dd, "doc_id", "text", 3, 0.02)
          .select("id_a", "id_b")
        val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        val seeds = dd.select(col("doc_id").as("id"),
          ((col("doc_id") % 11) * 100000L).as("micros"))
        labelPropagation(edges, seeds, iters = 2)
      }),

    // Triangle counts over the same near-dup graph. The oracle
    // enumerates each triangle once via plain id order (u<v<w chain);
    // the Spark side uses degree order for the skew bound — identical
    // triangle sets (see triangleCounts doc).
    GQ("g03_triangle_count",
      Some(s"""WITH ${Dedup.ngramPairCtes},
        p AS (SELECT id_a, id_b FROM it
              JOIN sz sa ON id_a = sa.doc_id
              JOIN sz sb ON id_b = sb.doc_id
              WHERE round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 6) >= 0.02),
        tri AS (SELECT p1.id_a AS a, p1.id_b AS b, p2.id_b AS c
                FROM p p1 JOIN p p2 ON p1.id_b = p2.id_a
                JOIN p p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b),
        m AS (SELECT id, COUNT(*) AS triangles FROM (
                SELECT a AS id FROM tri
                UNION ALL SELECT b AS id FROM tri
                UNION ALL SELECT c AS id FROM tri)
              GROUP BY id)
        SELECT n.doc_id AS id, COALESCE(m.triangles, 0) AS triangles
        FROM (SELECT doc_id FROM documents WHERE doc_id < 300) n
        LEFT JOIN m ON m.id = n.doc_id"""),
      (s, d) => {
        val dd = docs(s, d).filter(col("doc_id") < 300)
        val pairs = Dedup.ngramJaccardPairs(dd, "doc_id", "text", 3, 0.02)
          .select("id_a", "id_b")
        triangleCounts(pairs, dd.select(col("doc_id").as("id")))
      }),

    // 2-core peeling, 3 rounds, over the same near-dup graph. Pure
    // integer counting -> the unrolled-CTE oracle matches exactly.
    GQ("g04_kcore_peel", {
      def round(prev: String, cur: String): String =
        s"""a$cur AS (SELECT src AS id FROM e$prev
              GROUP BY src HAVING COUNT(*) >= 2),
            e$cur AS (SELECT e.src, e.dst FROM e$prev e
              JOIN a$cur x ON e.src = x.id
              JOIN a$cur y ON e.dst = y.id)"""
      Some(s"""WITH ${Dedup.ngramPairCtes},
        p AS (SELECT id_a, id_b FROM it
              JOIN sz sa ON id_a = sa.doc_id
              JOIN sz sb ON id_b = sb.doc_id
              WHERE round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 6) >= 0.02),
        e0 AS (SELECT id_a AS src, id_b AS dst FROM p
               UNION ALL SELECT id_b, id_a FROM p),
        ${round("0", "1")}, ${round("1", "2")}, ${round("2", "3")}
        SELECT n.doc_id AS id, COALESCE(d.dg, 0) AS core_deg
        FROM (SELECT doc_id FROM documents WHERE doc_id < 300) n
        LEFT JOIN (SELECT src, COUNT(*) AS dg FROM e3 GROUP BY src) d
          ON n.doc_id = d.src""")
    },
      (s, d) => {
        val dd = docs(s, d).filter(col("doc_id") < 300)
        val pairs = Dedup.ngramJaccardPairs(dd, "doc_id", "text", 3, 0.02)
          .select("id_a", "id_b")
        val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        kCorePeel(edges, dd.select(col("doc_id").as("id")), k = 2, rounds = 3)
      }),

    // 3-hop multi-source BFS from the doc_id % 50 seed set over the
    // same near-dup graph: integer min-distance, unrolled-CTE oracle.
    GQ("g05_bfs_hops", {
      def round(prev: String, cur: String, r: Int): String =
        s"""b$cur AS (SELECT id, MIN(dist) AS dist FROM (
              SELECT e.dst AS id, $r AS dist FROM edges e
              JOIN b$prev b ON e.src = b.id
              UNION ALL SELECT id, dist FROM b$prev) GROUP BY id)"""
      Some(s"""WITH ${Dedup.ngramPairCtes},
        p AS (SELECT id_a, id_b FROM it
              JOIN sz sa ON id_a = sa.doc_id
              JOIN sz sb ON id_b = sb.doc_id
              WHERE round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 6) >= 0.02),
        edges AS (SELECT id_a AS src, id_b AS dst FROM p
                  UNION ALL SELECT id_b, id_a FROM p),
        b0 AS (SELECT doc_id AS id, 0 AS dist FROM documents
               WHERE doc_id < 300 AND doc_id % 50 = 0),
        ${round("0", "1", 1)}, ${round("1", "2", 2)}, ${round("2", "3", 3)}
        SELECT id, dist FROM b3""")
    },
      (s, d) => {
        val dd = docs(s, d).filter(col("doc_id") < 300)
        val pairs = Dedup.ngramJaccardPairs(dd, "doc_id", "text", 3, 0.02)
          .select("id_a", "id_b")
        val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        val seeds = dd.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("id"))
        bfsHops(edges, seeds, rounds = 3)
      }),

    // Adamic-Adar link prediction over the same near-dup graph:
    // candidate pairs at distance 2 (sharing >= 1 neighbor, not
    // adjacent), scored by sum_b 1/ln(deg(b)) — rare shared neighbors
    // count more (Adamic & Adar 2003). The curation read: a
    // high-scoring non-edge is a near-dup the pair generator likely
    // MISSED. Per-contribution doubles are pre-rounded to 6dp and
    // summed in DECIMAL (the t18/g01 order-independence discipline);
    // 1/ln(deg) is irrational so a 7th-digit halfway tie cannot occur.
    GQ("g06_adamic_adar",
      Some(s"""WITH ${Dedup.ngramPairCtes},
        p AS (SELECT id_a, id_b FROM it
              JOIN sz sa ON id_a = sa.doc_id
              JOIN sz sb ON id_b = sb.doc_id
              WHERE round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 6) >= 0.02),
        e AS (SELECT id_a AS src, id_b AS dst FROM p
              UNION ALL SELECT id_b, id_a FROM p),
        dg AS (SELECT src AS id, COUNT(*) AS deg FROM e GROUP BY 1),
        w AS (SELECT x.src AS a, dg.deg AS deg, y.dst AS c
              FROM e x JOIN dg ON x.dst = dg.id AND dg.deg <= 64
              JOIN e y ON y.src = dg.id
              WHERE x.src < y.dst),
        nw AS (SELECT a, deg, c FROM w WHERE NOT EXISTS
               (SELECT 1 FROM p WHERE p.id_a = w.a AND p.id_b = w.c))
        SELECT a, c, CAST(COUNT(*) AS INT) AS n_common,
               ${GQ.osum("round(1.0 / ln(deg), 6)")} AS aa_score
        FROM nw GROUP BY a, c"""),
      (s, d) => {
        val dd = docs(s, d).filter(col("doc_id") < 300)
        val pairs = Dedup.ngramJaccardPairs(dd, "doc_id", "text", 3, 0.02)
          .select("id_a", "id_b")
        adamicAdar(pairs, maxMidDegree = 64)
      }),

    // Degree assortativity (Newman 2002): Pearson correlation between
    // the degrees at the two ends of every edge, over the same
    // near-dup graph. Positive = hubs link to hubs (a template family
    // whose members all resemble each other), negative = hub-and-spoke
    // (one canonical page with many variants) — it tells a curation
    // pipeline WHICH dedup survivor policy fits the corpus. All six
    // moments are exact BIGINT sums over integer degrees (the q55
    // discipline); the one double expression is written identically in
    // both engines, and its sqrt inputs are integers (sqrt is
    // correctly rounded, so no engine divergence), with the 6dp round
    // on an irrational quotient (the g06 no-halfway-tie argument).
    // At 100 TB the moment sums would widen to DECIMAL(38,0); the
    // dataflow (one deg groupBy, two broadcast-size joins back to the
    // edge list, one scalar agg) is unchanged.
    GQ("g07_assortativity",
      Some(s"""WITH ${Dedup.ngramPairCtes},
        p AS (SELECT id_a, id_b FROM it
              JOIN sz sa ON id_a = sa.doc_id
              JOIN sz sb ON id_b = sb.doc_id
              WHERE round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 6) >= 0.02),
        e AS (SELECT id_a AS src, id_b AS dst FROM p
              UNION ALL SELECT id_b, id_a FROM p),
        dg AS (SELECT src AS id, COUNT(*) AS deg FROM e GROUP BY 1),
        j AS (SELECT dx.deg AS x, dy.deg AS y FROM e
              JOIN dg dx ON e.src = dx.id JOIN dg dy ON e.dst = dy.id),
        s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x*y) AS BIGINT) AS sxy,
                     CAST(SUM(x*x) AS BIGINT) AS sxx,
                     CAST(SUM(y*y) AS BIGINT) AS syy FROM j)
        SELECT CAST(n AS INT) AS n_edges,
               round(CAST(n*sxy - sx*sy AS DOUBLE) /
                     (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
                      sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6) AS assortativity
        FROM s"""),
      (s, d) => {
        val dd = docs(s, d).filter(col("doc_id") < 300)
        val pairs = Dedup.ngramJaccardPairs(dd, "doc_id", "text", 3, 0.02)
          .select("id_a", "id_b")
        degreeAssortativity(pairs)
      }),

    // HITS hubs & authorities over the same near-dup digraph, 2
    // iterations, max-normalized. Same fixed-point discipline as
    // g01/g02: all accumulation is exact integer sums of micro-unit
    // scores, and the per-round normalization is an integer floor
    // division by the round's max — no float rounding anywhere in the
    // loop, so the unrolled-CTE oracle matches bit for bit.
    GQ("g08_hits", {
      def half(scores: String, edgeKey: String, groupKey: String,
          cur: String): String =
        s"""${cur}_raw AS (SELECT e.$groupKey AS id,
              CAST(SUM(s.micros) AS BIGINT) AS raw
              FROM edges e JOIN $scores s ON e.$edgeKey = s.id GROUP BY 1),
            ${cur}_mx AS (SELECT MAX(raw) AS mx FROM ${cur}_raw),
            $cur AS (SELECT n.id,
                CAST(CAST(COALESCE(r.raw, 0) AS HUGEINT) * 1000000
                     // GREATEST(mx, 1) AS BIGINT) AS micros
              FROM nodes n LEFT JOIN ${cur}_raw r ON n.id = r.id
              CROSS JOIN ${cur}_mx)"""
      Some(s"""WITH ${Dedup.ngramPairCtes},
        p AS (SELECT id_a, id_b FROM it
              JOIN sz sa ON id_a = sa.doc_id
              JOIN sz sb ON id_b = sb.doc_id
              WHERE round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 6) >= 0.02),
        edges AS (SELECT id_a AS src, id_b AS dst FROM p
                  UNION ALL SELECT id_b, id_a FROM p),
        nodes AS (SELECT doc_id AS id FROM documents WHERE doc_id < 300),
        h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS micros FROM nodes),
        ${half("h0", "src", "dst", "a1")},
        ${half("a1", "dst", "src", "h1")},
        ${half("h1", "src", "dst", "a2")},
        ${half("a2", "dst", "src", "h2")}
        SELECT a2.id, CAST(a2.micros AS DOUBLE) / 1000000 AS authority,
               CAST(h2.micros AS DOUBLE) / 1000000 AS hub
        FROM a2 JOIN h2 ON a2.id = h2.id""")
    },
      (s, d) => {
        val dd = docs(s, d).filter(col("doc_id") < 300)
        val pairs = Dedup.ngramJaccardPairs(dd, "doc_id", "text", 3, 0.02)
          .select("id_a", "id_b")
        val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        hits(edges, dd.select(col("doc_id").as("id")), iters = 2)
      }),

    // Local clustering coefficient — the per-node "how clique-like is
    // my neighborhood" signal (Watts & Strogatz 1998): 2·tri(v) /
    // (deg(v)·(deg(v)−1)). On a near-dup graph, high-coefficient nodes
    // sit inside tight mirror clusters (safe to collapse to one
    // survivor); low-coefficient high-degree nodes are template hubs
    // stitching unrelated documents (split, don't collapse). Builds on
    // g03's per-node triangle counts plus the degree table; the
    // coefficient is an integer floor division in micro-units — no
    // float rounding, so the CTE oracle matches exactly.
    GQ("g10_local_clustering",
      Some(s"""WITH ${Dedup.ngramPairCtes},
        p AS (SELECT id_a, id_b FROM it
              JOIN sz sa ON id_a = sa.doc_id
              JOIN sz sb ON id_b = sb.doc_id
              WHERE round(CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic), 6) >= 0.02),
        dg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                 SELECT id_a AS id FROM p UNION ALL SELECT id_b FROM p)
               GROUP BY 1),
        tri AS (SELECT p1.id_a AS a, p1.id_b AS b, p2.id_b AS c
                FROM p p1 JOIN p p2 ON p1.id_b = p2.id_a
                JOIN p p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b),
        m AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
                SELECT a AS id FROM tri
                UNION ALL SELECT b AS id FROM tri
                UNION ALL SELECT c AS id FROM tri)
              GROUP BY id)
        SELECT n.doc_id AS id,
               CAST(COALESCE(dg.deg, 0) AS INT) AS deg,
               COALESCE(m.triangles, 0) AS triangles,
               CASE WHEN COALESCE(dg.deg, 0) >= 2
                 THEN CAST((2 * COALESCE(m.triangles, 0) * 1000000)
                           // (dg.deg * (dg.deg - 1)) AS DOUBLE) / 1e6
                 ELSE 0.0 END AS clustering
        FROM (SELECT doc_id FROM documents WHERE doc_id < 300) n
        LEFT JOIN dg ON dg.id = n.doc_id
        LEFT JOIN m ON m.id = n.doc_id"""),
      (s, d) => {
        val dd = docs(s, d).filter(col("doc_id") < 300)
        val pairs = Dedup.ngramJaccardPairs(dd, "doc_id", "text", 3, 0.02)
          .select("id_a", "id_b")
        localClustering(pairs, dd.select(col("doc_id").as("id")))
      })
  )

  /** Newman degree assortativity of an undirected graph. `pairs` is
    * the canonical edge list (id_a < id_b); both directions enter the
    * correlation so it is symmetric by construction. The degree table
    * is |V| rows (broadcasts; falls back to an id-keyed shuffle join
    * beyond the threshold) and the result is one row. */
  /** Spark `round(x, 6)` on a double, driver-side: not-finite passes
    * through, else BigDecimal.valueOf + HALF_UP — the kmeansLocal-
    * verified quantization twin. */
  private def round6Local(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  /** [[Engine.decOut]]'s emission, driver-side, over an exact
    * DECIMAL(38,10)-scale sum: quantize to 6dp (HALF_UP), then the
    * small-magnitude branch emits (d * 1e6).toLong / 1e6. */
  private def decOutLocal(s: java.math.BigDecimal): Double = {
    val d = s.setScale(6, java.math.RoundingMode.HALF_UP)
    if (math.abs(d.doubleValue) < 9.0e12)
      d.movePointRight(6).longValueExact.toDouble / 1e6
    else d.doubleValue
  }

  def degreeAssortativity(pairs: DataFrame): DataFrame = {
    // r19 dual-regime: the six moment sums fold driver-locally below
    // driverMaxEdges — same Long ring arithmetic (wrap included), same
    // double expression, same 6dp round; GraphSpec parity pins it.
    // Above threshold the distributed arm consumes the gate's cut —
    // the pre-r19 lazy shape executed the pair-generation subtree once
    // per union arm; reading the materialized blocks twice is strictly
    // less work.
    val (pCut, small) = cutAndMaybeCollectPairs(pairs)
    small.foreach { arr =>
      Engine.releaseCheckpoint(pCut)
      val spark = pairs.sparkSession
      val deg = new scala.collection.mutable.HashMap[Long, Long]()
      arr.foreach { case (a, b) =>
        deg(a) = deg.getOrElse(a, 0L) + 1L
        deg(b) = deg.getOrElse(b, 0L) + 1L
      }
      var n = 0L; var sx = 0L; var sy = 0L
      var sxy = 0L; var sxx = 0L; var syy = 0L
      arr.foreach { case (a, b) =>
        val da = deg(a); val db = deg(b)
        n += 2L; sx += da + db; sy += da + db
        sxy += 2L * da * db
        sxx += da * da + db * db; syy += da * da + db * db
      }
      val row =
        if (n == 0L) org.apache.spark.sql.Row(0, null)
        else org.apache.spark.sql.Row(n.toInt, round6Local(
          (n * sxy - sx * sy).toDouble /
            (math.sqrt((n * sxx - sx * sx).toDouble) *
              math.sqrt((n * syy - sy * sy).toDouble))))
      return spark.createDataFrame(
        java.util.Arrays.asList(row),
        StructType(Seq(StructField("n_edges", IntegerType),
          StructField("assortativity", DoubleType))))
    }
    val e = pCut.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pCut.select(col("id_b").as("src"), col("id_a").as("dst")))
    val dg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
    // the 1-row result cuts eagerly (the sibling ops' shape) so the
    // gate's pair cut can release before returning
    val out = e.join(dg.as("dx"), col("src") === col("dx.id"))
      .join(dg.as("dy"), col("dst") === col("dy.id"))
      .select(col("dx.deg").as("x"), col("dy.deg").as("y"))
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n").cast(IntegerType).as("n_edges"),
        expr("round(CAST(n*sxy - sx*sy AS DOUBLE) / " +
          "(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * " +
          "sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6)").as("assortativity"))
      .transform(Engine.cut)
    Engine.releaseCheckpoint(pCut)
    out
  }

  /** Adamic-Adar scores for every non-adjacent pair sharing a common
    * neighbor. `pairs` is the canonical undirected edge list
    * (id_a < id_b). The wedge join through a middle node b generates
    * deg(b)^2 candidates — the quadratic dial — so middle nodes above
    * `maxMidDegree` are excluded (a hub everyone touches predicts
    * nothing anyway: its 1/ln(deg) contribution vanishes while its
    * wedge count explodes; the d02/d07 maxBucket discipline applied to
    * graphs). One wedge shuffle keyed on b, one anti join against the
    * edge set, one (a, c) aggregate. */
  def adamicAdar(pairs: DataFrame, maxMidDegree: Int): DataFrame = {
    // r19 dual-regime: wedge enumeration per capped mid node is
    // <= maxMidDegree^2 local work; contributions replicate the
    // distributed round(1/ln(deg), 6) -> DECIMAL(38,10) sum ->
    // decOut emission exactly (round6Local/decOutLocal). Ids emit as
    // Long (the kCorePeel cast discipline); GraphSpec parity pins it.
    val (pCut, small) = cutAndMaybeCollectPairs(pairs)
    small.foreach { arr =>
      Engine.releaseCheckpoint(pCut)
      val spark = pairs.sparkSession
      val deg = new scala.collection.mutable.HashMap[Long, Long]()
      val nbrs = new scala.collection.mutable.HashMap[
        Long, scala.collection.mutable.ArrayBuffer[Long]]()
      arr.foreach { case (a, b) =>
        deg(a) = deg.getOrElse(a, 0L) + 1L
        deg(b) = deg.getOrElse(b, 0L) + 1L
        nbrs.getOrElseUpdate(a,
          new scala.collection.mutable.ArrayBuffer[Long]()) += b
        nbrs.getOrElseUpdate(b,
          new scala.collection.mutable.ArrayBuffer[Long]()) += a
      }
      val pairSet = arr.toSet
      val nC = new scala.collection.mutable.HashMap[(Long, Long), Long]()
      val sC = new scala.collection.mutable.HashMap[
        (Long, Long), java.math.BigDecimal]()
      nbrs.foreach { case (b, ns) =>
        val db = deg(b)
        // ns.length == deg(b): a mid with < 2 neighbor instances emits
        // no wedge, and guarding here keeps 1/ln(1) = Inf out of the
        // decimal conversion (the distributed arm never evaluates it
        // either — its wedge join produces no row for such mids)
        if (db <= maxMidDegree && ns.length >= 2) {
          val contrib = java.math.BigDecimal
            .valueOf(round6Local(1.0 / math.log(db.toDouble)))
            .setScale(10, java.math.RoundingMode.HALF_UP)
          var i = 0
          while (i < ns.length) {
            var j = 0
            while (j < ns.length) {
              val a = ns(i); val c = ns(j)
              if (a < c && !pairSet((a, c))) {
                val k = (a, c)
                nC(k) = nC.getOrElse(k, 0L) + 1L
                sC(k) = sC.get(k).map(_.add(contrib)).getOrElse(contrib)
              }
              j += 1
            }
            i += 1
          }
        }
      }
      val rows = nC.keysIterator.map { k =>
        org.apache.spark.sql.Row(k._1, k._2, nC(k).toInt, decOutLocal(sC(k)))
      }.toSeq
      return spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField("a", LongType),
          StructField("c", LongType),
          StructField("n_common", IntegerType),
          StructField("aa_score", DoubleType))))
    }
    val p = pCut // the gate's cut; referenced 4x below, plan ran once
    val e = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(p.select(col("id_b").as("src"), col("id_a").as("dst")))
    val mid = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= maxMidDegree)
      .select(col("src").as("b"), col("deg"))
    val wedges = e.select(col("src").as("a"), col("dst").as("b"))
      .join(mid, "b")
      .join(e.select(col("src").as("b2"), col("dst").as("c")),
        col("b") === col("b2"))
      .filter(col("a") < col("c"))
    val nonAdj = wedges.join(
      p.select(col("id_a").as("a"), col("id_b").as("c")),
      Seq("a", "c"), "left_anti")
    val out = nonAdj.groupBy("a", "c")
      .agg(count(lit(1)).cast(IntegerType).as("n_common"),
        Engine.dsum(round(lit(1.0) / log(col("deg").cast(DoubleType)), 6))
          .as("aa_score"))
      .transform(Engine.cut)
    Engine.releaseCheckpoint(p)
    out
  }

  /** Per-node local clustering coefficient over the canonical
    * undirected edge list: 2·tri(v) / (deg(v)·(deg(v)−1)), 0 for
    * degree < 2. Triangle counting delegates to [[triangleCounts]]
    * (degree-oriented wedge join — each triangle enumerated once);
    * the degree rollup is one extra |E|-keyed aggregate, and the
    * coefficient itself is an exact integer floor division emitted as
    * micros/1e6 (no float rounding, any partitioning). */
  def localClustering(pairs: DataFrame, nodes: DataFrame): DataFrame = {
    // r19 dual-regime: one collect feeds BOTH the triangle pass and the
    // degree rollup; the coefficient expression below is the
    // distributed select verbatim over the broadcast-joined maps (deg
    // stays Long inside the div — only the emitted column casts to int)
    val (p, small) = cutAndMaybeCollectPairs(pairs)
    small.foreach { arr =>
      Engine.releaseCheckpoint(p)
      val (deg, tri) = triangleMapsLocal(arr)
      val spark = nodes.sparkSession
      return nodes
        .join(broadcast(longMapDf(spark, tri, "tri")), Seq("id"), "left")
        .join(broadcast(longMapDf(spark, deg, "deg")), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("deg"), lit(0L)).cast(IntegerType).as("deg"),
          coalesce(col("tri"), lit(0L)).as("triangles"),
          when(coalesce(col("deg"), lit(0L)) >= 2,
            expr("(2 * coalesce(tri, 0) * 1000000) div (deg * (deg - 1))")
              .cast(DoubleType) / 1e6)
            .otherwise(lit(0.0)).as("clustering"))
    }
    // the gate's cut feeds both the tri pass and deg below
    val tri = triangleCounts(p, nodes)
    val deg = p.select(col("id_a").as("id"))
      .unionAll(p.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val out = tri.join(deg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("deg"), lit(0L)).cast(IntegerType).as("deg"),
        col("triangles"),
        when(coalesce(col("deg"), lit(0L)) >= 2,
          expr("(2 * triangles * 1000000) div (deg * (deg - 1))")
            .cast(DoubleType) / 1e6)
          .otherwise(lit(0.0)).as("clustering"))
      .transform(Engine.cut)
    Engine.releaseCheckpoint(p)
    out
  }

  /** Fixed-iteration HITS (Kleinberg 1999): authority(v) accumulates
    * hub scores over in-edges, hub(u) accumulates authority scores
    * over out-edges, each half-step max-normalized so scores stay in
    * [0, 1]. On a curation graph authorities are the canonical copies
    * a cluster points at; hubs are aggregator/boilerplate documents.
    *
    * Fixed-point arithmetic throughout ([[pageRank]]'s determinism
    * discipline): scores are integer micro-units, accumulation is an
    * exact integer SUM, and normalization is `(raw * 1e6) div max` —
    * the multiply widened through DECIMAL(38,0) so it cannot overflow
    * long even when raw is |V|-scaled (the oracle widens through
    * HUGEINT identically). No ties, no rounding, any partitioning.
    *
    * 100 TB shape: adjacency materialized once; per half-step one
    * shuffle keyed by the gathering endpoint plus a 1-row max that
    * broadcasts back — score tables stay one row per node, lineage cut
    * per round like pageRank. */
  def hits(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    val (e0, small) = cutAndMaybeCollect(
      edges.select(col("src").cast(LongType), col("dst").cast(LongType)),
      capAt = HitsLocalMaxEdges)
    small.foreach { arr =>
      Engine.releaseCheckpoint(e0)
      return hitsLocal(arr, nodes, iters)
    }
    // r19: each half-step joins the static edge table on ALTERNATING
    // keys (src for the auth gather, dst for the hub gather) and every
    // half-step is its own cut job, so e re-shuffled twice per
    // iteration. Two pre-partitioned copies — one per key — make both
    // halves exchange only the |V|-sized score table. Storage is 2x|E|
    // once (evictable blocks, released below) vs 2 x iters exchanges.
    val eBySrc = cutByKey(e0, "src")
    val eByDst = cutByKey(e0, "dst")
    Engine.releaseCheckpoint(e0)
    val n = nodes.transform(Engine.cut)
    def half(scores: DataFrame, edgeKey: String, groupKey: String): DataFrame = {
      val e = if (edgeKey == "src") eBySrc else eByDst
      val raw = e.join(scores, e(edgeKey) === scores("id"))
        .groupBy(e(groupKey).as("rid"))
        .agg(sum("micros").as("raw"))
      val mx = raw.agg(max("raw").as("mx"))
      n.join(raw, col("id") === col("rid"), "left")
        .crossJoin(broadcast(mx))
        .select(col("id"),
          expr("CAST((CAST(coalesce(raw, 0L) AS DECIMAL(38,0)) * 1000000)" +
            " div greatest(mx, 1L) AS BIGINT)").as("micros"))
    }
    var hub = n.select(col("id"), lit(1000000L).as("micros"))
    var auth = hub
    // each half-step is checkpointed (lineage cut per round, the
    // pageRank shape); the tiny per-round tables release at the end
    val rounds = scala.collection.mutable.Buffer.empty[DataFrame]
    for (_ <- 1 to iters) {
      auth = half(hub, "src", "dst").transform(Engine.cut)
      hub = half(auth, "dst", "src").transform(Engine.cut)
      rounds += auth += hub
    }
    val out = auth.select(col("id"),
        (col("micros").cast(DoubleType) / 1e6).as("authority"))
      .join(hub.select(col("id"),
        (col("micros").cast(DoubleType) / 1e6).as("hub")), "id")
      .transform(Engine.cut)
    rounds.foreach(Engine.releaseCheckpoint)
    Engine.releaseCheckpoint(eBySrc)
    Engine.releaseCheckpoint(eByDst)
    Engine.releaseCheckpoint(n)
    out
  }

  /** Driver-local HITS twin — per half-step: integer raw sums gathered
    * over edges whose SCORE-side endpoint is a node (the distributed
    * inner join on scores), the round max taken over EVERY gathered id
    * (the raw table includes ids outside `nodes`; only node rows keep
    * scores — replicated exactly), and the normalization
    * (raw * 1e6) div max(mx, 1) in Long (safe under the edge
    * threshold: raw <= 1e6 x 2e6, x 1e6 < 2^63 — the reason the
    * default threshold is what it is). Isolated nodes normalize to 0
    * after any half-step, attached by coalesce. */
  private def hitsLocal(edges: Array[(Long, Long)], nodes: DataFrame,
      iters: Int): DataFrame = {
    val spark = nodes.sparkSession
    // id cast mirrors pageRankLocal (advice item)
    val nodeSet = nodes.select(col("id").cast(LongType).as("id"))
      .join(broadcast(touchedDf(spark, edges)), Seq("id"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    def half(scores: scala.collection.Map[Long, Long],
        scoreEndIsSrc: Boolean): scala.collection.mutable.HashMap[Long, Long] = {
      val raw = new scala.collection.mutable.HashMap[Long, Long]()
      edges.foreach { case (s, d) =>
        val (scoreEnd, gatherEnd) = if (scoreEndIsSrc) (s, d) else (d, s)
        scores.get(scoreEnd).foreach { m =>
          raw(gatherEnd) = raw.getOrElse(gatherEnd, 0L) + m
        }
      }
      val mx = if (raw.isEmpty) 1L else math.max(raw.values.max, 1L)
      val next = scala.collection.mutable.HashMap.empty[Long, Long]
      nodeSet.foreach { id =>
        next(id) = raw.getOrElse(id, 0L) * 1000000L / mx
      }
      next
    }
    var hub = scala.collection.mutable.HashMap.empty[Long, Long]
    nodeSet.foreach(id => hub(id) = 1000000L)
    var auth = hub
    for (_ <- 1 to iters) {
      auth = half(hub, scoreEndIsSrc = true)
      hub = half(auth, scoreEndIsSrc = false)
    }
    val isolated = if (iters == 0) 1000000L else 0L
    val authDf = longMapDf(spark, auth, "a_micros")
    val hubDf = longMapDf(spark, hub, "h_micros")
    nodes.join(broadcast(authDf), Seq("id"), "left")
      .join(broadcast(hubDf), Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("a_micros"), lit(isolated)).cast(DoubleType) / 1e6)
          .as("authority"),
        (coalesce(col("h_micros"), lit(isolated)).cast(DoubleType) / 1e6)
          .as("hub"))
  }
}
