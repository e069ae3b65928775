package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Star K_{1,4} (hub 0) plus an isolated node 9, directed both ways. */
  private def starEdges = {
    val p = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("id_a", "id_b")
    p.select($"id_a".as("src"), $"id_b".as("dst"))
      .unionByName(p.select($"id_b".as("src"), $"id_a".as("dst")))
  }
  private def starNodes = Seq(0L, 1L, 2L, 3L, 4L, 9L).toDF("id")

  test("pageRank: hub outranks leaves; isolated node keeps the floor") {
    val r = Graph.pageRank(starEdges, starNodes, iters = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size === 6)
    // every leaf sends its full rank to the hub; the hub splits over 4
    assert(r(0L) > r(1L), s"hub ${r(0L)} should outrank leaf ${r(1L)}")
    // leaves are symmetric -> identical ranks
    assert(Set(r(1L), r(2L), r(3L), r(4L)).size === 1)
    // no in-edges: rank = (1-d) exactly, every iteration
    assert(r(9L) === 0.2)
  }

  test("pageRank: fixpoint of the regular ring is the initial rank") {
    // 2-regular ring: every node gives half to each neighbor and
    // receives two halves back -> rank 1.0 is stationary (0.2 + 0.8*1)
    val ring = (0 until 6).map(i => (i.toLong, ((i + 1) % 6).toLong))
      .toDF("src", "dst")
    val sym = ring.unionByName(
      ring.select($"dst".as("src"), $"src".as("dst")))
    val nodes = (0 until 6).map(_.toLong).toDF("id")
    val r = Graph.pageRank(sym, nodes, iters = 5)
      .collect().map(_.getDouble(1))
    assert(r.forall(_ === 1.0), s"ring ranks drifted: ${r.mkString(",")}")
  }

  test("pageRank: rank mass stays ~|V| on a connected graph") {
    // undirected connected graph => no dangling mass leaks; total rank
    // converges to |V| (up to the 6dp per-round rounding)
    val r = Graph.pageRank(starEdges, starNodes.filter($"id" =!= 9L), 8)
      .agg(sum("rank")).head.getDouble(0)
    assert(math.abs(r - 5.0) < 1e-3, s"total rank $r, expected ~5")
  }
}
