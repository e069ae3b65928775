package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Engine, TestSpark}

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def packed(budget: Long) =
    Packing.packSequences(
      Engine.table(spark, TestSpark.sf, "documents"), budget)

  test("no bin exceeds the budget unless it holds a single oversized doc") {
    val rows = packed(256L)
      .groupBy("source", "bin")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n_docs"),
        max("n_tokens").as("max_doc"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val fill = r.getLong(2); val nDocs = r.getLong(3)
      assert(fill <= 256L || nDocs == 1L,
        s"source=${r.getString(0)} bin=${r.getInt(1)} fill=$fill docs=$nDocs")
    }
  }

  test("greedy invariant: a doc opens a new bin only because it would overflow") {
    // replay the recurrence per source in doc_id order and compare bins
    val rows = packed(256L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong, r.getInt(3)))
      .sortBy(t => (t._1, t._2))
    var cur: String = null
    var bin = 0; var fill = 0L
    rows.foreach { case (src, id, n, gotBin) =>
      if (src != cur) { cur = src; bin = 0; fill = n }
      else if (fill + n <= 256L) { fill += n }
      else { bin += 1; fill = n }
      assert(gotBin == bin, s"doc $id of $src: got bin $gotBin, expected $bin")
    }
  }

  test("every document is packed exactly once and bins are contiguous from 0") {
    val df = packed(256L)
    val total = Engine.table(spark, TestSpark.sf, "documents").count()
    assert(df.count() == total)
    assert(df.select("doc_id").distinct().count() == total)
    df.groupBy("source").agg(max("bin").as("mx"), count_distinct(col("bin")).as("nb"))
      .collect().foreach { r =>
        assert(r.getLong(2) == r.getInt(1) + 1L,
          s"${r.getString(0)}: bins not contiguous")
      }
  }

  test("packing is deterministic under repartitioning") {
    val base = Engine.table(spark, TestSpark.sf, "documents")
    val a = Packing.packSequences(base, 256L).collect().toSet
    val b = Packing.packSequences(base.repartition(13), 256L).collect().toSet
    assert(a == b)
  }
}
