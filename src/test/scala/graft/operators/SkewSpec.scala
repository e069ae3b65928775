package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals plain join and actually scatters the hot key") {
    // hot key: 10k left rows on key=1 vs 3 right rows
    val left = (1 to 10000).map(i => (1L, i)) ++ Seq((2L, -1), (3L, -2))
    val l = left.toDF("k", "payload")
    val r = Seq((1L, "a"), (2L, "b"), (4L, "c")).toDF("k", "name")

    val plain = l.join(r, "k").select("k", "payload", "name")
    val salted = Skew.saltedJoin(l, r, "k", saltFactor = 8, leftScatter = Seq("payload"))
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)

    // the hot key's rows spread across multiple salt partitions
    val saltSpread = l.filter($"k" === 1L)
      .withColumn("__salt", pmod(hash($"payload"), lit(8)))
      .select("__salt").distinct().count()
    assert(saltSpread == 8)
  }

  test("salting is deterministic across runs (no rand())") {
    val l = (1 to 100).map(i => (1L, i)).toDF("k", "payload")
    def salts = l.withColumn("s", pmod(hash($"payload"), lit(8)))
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(salts == salts)
  }
}
