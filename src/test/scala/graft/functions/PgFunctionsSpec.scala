package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.{PgFunctions => PG}

/** The adt.rs test matrix (reference src/utils/adt.rs:18-106): arithmetic
  * semantics incl. overflow errors, truncating division, and type I/O —
  * realized through ANSI mode + the PgFunctions wrappers. */
class PgFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("int4pl overflows with an error under ANSI (adt.rs:29-34)") {
    val e = intercept[Exception] {
      Seq(Int.MaxValue).toDF("a").select(PG.pgAdd($"a", lit(1))).collect()
    }
    assert(e.isInstanceOf[SparkException] || e.getMessage.contains("ARITHMETIC"))
  }

  test("int4div truncates toward zero (adt.rs:190-200)") {
    val r = Seq((7, 2), (-7, 2), (7, -2)).toDF("a", "b")
      .select(PG.pgDiv($"a", $"b")).collect().map(_.getLong(0))
    assert(r.toSeq == Seq(3L, -3L, -3L))
  }

  test("division by zero errors under ANSI (PG parity)") {
    intercept[Exception] {
      Seq((1, 0)).toDF("a", "b").select(PG.pgDiv($"a", $"b")).collect()
    }
    intercept[Exception] {
      Seq((1, 0)).toDF("a", "b").select(PG.pgMod($"a", $"b")).collect()
    }
  }

  test("pgMod sign follows dividend (PG semantics)") {
    val r = Seq((7, 3), (-7, 3)).toDF("a", "b")
      .select(PG.pgMod($"a", $"b")).collect().map(_.getInt(0))
    assert(r.toSeq == Seq(1, -1))
  }

  test("typinput errors on malformed text under ANSI (int4in, adt.rs:148-176)") {
    intercept[Exception] {
      Seq("not_a_number").toDF("s").select(PG.pgIn($"s", IntegerType)).collect()
    }
  }

  test("typinput/typoutput round trip (int4in/int4out)") {
    val r = Seq(42).toDF("a")
      .select(PG.pgIn(PG.pgOut($"a"), IntegerType)).head.getInt(0)
    assert(r == 42)
  }

  test("boolout renders t/f (PG wire format)") {
    val r = Seq(true, false).toDF("b").select(PG.pgBoolOut($"b"))
      .collect().map(_.getString(0))
    assert(r.toSeq == Seq("t", "f"))
  }

  test("bitwise family (initdb:619-636)") {
    val df = Seq((12, 10)).toDF("a", "b")
    val row = df.select(
      PG.pgBitAnd($"a", $"b"), PG.pgBitOr($"a", $"b"), PG.pgBitXor($"a", $"b"),
      PG.pgBitNot($"a"), PG.pgShiftLeft($"a", lit(2)), PG.pgShiftRight($"a", lit(2))).head
    assert((row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3),
      row.getInt(4), row.getInt(5)) == ((8, 14, 6, -13, 48, 3)))
  }

  test("factorial (! operator, initdb:481-482)") {
    assert(Seq(5).toDF("n").select(PG.pgFactorial($"n")).head.getLong(0) == 120L)
  }
}
