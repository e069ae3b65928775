package graft.wire

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Wire-protocol conformance against a REAL third-party client
  * (r12 verdict stretch #7): every prior wire test drives the protocol
  * through this repo's own frame encoder, which can never catch a
  * framing/tag/flow deviation both sides share. `psql` 15 (libpq) is
  * the reference implementation's reference client — if it can
  * connect, run simple + multi-statement queries, round-trip SET/SHOW,
  * bind extended-protocol parameters (\bind), stream COPY FROM STDIN,
  * and render server errors, the server speaks the dialect, not a
  * private imitation of it.
  *
  * Tests self-skip (assume) when /usr/bin/psql is absent so the suite
  * stays green in containers without the client.
  */
class PsqlConformanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val psqlBin = "/usr/bin/psql"
  private def havePsql = new java.io.File(psqlBin).canExecute

  private lazy val server = new WireServer(spark, Some(TestSpark.sf)).start()

  /** Run psql against the server: unaligned (-A), tuples-only (-t), no
    * psqlrc (-X); returns (exitCode, stdout, stderr). */
  private def psql(args: Seq[String], stdin: String = ""): (Int, String, String) = {
    val cmd = Seq(psqlBin, "-h", "127.0.0.1", "-p", server.boundPort.toString,
      "-U", "graft", "-d", "graft", "-X", "-A", "-t") ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("PGSSLMODE", "disable")
    pb.environment().put("PGGSSENCMODE", "disable")
    pb.environment().put("PGCONNECT_TIMEOUT", "10")
    val p = pb.start()
    p.getOutputStream.write(stdin.getBytes("UTF-8"))
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    val rc = p.waitFor()
    (rc, out.trim, err.trim)
  }

  test("psql connects and runs a simple query over the catalog") {
    assume(havePsql)
    val (rc, out, err) = psql(Seq("-c", "SELECT count(*) AS n FROM nation"))
    assert(rc == 0, s"psql failed: $err")
    assert(out == "25", s"got '$out'")
  }

  test("psql multi-statement simple query returns every result") {
    assume(havePsql)
    val (rc, out, _) = psql(Seq("-c",
      "SELECT 2 + 3 AS a; SELECT n_name FROM nation WHERE n_nationkey = 7"))
    assert(rc == 0)
    assert(out.linesIterator.toSeq == Seq("5", "NATION_7"), s"got '$out'")
  }

  test("psql SET / SHOW round-trips a GUC on one connection") {
    assume(havePsql)
    val (rc, out, err) = psql(Seq(
      "-c", "SET batch_size = 8192",
      "-c", "SHOW batch_size"))
    assert(rc == 0, s"psql failed: $err")
    assert(out.linesIterator.toSeq.last == "8192", s"got '$out'")
  }

  test("psql transaction block commits") {
    assume(havePsql)
    val (rc, out, _) = psql(Seq("-c",
      "BEGIN; SELECT 41 + 1 AS x; COMMIT"))
    assert(rc == 0)
    assert(out.linesIterator.contains("42"), s"got '$out'")
  }

  test("pgbench drives the extended and prepared protocols (libpq Parse/Bind/Execute)") {
    // psql 15 has no \bind (16+), so the extended-protocol client here
    // is pgbench: -M extended sends the script's :param queries via
    // PQsendQueryParams (Parse+Bind+Execute per transaction); -M
    // prepared Parses once per connection and re-Binds — both against
    // real libpq framing, multiple concurrent connections.
    val pgbench = "/usr/bin/pgbench"
    assume(new java.io.File(pgbench).canExecute)
    val script = java.nio.file.Files.createTempFile("pgb", ".sql")
    java.nio.file.Files.writeString(script,
      "\\set nk random(0, 24)\n" +
        "SELECT n_name FROM nation WHERE n_nationkey = :nk;\n")
    for (mode <- Seq("extended", "prepared")) {
      val pb = new ProcessBuilder(pgbench, "-h", "127.0.0.1",
        "-p", server.boundPort.toString, "-U", "graft", "-n",
        "-t", "3", "-c", "2", "-M", mode, "-f", script.toString, "graft")
      pb.environment().put("PGSSLMODE", "disable")
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.waitFor() == 0, s"pgbench -M $mode failed: $out")
      assert(out.contains("number of transactions actually processed: 6/6"),
        s"pgbench -M $mode: $out")
      assert(out.contains("number of failed transactions: 0"),
        s"pgbench -M $mode: $out")
    }
    java.nio.file.Files.delete(script)
  }

  test("psql streams COPY FROM STDIN and the rows land") {
    assume(havePsql)
    spark.sql("DROP TABLE IF EXISTS psql_copy_t")
    val (rc1, _, err1) = psql(Seq("-c",
      "CREATE TABLE psql_copy_t (id int, name varchar(16))"))
    assert(rc1 == 0, s"create failed: $err1")
    val (rc2, _, err2) = psql(Seq("-c", "COPY psql_copy_t FROM STDIN"),
      stdin = "1,alpha\n2,beta\n3,gamma\n")
    assert(rc2 == 0, s"copy failed: $err2")
    val (rc3, out, _) = psql(Seq("-c",
      "SELECT count(*) AS n FROM psql_copy_t"))
    assert(rc3 == 0 && out == "3", s"got '$out'")
    spark.sql("DROP TABLE IF EXISTS psql_copy_t")
  }

  test("psql renders server errors and exits nonzero") {
    assume(havePsql)
    val (rc, _, err) = psql(Seq("-c", "SELECT FROM FROM"))
    assert(rc != 0)
    assert(err.toLowerCase.contains("error"), s"stderr: '$err'")
  }
}
