package graft.tools

/** Dev harness: stand the wire server up on a fixed port and block, so
  * an interactive client (psql) can probe it. Not part of any gate. */
object WireUp {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(15432)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.Engine.session("local[4]", "graft-wireup")
    spark.sparkContext.setLogLevel("ERROR")
    val srv = new graft.wire.WireServer(spark, Some(dir), port = port).start()
    println(s"[wireup] listening on ${srv.boundPort}; ctrl-c to stop")
    Thread.sleep(Long.MaxValue)
  }
}
