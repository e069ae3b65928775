package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.SlowFs

/** The measurement instrument must measure (r16 advice, low): SlowFs
  * streams amortize bandwidth sleeps over 4 MB chunks, so a stream
  * writing UNDER 4 MB total — the typical checkpoint part-file for the
  * small fixpoint frames the pricing study runs on — used to pay zero
  * bandwidth, making the priced object-store premium RTT-only. The fix
  * settles the sub-chunk residual at close(); this pins it. */
class SlowFsSpec extends AnyFunSuite {

  private def fs(bytesPerSec: Long): FileSystem = {
    val conf = new Configuration()
    conf.set("fs.slowfs.impl", classOf[SlowFs].getName)
    conf.setLong("fs.slowfs.rtt.ms", 0L)
    conf.setLong("fs.slowfs.bytes.per.sec", bytesPerSec)
    // newInstance, not get: FileSystem.get caches per (scheme,
    // authority) and would hand back an instance initialized with a
    // DIFFERENT bytes.per.sec from an earlier test/session
    FileSystem.newInstance(URI.create("slowfs:///"), conf)
  }

  test("a sub-4MB stream pays its bandwidth cost at close") {
    val f = fs(1024L * 1024) // 1 MB/s
    try {
      val p = new Path(java.nio.file.Files
        .createTempDirectory(java.nio.file.Paths.get("target"), "slowfs-")
        .toString, "small")
      val t0 = System.nanoTime()
      val out = f.create(p, true)
      out.write(new Array[Byte](512 * 1024)) // 0.5 MB -> ~0.5 s owed
      out.close()
      val sec = (System.nanoTime() - t0) / 1e9
      assert(sec >= 0.4,
        f"512 KB at 1 MB/s must settle ~0.5 s of bandwidth at close, " +
          f"took $sec%.2f s (the --mbps knob is inert for small writes)")
      f.delete(p.getParent, true)
    } finally f.close()
  }
}
