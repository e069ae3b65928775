package graft.tools

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A latency-injecting Hadoop FileSystem (`slowfs://`) over the local
  * disk — the measurement instrument for pricing `reliable` checkpoint
  * mode against an OBJECT STORE rather than the sandbox's NVMe (r14
  * verdict item: "the checkpoint-every-k-rounds decision was made on
  * NVMe evidence; revisit it against object-store RTT").
  *
  * Every metadata operation (create/open/rename/delete/status/list/
  * mkdirs) pays a configurable round-trip sleep, and created streams
  * cap write throughput — the two cost components that dominate a
  * cloud store: per-request latency (tens of ms) and per-stream
  * bandwidth (~100 MB/s), vs the local disk's ~0.05 ms / multi-GB/s.
  * Data still lands on local disk, so correctness paths (including the
  * chaos arms' kill/recover) are untouched; only the clock changes.
  *
  * Wire-up (PriceReliable does this when --rtt-ms is passed):
  * {{{
  *   spark.sparkContext.hadoopConfiguration.set("fs.slowfs.impl",
  *     classOf[graft.tools.SlowFs].getName)
  *   spark.sparkContext.hadoopConfiguration.setLong("fs.slowfs.rtt.ms", 40)
  *   spark.conf.set("graft.checkpoint.dir", "slowfs:/tmp/graft-ckpt-slow")
  * }}}
  *
  * Defaults model a same-region object store: 40 ms RTT, 100 MB/s per
  * stream. Extends RawLocalFileSystem (no .crc shadow files — object
  * stores have none, and the checksum layer would double the metadata
  * ops being priced).
  */
class SlowFs extends RawLocalFileSystem {

  private var rttMs: Long = 40L
  private var bytesPerSec: Long = 100L * 1024 * 1024

  private def rtt(): Unit = if (rttMs > 0) Thread.sleep(rttMs)

  override def getScheme: String = "slowfs"
  override def getUri: URI = URI.create("slowfs:///")

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    rttMs = conf.getLong("fs.slowfs.rtt.ms", 40L)
    bytesPerSec = conf.getLong("fs.slowfs.bytes.per.sec", 100L * 1024 * 1024)
  }

  /** Throttle to `bytesPerSec` with sleeps amortized over 4 MB chunks
    * (sleeping per write() call would overshoot wildly for the
    * serializer's small writes). The residual under one chunk is
    * settled at close() (r16 advice: without it, streams writing under
    * 4 MB total — typical checkpoint part-files for small fixpoint
    * frames — paid ZERO bandwidth cost, making the priced object-store
    * premium RTT-only and slightly understated). */
  private final class Throttled(out: java.io.OutputStream)
      extends java.io.FilterOutputStream(out) {
    private var owed = 0L
    private def settle(): Unit = {
      val ms = owed * 1000 / math.max(1L, bytesPerSec)
      if (ms > 0) Thread.sleep(ms)
      owed = 0
    }
    private def pay(n: Int): Unit = {
      owed += n
      if (owed >= 4L * 1024 * 1024) settle()
    }
    override def write(b: Int): Unit = { out.write(b); pay(1) }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      out.write(b, off, len); pay(len)
    }
    override def close(): Unit = { settle(); super.close() }
  }

  private def throttled(raw: FSDataOutputStream): FSDataOutputStream =
    new FSDataOutputStream(new Throttled(raw), null, raw.getPos)

  // BOTH create variants: RawLocalFileSystem overrides the
  // non-permission create(Path, boolean, int, short, long, Progressable)
  // directly (it does NOT route through the permission variant), so
  // overriding only the permission form left fs.create(path, overwrite,
  // bufferSize) callers — including Spark's checkpoint writer —
  // unthrottled AND without the create RTT (found by SlowFsSpec, r16).
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    rtt()
    throttled(super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress))
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    rtt()
    throttled(super.create(f, overwrite, bufferSize, replication,
      blockSize, progress))
  }

  override def createNonRecursive(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream = {
    rtt()
    throttled(super.createNonRecursive(f, permission, overwrite, bufferSize,
      replication, blockSize, progress))
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    rtt(); super.open(f, bufferSize)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    rtt(); super.rename(src, dst)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    rtt(); super.delete(p, recursive)
  }

  override def getFileStatus(f: Path): FileStatus = {
    rtt(); super.getFileStatus(f)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    rtt(); super.listStatus(f)
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    rtt(); super.mkdirs(f, permission)
  }
}
