package graft

import java.net.URI
import org.apache.hadoop.fs.{FSDataOutputStreamBuilder, Path, RawLocalFileSystem}

/** Local-disk-backed stand-ins for object stores, keyed by SCHEME —
  * the WarehouseFs contracts branch on the scheme table
  * (hasAtomicRenames) and on path capabilities, never on the concrete
  * class, so registering these under object-store schemes exercises
  * the object-store branches (publishAtomic's direct-PUT commit,
  * compaction's pointer commit, the lock's conditional-create probe)
  * end-to-end against real bytes without a bucket.
  *
  * Registration (per suite):
  *   spark.sparkContext.hadoopConfiguration
  *     .set("fs.s3a.impl", classOf[MockS3aFileSystem].getName)
  * then use `s3a:///tmp/...` paths.
  */
class MockS3aFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3a"
  override def getUri: URI = URI.create("s3a:///")
}

object MockCondCreateFileSystem {
  /** Counts FileSystem.createFile() builder acquisitions — the
    * conditional-create branch is the only caller in WarehouseFs, so
    * the spec can assert WHICH branch the lock took.
    */
  @volatile var builderCreates: Int = 0
  def reset(): Unit = builderCreates = 0
}

/** An object store that ADVERTISES conditional-create support (the
  * HADOOP-19256 If-None-Match PUT capability): hasPathCapability
  * answers true, so WarehouseFs.createExclusive must take the
  * builder-create branch and may treat the lock as real, not advisory.
  */
class MockCondCreateFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3c"
  override def getUri: URI = URI.create("s3c:///")
  override def hasPathCapability(path: Path, capability: String): Boolean =
    capability == "fs.capability.conditional.create" ||
      super.hasPathCapability(path, capability)
  override def createFile(path: Path):
      FSDataOutputStreamBuilder[_, _] = {
    MockCondCreateFileSystem.builderCreates += 1
    super.createFile(path)
  }
}
