package graft

import graft.run.WarehouseFs
import org.scalatest.funsuite.AnyFunSuite

/** The maintenance plane's filesystem seam: the commit primitive
  * (publishAtomic) must replace content in one step, the lock
  * primitive (createExclusive) must admit exactly one creator, the
  * checked deletes must verify, and the rename-atomicity scheme table
  * must classify the stores the repo's contracts reason about.
  */
class WarehouseFsSpec extends AnyFunSuite with SparkTestBase {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_whfs").toString

  test("lease reclaim: read-back detects the interleaved racer; winner keeps the lock") {
    import graft.run.WarehouseFs
    val d = tmp()
    val lock = s"$d/_compact_lock"
    spark.conf.set(WarehouseFs.LeaseConf, "60000")
    try {
      // a stale lock both reclaimers observe
      WarehouseFs.publishAtomic(lock, "owner=crashed token=dead acquired_ms=0")
      assert(new java.io.File(lock)
        .setLastModified(System.currentTimeMillis() - 120000))
      // racer B interleaves between OUR stamp and the read-back:
      // deletes our lock, creates its own, stamps a foreign token
      WarehouseFs.raceBeforeReadback = () =>
        WarehouseFs.publishAtomic(lock,
          "owner=racer-b token=bbbb acquired_ms=1")
      try {
        val r = WarehouseFs.acquireLease(lock)
        assert(r.isLeft, "the read-back must detect the foreign token")
        assert(r.left.toOption.get.contains("lost the reclaim race"))
        // the racer's lock is untouched (it is theirs now)
        assert(WarehouseFs.readString(lock).contains("token=bbbb"))
      } finally WarehouseFs.raceBeforeReadback = () => ()

      // without the racer: the reclaim wins, stamps, and reports stale
      assert(new java.io.File(lock)
        .setLastModified(System.currentTimeMillis() - 120000))
      val r2 = WarehouseFs.acquireLease(lock)
      assert(r2.isRight && r2.toOption.get.nonEmpty,
        "a stale lock must reclaim with the stale info surfaced")
      assert(WarehouseFs.readString(lock).contains("owner="))
      WarehouseFs.deleteFile(lock)

      // a FRESH lock re-checked at the last instant never deletes: the
      // pre-delete staleness re-check reads age ~0 after a competitor
      // re-created it (simulated by refreshing mtime via the stamp)
      WarehouseFs.publishAtomic(lock, "owner=live token=live acquired_ms=2")
      val r3 = WarehouseFs.acquireLease(lock)
      assert(r3.isLeft, "a live lock blocks")
    } finally {
      spark.conf.unset(WarehouseFs.LeaseConf)
      scala.util.Try(WarehouseFs.deleteFile(lock))
    }
  }

  test("publishAtomic replaces content and leaves no temp siblings") {
    val d = tmp()
    val p = s"$d/sub/pointer"
    WarehouseFs.publishAtomic(p, "000001")
    assert(WarehouseFs.readString(p) === "000001")
    WarehouseFs.publishAtomic(p, "000002")
    assert(WarehouseFs.readString(p) === "000002")
    // no .tmp sibling may outlive a publish — a leaked temp would
    // accumulate forever on the metadata plane
    assert(WarehouseFs.listNames(s"$d/sub") === Seq("pointer"))
  }

  test("createExclusive admits exactly one creator; deleteFile releases") {
    val p = s"${tmp()}/locks/_lock"
    assert(WarehouseFs.createExclusive(p))
    assert(!WarehouseFs.createExclusive(p),
      "a second create must lose while the lock exists")
    WarehouseFs.deleteFile(p)
    assert(!WarehouseFs.exists(p))
    assert(WarehouseFs.createExclusive(p),
      "the lock must be re-creatable after release")
  }

  test("deleteRecursive removes nested trees and is idempotent") {
    val d = tmp()
    WarehouseFs.publishAtomic(s"$d/t/a/deep/file", "x")
    WarehouseFs.publishAtomic(s"$d/t/b", "y")
    WarehouseFs.deleteRecursive(s"$d/t")
    assert(!WarehouseFs.exists(s"$d/t"))
    WarehouseFs.deleteRecursive(s"$d/t") // missing path: no-op
  }

  test("the rename-atomicity table classifies the contracted stores") {
    // rename-based stores (publishAtomic commits via rename-OVERWRITE)
    for (p <- Seq("/wh/t", "file:///wh/t", "hdfs://nn:8020/wh/t",
        "abfs://c@a.dfs.core.windows.net/wh/t")) {
      assert(WarehouseFs.hasAtomicRenames(p), p)
    }
    // object stores (publishAtomic commits via a direct single-object
    // PUT; every layout swap — ANN generations, compaction — is a
    // pointer publish, so nothing here ever renames a directory)
    for (p <- Seq("s3a://bucket/wh/t", "s3://b/t", "gs://b/t",
        "wasbs://c@a.blob.core.windows.net/t", "oss://b/t")) {
      assert(!WarehouseFs.hasAtomicRenames(p), p)
    }
  }

  test("createExclusive takes the conditional-create branch when the store advertises it") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3c.impl", classOf[MockCondCreateFileSystem].getName)
    conf.set("fs.s3a.impl", classOf[MockS3aFileSystem].getName)
    val d = tmp()

    // capability advertised: the If-None-Match PUT branch (builder
    // create) — the lock is real, and exclusivity still holds
    MockCondCreateFileSystem.reset()
    val p1 = s"s3c://$d/locks/_cond_lock"
    assert(WarehouseFs.createExclusive(p1))
    assert(!WarehouseFs.createExclusive(p1))
    assert(MockCondCreateFileSystem.builderCreates === 2,
      "both attempts must route through the conditional builder create")
    WarehouseFs.deleteFile(p1)
    assert(WarehouseFs.createExclusive(p1))

    // no capability: the advisory check-then-put branch — exclusivity
    // semantics still hold on the (local-backed) stub
    MockCondCreateFileSystem.reset()
    val p2 = s"s3a://$d/locks/_adv_lock"
    assert(WarehouseFs.createExclusive(p2))
    assert(!WarehouseFs.createExclusive(p2))
    assert(MockCondCreateFileSystem.builderCreates === 0,
      "the advisory branch must not touch the builder create")
  }
}
