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

  test("renameDir swaps a directory; list sees the move") {
    val d = tmp()
    WarehouseFs.publishAtomic(s"$d/src/f", "x")
    WarehouseFs.renameDir(s"$d/src", s"$d/dst")
    assert(!WarehouseFs.exists(s"$d/src"))
    assert(WarehouseFs.readString(s"$d/dst/f") === "x")
  }

  test("the rename-atomicity table classifies the contracted stores") {
    // rename-based stores (compaction's swap is legal)
    for (p <- Seq("/wh/t", "file:///wh/t", "hdfs://nn:8020/wh/t",
        "abfs://c@a.dfs.core.windows.net/wh/t")) {
      assert(WarehouseFs.hasAtomicRenames(p), p)
    }
    // object stores (compaction must refuse; the ANN plane's pointer
    // commit is the sanctioned swap there)
    for (p <- Seq("s3a://bucket/wh/t", "s3://b/t", "gs://b/t",
        "wasbs://c@a.blob.core.windows.net/t", "oss://b/t")) {
      assert(!WarehouseFs.hasAtomicRenames(p), p)
    }
  }
}
