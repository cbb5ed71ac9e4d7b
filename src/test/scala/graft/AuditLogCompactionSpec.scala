package graft

import graft.run.{Orchestrator, WarehouseFs}
import graft.sources.AppendLogLayout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Append-log compaction for the audit plane: fold per-flush small
  * files into pointer-committed generations without ever blocking or
  * losing a concurrent append; every audit consumer (restart mode,
  * reprocess, watermark, cadence) reads through the resolver and must
  * see identical state before, during (parked) and after (GC'd) the
  * fold.
  */
class AuditLogCompactionSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def looseFiles(root: String): Array[java.io.File] = {
    val d = new java.io.File(root)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
  }

  private def land(wh: String, id: String): Unit = {
    val r = new Orchestrator.Run(spark, wh, id)
    r.writeBatch(Seq((id, 1L)).toDF("k", "v"), "bronze/t")
    r.flushAudit()
  }

  test("fold preserves every audit consumer; appends stay visible; GC is safe") {
    val wh = java.nio.file.Files.createTempDirectory("graft_auditc").toString
    val root = s"$wh/tools/audit_log"
    (1 to 9).foreach(i => land(wh, f"B$i%04d"))
    // a FAILED row too, so failedTargets exercises the resolver
    // (transform logs FAILED and returns 0 — it never rethrows)
    val rf = new Orchestrator.Run(spark, wh, "B0010")
    rf.writeBatch(Seq(("B0010", 1L)).toDF("k", "v"), "bronze/t")
    assert(rf.transform("bronze/t", "silver/t")(_ => sys.error("boom")) === 0L)
    rf.flushAudit()
    val before = looseFiles(root).length
    assert(before >= 10)

    def snapshot() = (
      Orchestrator.completedTargets(spark, wh, "B0003"),
      Orchestrator.failedTargets(spark, wh, "B0010"),
      AppendLogLayout.read(spark, root).count())
    val pre = snapshot()
    assert(pre._1 === Set("bronze/t"))
    assert(pre._2 === Set("silver/t"))

    val run = new Orchestrator.Run(spark, wh, "MAINT01")
    val Some((folded, after)) = run.compactAuditLog(minLoose = 8)
    assert(folded === before)
    assert(after >= 1 && after < before)
    // parked loose files still on disk (grace window), yet reads are
    // NOT double-counted: the folded manifest excludes them
    assert(looseFiles(root).length >= before,
      "folded files must be parked, not deleted (+ the fold's own row)")
    val mid = snapshot()
    assert(mid._1 === pre._1 && mid._2 === pre._2)
    // the fold appended its own audit row AFTER the commit — visible
    assert(mid._3 === pre._3 + 1)

    // appends after the fold stay visible without any refold
    land(wh, "B0011")
    assert(Orchestrator.completedTargets(spark, wh, "B0011")
      === Set("bronze/t"))

    // GC drops exactly the parked files; consumers unchanged
    val (dropped, gens) = run.vacuumAuditLog()
    assert(dropped === folded && gens === 0)
    val post = snapshot()
    assert(post._1 === pre._1 && post._2 === pre._2)
    assert(run.vacuumAuditLog() === ((0, 0)), "GC idempotent")

    // second fold rolls the generation and re-folds the stragglers
    (12 to 19).foreach(i => land(wh, f"B$i%04d"))
    val Some((folded2, _)) = run.compactAuditLog(minLoose = 8)
    assert(folded2 >= 8)
    assert(AppendLogLayout.state(root)._1 === 2L)
    // the manifest is the T0 LISTING, so names GC'd after the first
    // fold self-prune — the pointer must not grow without bound
    // across fold/GC cycles
    assert(AppendLogLayout.state(root)._2.size === folded2,
      "manifest must self-prune GC'd names")
    assert(Orchestrator.completedTargets(spark, wh, "B0015")
      === Set("bronze/t"))
  }

  test("a crashed staging is invisible and healed; too few files no-op") {
    val wh = java.nio.file.Files.createTempDirectory("graft_auditc2").toString
    val root = s"$wh/tools/audit_log"
    (1 to 8).foreach(i => land(wh, f"B$i%04d"))
    // crashed staging: partial generation dir, pointer never advanced
    Seq(("junk", 0L)).toDF("k", "v").write.parquet(s"$root/.cgen/g000001")
    assert(AppendLogLayout.state(root)._1 === 0L)
    val n = AppendLogLayout.read(spark, root).count()
    val run = new Orchestrator.Run(spark, wh, "MAINT01")
    val Some((folded, _)) = run.compactAuditLog(minLoose = 8)
    assert(folded === 8)
    // the crashed staging was replaced, and no junk rows leaked in
    assert(AppendLogLayout.read(spark, root)
      .where(col("target") === "junk").count() === 0L)
    assert(AppendLogLayout.read(spark, root).count() === n + 1) // + fold row
    // below the floor: no-op, pointer untouched
    assert(run.compactAuditLog(minLoose = 8) === None)
    assert(AppendLogLayout.state(root)._1 === 1L)
  }

  test("staging deleted mid-fold (lock-blind GC) aborts the commit, log intact") {
    // the r19 advisory hole: on advisory-lock stores a concurrent
    // vacuum can delete the in-flight staging between staging and
    // publish — the pointer-advancement re-check cannot see that, so a
    // dedicated staging-intact re-check must abort BEFORE publishing a
    // pointer at the deleted generation (which would break every read)
    val wh = java.nio.file.Files.createTempDirectory("graft_auditc4").toString
    val root = s"$wh/tools/audit_log"
    (1 to 8).foreach(i => land(wh, f"B$i%04d"))
    val n = AppendLogLayout.read(spark, root).count()
    AppendLogLayout.raceBeforeCommit = () =>
      WarehouseFs.listNames(s"$root/.cgen")
        .foreach(g => WarehouseFs.deleteRecursive(s"$root/.cgen/$g"))
    try {
      val e = intercept[IllegalStateException] {
        AppendLogLayout.compact(spark, root, minLoose = 8)
      }
      assert(e.getMessage.contains("disturbed"))
    } finally AppendLogLayout.raceBeforeCommit = () => ()
    // the pointer never advanced and every read still serves the log
    assert(AppendLogLayout.state(root)._1 === 0L)
    assert(AppendLogLayout.read(spark, root).count() === n)
    assert(Orchestrator.completedTargets(spark, wh, "B0003")
      === Set("bronze/t"))
    // the lock was released on the abort path; a re-run heals
    assert(AppendLogLayout.compact(spark, root, minLoose = 8).nonEmpty)
    assert(AppendLogLayout.read(spark, root).count() === n)
  }

  test("a concurrent fold's lock excludes the second compactor") {
    val wh = java.nio.file.Files.createTempDirectory("graft_auditc3").toString
    (1 to 8).foreach(i => land(wh, f"B$i%04d"))
    val root = s"$wh/tools/audit_log"
    WarehouseFs.publishAtomic(AppendLogLayout.lockPath(root), "")
    val e = intercept[IllegalArgumentException] {
      new Orchestrator.Run(spark, wh, "MAINT01").compactAuditLog()
    }
    assert(e.getMessage.contains("lock"))
    WarehouseFs.deleteFile(AppendLogLayout.lockPath(root))
    assert(new Orchestrator.Run(spark, wh, "MAINT01")
      .compactAuditLog().nonEmpty)
  }
}
