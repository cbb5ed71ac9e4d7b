package graft.sources

import graft.run.WarehouseFs
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Pointer-committed compaction for APPEND-LOG tables — the audit
  * plane's layout. The batch-partition compaction
  * ([[CompactedLayout]]) rewrites immutable partitions; an append log
  * has no partitions and is NEVER immutable (every Run's flushAudit
  * appends one small file), so at production step cadence the log
  * itself becomes a small-files storm — thousands of KB-files whose
  * listing dominates every restart/reprocess/watermark read. This
  * layout folds the log without ever blocking (or losing) a
  * concurrent append:
  *
  *  - loose part files in the table root are the append surface —
  *    writers keep appending them, compaction never touches the
  *    writer;
  *  - compaction reads the VISIBLE set (live generation + loose files
  *    not yet folded), stages it into a hidden `.cgen/gNNNNNN/` dir,
  *    and COMMITS with one atomic publish of `_compact_gen`
  *    ([[WarehouseFs.publishAtomic]] — atomic on object stores too).
  *    The pointer carries the generation number AND the manifest of
  *    folded loose basenames, so a loose file appended DURING the
  *    staging window is simply not in the manifest and stays visible —
  *    appends race nothing;
  *  - readers resolve: no pointer → the plain directory scan;
  *    pointer → ONE parquet relation over [live generation dir +
  *    loose files not in the folded manifest]. Old or new state,
  *    never torn, never double-counted (folded files are excluded
  *    even while parked);
  *  - folded loose files and stale generations are PARKED (in-flight
  *    readers' grace window) and GC'd through [[vacuum]]; a crashed
  *    staging is invisible (pointer not advanced) and cleared by the
  *    next compaction.
  *
  * Concurrency: appends are safe by construction (above). A SECOND
  * compactor is excluded by a lock file + a pre-commit pointer
  * re-check (the rebuildAnnIndex advisory-lock discipline — the lock
  * is advisory on object stores, the re-check aborts the loser
  * loudly with the live state untouched).
  *
  * 100 TB notes: the fold is one read+write of the log (a METADATA
  * table — tiny next to any data batch), the pointer is KBs (one
  * basename per folded file, cleared at each fold), and resolution is
  * one pointer read + one listing — the same order the plain scan
  * already paid. Run it on the retention cadence.
  */
object AppendLogLayout {

  def pointerPath(root: String): String = s"$root/_compact_gen"
  def lockPath(root: String): String = s"$root/_compact_lock"

  /** Lease-aware lock acquire (the Orchestrator.acquireMaintenanceLock
    * discipline): fresh acquire is silent, a stale lock (older than
    * [[WarehouseFs.LeaseConf]]) reclaims through `onReclaim` — the
    * Run-level wrappers route that to a WARN audit row; the default
    * surfaces it on stderr for direct callers.
    */
  private def acquireLock(root: String, what: String,
                          onReclaim: String => Unit): Unit =
    WarehouseFs.acquireLease(lockPath(root)) match {
      case Right(None) => ()
      case Right(Some(stale)) => onReclaim(
        s"stale append-log lock RECLAIMED at ${lockPath(root)}: $stale")
      case Left(holder) => throw new IllegalArgumentException(
        s"another append-log compaction/GC holds ${lockPath(root)} " +
          s"($holder) — the live log is intact (the pointer only " +
          "advances at commit); if the holder crashed, delete the lock " +
          s"or set ${WarehouseFs.LeaseConf} so stale locks reclaim " +
          s"automatically, then re-run the $what")
    }

  private def defaultOnReclaim(info: String): Unit =
    System.err.println(s"[appendlog] $info")

  /** Race-injection seam for specs ONLY: runs between staging and the
    * pre-commit re-checks, where a concurrent fold/GC on an
    * advisory-lock store could interleave. Production never sets it.
    */
  private[graft] var raceBeforeCommit: () => Unit = () => ()

  /** Pointer state: (live gen dir NAME under .cgen — uniquely named,
    * the [[CompactedLayout.genDirName]] discipline, so concurrent
    * stagings can never clobber each other — and the folded loose
    * basenames). (None, empty) = plain layout.
    */
  def liveState(root: String): (Option[String], Set[String]) =
    if (!WarehouseFs.exists(pointerPath(root))) (None, Set.empty)
    else {
      val lines = WarehouseFs.readString(pointerPath(root)).split("\n")
      (Some(lines.head.trim), lines.drop(1).map(_.trim)
        .filter(_.nonEmpty).toSet)
    }

  /** (live generation NUMBER, folded basenames); (0, empty) = plain. */
  def state(root: String): (Long, Set[String]) = {
    val (name, folded) = liveState(root)
    (name.map(CompactedLayout.genNumber).getOrElse(0L), folded)
  }

  private def looseFiles(root: String) =
    WarehouseFs.list(root)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))

  /** The resolver read — THE way to read a possibly-folded append log.
    * No pointer: the identical plain scan. Pointer: live generation +
    * unfolded loose files as one relation.
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val (liveName, folded) = liveState(root)
    liveName match {
      case None => spark.read.parquet(root)
      case Some(n) =>
        val loose = looseFiles(root)
          .map(_.getPath.toString)
          .filterNot(p => folded(p.substring(p.lastIndexOf('/') + 1)))
        spark.read.parquet((s"$root/.cgen/$n" +: loose): _*)
    }
  }

  /** Fold the visible set into the next generation. No-op (None) when
    * fewer than `minLoose` unfolded loose files exist — the fold's
    * whole point is file-count reduction. Returns
    * (looseFolded, genFilesAfter).
    */
  def compact(spark: SparkSession, root: String,
              minLoose: Int = 8,
              targetBytes: Long = 128L << 20,
              onReclaim: String => Unit = defaultOnReclaim)
      : Option[(Int, Int)] = {
    acquireLock(root, "compaction", onReclaim)
    try {
      // state is read UNDER the lock: read before acquire, and a fold
      // committing in between would leave this one holding a stale
      // generation — its stale-staging sweep would then delete the
      // LIVE generation
      val (liveName, foldedOld) = liveState(root)
      val gen = liveName.map(CompactedLayout.genNumber).getOrElse(0L)
      val loose = looseFiles(root)
      val fresh = loose.filterNot(f => foldedOld(f.getPath.getName))
      if (fresh.length < minLoose) return None
      // clear crashed stagings / parked generations other than live
      // (the grace window ends when the next fold begins)
      WarehouseFs.listNames(s"$root/.cgen")
        .filter(n => !liveName.contains(n))
        .foreach(n => WarehouseFs.deleteRecursive(s"$root/.cgen/$n"))
      val liveDir = liveName.map(n => s"$root/.cgen/$n")
      val visible = liveDir.toSeq ++ fresh.map(_.getPath.toString)
      val bytes = fresh.map(_.getLen).sum +
        liveDir.map(d => WarehouseFs.list(d).map(_.getLen).sum).getOrElse(0L)
      val nTarget = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      // UNIQUELY named staging (the CompactedLayout discipline): a
      // concurrent fold on an advisory-lock store stages elsewhere and
      // can never Overwrite bytes this fold commits
      val stagingName = CompactedLayout.genDirName(gen + 1)
      val staging = s"$root/.cgen/$stagingName"
      spark.read.parquet(visible: _*)
        .coalesce(nTarget)
        .write.mode(SaveMode.Overwrite).parquet(staging)
      WarehouseFs.list(staging)
        .filterNot(_.getPath.getName.endsWith(".parquet"))
        .foreach(f => WarehouseFs.deleteFile(f.getPath.toString))
      val after = WarehouseFs.listNames(staging).count(_.endsWith(".parquet"))
      raceBeforeCommit() // spec seam: injects the concurrent-GC race
      // pre-commit re-checks (the advisory-lock backstops, mirroring
      // compactBatches): (a) a concurrent fold that won the race
      // advanced the pointer — committing over it would drop ITS fold;
      // (b) the staging must still be intact — a concurrent vacuum
      // (lock-blind on an advisory store) deletes every non-live .cgen
      // dir, INCLUDING an in-flight staging, and check (a) cannot see
      // that: publishing a pointer at a deleted/damaged staging would
      // break every audit-log read until manually healed. Both abort
      // loudly with the live state untouched.
      val (liveNow, _) = liveState(root)
      if (liveNow != liveName)
        throw new IllegalStateException(
          s"append-log compaction of $root: the pointer advanced " +
            s"($liveName -> $liveNow) during staging — a concurrent " +
            "fold won; this staging is invisible, re-run if still needed")
      if (WarehouseFs.listNames(staging).count(_.endsWith(".parquet"))
          != after)
        throw new IllegalStateException(
          s"append-log compaction of $root: the staged generation " +
            "was disturbed before commit (a concurrent GC on an " +
            "advisory-lock store?) — refusing to publish a pointer at " +
            "damaged staging; the live log is untouched, re-run the fold")
      // THE COMMIT: generation + the folded manifest in one atomic
      // publish. The manifest is exactly the loose files PRESENT at
      // T0 — fresh ones folded now, previously-folded parked ones
      // re-folded via the old generation's rows. Building it from the
      // T0 LISTING (not foldedOld ∪ fresh) self-prunes names GC
      // already deleted; carrying them forward would grow the pointer
      // without bound across fold/GC cycles. Appends after T0 are
      // absent and stay visible.
      val foldedNew = loose.map(_.getPath.getName).sorted
      WarehouseFs.publishAtomic(pointerPath(root),
        (stagingName +: foldedNew).mkString("\n"))
      Some((fresh.length, after))
    } finally {
      // non-masking release (the rebuildAnnIndex discipline)
      scala.util.Try(WarehouseFs.deleteFile(lockPath(root))) match {
        case scala.util.Failure(e) => System.err.println(
          s"[appendlog] stale compaction lock: release of " +
            s"${lockPath(root)} failed (${String.valueOf(e.getMessage)}) " +
            "— the fold outcome above stands; delete the lock manually")
        case _ => ()
      }
    }
  }

  /** GC the parked layout: folded loose files and non-live
    * generations. CHECKED deletes; idempotent. Run it once in-flight
    * readers' grace window has passed. Returns
    * (looseDropped, generationsDropped).
    */
  def vacuum(root: String,
             onReclaim: String => Unit = defaultOnReclaim): (Int, Int) = {
    // the compactor's lock: an unlocked GC could delete a STAGED
    // generation between a fold's staging and its pointer publish (on
    // advisory-lock stores the compactor's staging-intact pre-commit
    // re-check — backstop (b) in compact — catches exactly that and
    // aborts the fold instead of committing at the deleted staging)
    acquireLock(root, "GC", onReclaim)
    try {
      val (liveName, folded) = liveState(root)
      if (liveName.isEmpty) return (0, 0)
      val parked = looseFiles(root).filter(f => folded(f.getPath.getName))
      parked.foreach(f => WarehouseFs.deleteFile(f.getPath.toString))
      val stale = WarehouseFs.listNames(s"$root/.cgen")
        .filter(n => !liveName.contains(n))
      stale.foreach(n => WarehouseFs.deleteRecursive(s"$root/.cgen/$n"))
      (parked.length, stale.length)
    } finally {
      scala.util.Try(WarehouseFs.deleteFile(lockPath(root))) match {
        case scala.util.Failure(e) => System.err.println(
          s"[appendlog] stale GC lock: release of ${lockPath(root)} " +
            s"failed (${String.valueOf(e.getMessage)}) — the GC outcome " +
            "above stands; delete the lock manually")
        case _ => ()
      }
    }
  }
}
