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
  def genDir(root: String, g: Long): String = f"$root/.cgen/g$g%06d"

  /** (live generation, folded loose basenames); (0, empty) = plain. */
  def state(root: String): (Long, Set[String]) =
    if (!WarehouseFs.exists(pointerPath(root))) (0L, Set.empty)
    else {
      val lines = WarehouseFs.readString(pointerPath(root)).split("\n")
      (lines.head.trim.toLong, lines.drop(1).map(_.trim)
        .filter(_.nonEmpty).toSet)
    }

  private def looseFiles(root: String) =
    WarehouseFs.list(root)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))

  /** The resolver read — THE way to read a possibly-folded append log.
    * No pointer: the identical plain scan. Pointer: live generation +
    * unfolded loose files as one relation.
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val (gen, folded) = state(root)
    if (gen == 0L) spark.read.parquet(root)
    else {
      val loose = looseFiles(root)
        .map(_.getPath.toString)
        .filterNot(p => folded(p.substring(p.lastIndexOf('/') + 1)))
      spark.read.parquet((genDir(root, gen) +: loose): _*)
    }
  }

  /** Fold the visible set into the next generation. No-op (None) when
    * fewer than `minLoose` unfolded loose files exist — the fold's
    * whole point is file-count reduction. Returns
    * (looseFolded, genFilesAfter).
    */
  def compact(spark: SparkSession, root: String,
              minLoose: Int = 8,
              targetBytes: Long = 128L << 20): Option[(Int, Int)] = {
    val (gen, foldedOld) = state(root)
    val loose = looseFiles(root)
    val fresh = loose.filterNot(f => foldedOld(f.getPath.getName))
    if (fresh.length < minLoose) return None
    require(WarehouseFs.createExclusive(lockPath(root)),
      s"another append-log compaction holds ${lockPath(root)} — if the " +
        "holder crashed the live log is intact (the pointer only " +
        "advances at commit); delete the lock and re-run")
    try {
      // clear crashed stagings / parked generations other than live
      // (the grace window ends when the next fold begins)
      WarehouseFs.listNames(s"$root/.cgen")
        .filter(_ != f"g$gen%06d")
        .foreach(n => WarehouseFs.deleteRecursive(s"$root/.cgen/$n"))
      val visible =
        (if (gen == 0L) Seq.empty else Seq(genDir(root, gen))) ++
          fresh.map(_.getPath.toString)
      val bytes = fresh.map(_.getLen).sum +
        (if (gen == 0L) 0L
         else WarehouseFs.list(genDir(root, gen)).map(_.getLen).sum)
      val nTarget = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      val staging = genDir(root, gen + 1)
      spark.read.parquet(visible: _*)
        .coalesce(nTarget)
        .write.mode(SaveMode.Overwrite).parquet(staging)
      WarehouseFs.list(staging)
        .filterNot(_.getPath.getName.endsWith(".parquet"))
        .foreach(f => WarehouseFs.deleteFile(f.getPath.toString))
      val after = WarehouseFs.listNames(staging).count(_.endsWith(".parquet"))
      // pre-commit re-check (the advisory-lock backstop): a concurrent
      // fold that won the race advanced the pointer — committing over
      // it would drop ITS fold; abort with the live state untouched
      val (genNow, _) = state(root)
      if (genNow != gen)
        throw new IllegalStateException(
          s"append-log compaction of $root: the pointer advanced " +
            s"($gen -> $genNow) during staging — a concurrent fold won; " +
            "this staging is invisible, re-run if still needed")
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
        ((gen + 1).toString +: foldedNew).mkString("\n"))
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
  def vacuum(root: String): (Int, Int) = {
    val (gen, folded) = state(root)
    if (gen == 0L) return (0, 0)
    val parked = looseFiles(root).filter(f => folded(f.getPath.getName))
    parked.foreach(f => WarehouseFs.deleteFile(f.getPath.toString))
    val stale = WarehouseFs.listNames(s"$root/.cgen")
      .filter(_ != f"g$gen%06d")
    stale.foreach(n => WarehouseFs.deleteRecursive(s"$root/.cgen/$n"))
    (parked.length, stale.length)
  }
}
