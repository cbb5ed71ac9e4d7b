package graft.plans

import org.apache.spark.sql.Dataset

/** The ONE lineage-cut seam for every iterative/fixpoint operator
  * (KCore ladder, PageRank/HITS, star-contraction components, LPA/
  * Louvain, BPE merge rounds, Lloyd iterations, recursive-CTE
  * replacement, streaming two-sink materializations) — the
  * [[graft.run.WarehouseFs]] move, applied to lineage: one
  * configurable policy instead of ~40 hard-wired `localCheckpoint()`
  * call sites.
  *
  * Policy:
  *  - DEFAULT (no conf): `localCheckpoint` — eager, truncates lineage
  *    into executor block storage with no FS round-trip. The right
  *    call on local[32] and on clusters where a re-run beats paying a
  *    per-round distributed write. NOT fault-tolerant: localCheckpoint
  *    blocks lineage recompute BY DESIGN, so an executor loss mid-
  *    fixpoint (round 7 of a 13-round peel) kills the whole job.
  *    Block storage is reclaimed by Spark's ContextCleaner when the
  *    RDD is garbage-collected — local cuts need no GC here.
  *  - CLUSTER MODE: set `spark.graft.checkpoint.dir` to a reliable FS
  *    directory (HDFS/object store) and every cut becomes a RELIABLE
  *    `checkpoint` there — an executor loss recomputes the lost
  *    partitions from the checkpoint files and the fixpoint carries
  *    on. Cost: one distributed write per cut — pay it when the job
  *    is long enough that restart-from-zero is the bigger bill.
  *
  * RETENTION under the reliable policy — the part Spark does NOT do
  * for you: checkpoint files are deleted by Spark only when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default
  * FALSE), and even then only when the JVM happens to garbage-collect
  * the RDD — a 13-round peel over a 100 TB frame would otherwise park
  * rounds × frame-size in the checkpoint dir forever. Every fixpoint
  * loop in this repo therefore runs its cuts through a [[Chain]],
  * which deletes round N−2's files deterministically the moment round
  * N materializes (see the Chain scaladoc for why the window is 2,
  * not 1), so the dir holds O(1) frames at any point in the loop —
  * never O(rounds). What a chain cannot reclaim is the frames the
  * RETURNED Dataset still reads from (reliable-checkpoint Datasets
  * re-read their files on EVERY action): loops whose result is a
  * lazily-composed plan end with [[Chain.sealIfReliable]] (one final
  * materialization buys back every intermediate file), and loops
  * whose result is driver-side data end with [[Chain.reclaimAll]].
  * The bounded residue — the final frame per operator call — lives
  * until the consumer is done with it; delete the checkpoint dir at
  * job end (it is yours), or enable `cleanCheckpoints` as a belt-and-
  * braces GC for it.
  *
  * Both branches are EAGER (the Dataset default): every operator here
  * relies on the cut materializing the round before the next round's
  * plan references it, and on dropping the O(rounds)-deep lineage that
  * would otherwise make planning itself quadratic.
  *
  * The checkpoint dir is registered on the SparkContext once per
  * configured value (setCheckpointDir creates a fresh random subdir on
  * every call, so re-setting per cut would litter the store).
  */
object Checkpoints {

  /** Session conf key: reliable checkpoint directory (unset = local). */
  val DirConf = "spark.graft.checkpoint.dir"

  /** Lineage-cut stride for FIXED-iteration loops (PageRank, HITS, LPA,
    * Lloyd — loops whose round count is a compile-time contract, not a
    * convergence test): rounds reference their predecessor once, so the
    * un-cut plan grows LINEARLY and a cut per round is pure
    * materialization overhead — each one writes the full |V|-row frame
    * to block/checkpoint storage and schedules a job barrier. Cutting
    * every [[CutStride]] rounds (and always on the last round, so
    * returned frames stay zero-recompute reads) bounds plan depth AND
    * the reliable-policy recompute window after an executor loss to
    * `CutStride` rounds — the classic checkpoint-interval trade (guide
    * §5: materialize only when recomputation is the bigger bill).
    * Convergence-driven loops (KCore peel, refineLoop, components) are
    * untouched: their per-round action IS the convergence read, and the
    * round count rides it as an Observation.
    */
  val CutStride = 8

  // keyed by the CONTEXT, not just the dir string: a JVM cache keyed
  // by dir alone would skip setCheckpointDir on a NEW SparkContext
  // after a restart (same conf, same JVM) and every cut would throw
  // "Checkpoint directory has not been set"
  @volatile private var registered: Option[(org.apache.spark.SparkContext, String)] = None

  private def reliableDir(ds: Dataset[_]): Option[String] =
    ds.sparkSession.conf.getOption(DirConf).filter(_.nonEmpty)

  /** Cut the lineage of `ds` under the configured policy. */
  def cut[T](ds: Dataset[T]): Dataset[T] =
    reliableDir(ds) match {
      case Some(dir) =>
        val sc = ds.sparkSession.sparkContext
        if (!registered.exists(r => (r._1 eq sc) && r._2 == dir))
          synchronized {
            if (!registered.exists(r => (r._1 eq sc) && r._2 == dir)) {
              sc.setCheckpointDir(dir)
              registered = Some((sc, dir))
            }
          }
        ds.checkpoint()
      case None => ds.localCheckpoint()
    }

  /** The reliable-checkpoint directory (`<ckpt-dir>/<uuid>/rdd-N`) a
    * cut Dataset reads from — None under the local policy (local
    * checkpoints live in block storage, not files). The cut Dataset's
    * plan wraps the checkpointed RDD in a LogicalRDD leaf; the RDD
    * itself exposes its file location.
    */
  private[plans] def checkpointFileOf(ds: Dataset[_]): Option[String] =
    ds.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.flatMap(_.getCheckpointFile)

  /** One fixpoint loop's cut ledger — the deterministic GC for the
    * reliable policy. Under the LOCAL policy every method degrades to
    * the plain cut (nothing is file-backed, nothing is tracked).
    *
    * Window semantics: [[cut]] tracks the new frame's files and
    * deletes the oldest tracked frame once more than `keep` are live.
    * `keep` defaults to 2, NOT 1, because convergence loops read the
    * PREVIOUS round after the next one materializes (the
    * `moved`/fingerprint compare joins round N against round N−1) —
    * a window of 1 would delete files an in-flight compare still
    * reads. Frames the loop reads EVERY round (an adjacency, a spine,
    * an accumulated frontier) go through [[pin]] instead — pinned
    * files are reclaimed only by a finisher.
    *
    * Finishers (call exactly one, after the loop):
    *  - [[seal]]: cut the result under BOTH policies (for loops that
    *    already ended with a final cut — behavior-identical), then
    *    reclaim every tracked file; the result reads only its own
    *    files.
    *  - [[sealIfReliable]]: under the reliable policy, [[seal]]; under
    *    the local policy, return the result UNCHANGED — for loops
    *    whose result is a lazily-composed plan over the last window
    *    cuts, where adding a default-policy materialization would be
    *    a pure cost regression (reliable mode already pays a write
    *    per cut, so one more to reclaim O(rounds) files is the cheap
    *    side of the trade).
    *  - [[reclaimAll]]: delete every tracked file with NO final cut —
    *    only for loops whose result is DRIVER-side data (a learned
    *    merge list, a measured trace) with no returned frame reading
    *    the checkpoints.
    *
    * A loop that throws mid-flight leaves its tracked files behind —
    * the failure path favors debuggability over tidiness; job-end dir
    * deletion is the backstop.
    */
  final class Chain private[Checkpoints] (keep: Int) {
    require(keep >= 2,
      s"Chain keep window must be >= 2 (prev/cur compares read round " +
        s"N-1 after round N materializes), got $keep")
    private val window = scala.collection.mutable.Queue.empty[String]
    private val pinned = scala.collection.mutable.ArrayBuffer.empty[String]

    /** Windowed cut: round frames superseded `keep` cuts later are
      * deleted (reliable policy only — local cuts track nothing).
      */
    def cut[T](ds: Dataset[T]): Dataset[T] = {
      val out = Checkpoints.cut(ds)
      checkpointFileOf(out).foreach { f =>
        window.enqueue(f)
        while (window.size > keep) reclaimQuiet(window.dequeue())
      }
      out
    }

    // GC hygiene must never kill the COMPUTE job: the files being
    // deleted are superseded garbage whose survival affects nothing,
    // so a transient store failure here warns (job-end dir deletion is
    // the backstop) instead of escalating — unlike the maintenance
    // plane's CHECKED deletes, where a half-delete is data loss
    private def reclaimQuiet(f: String): Unit =
      scala.util.Try(graft.run.WarehouseFs.deleteRecursive(f)) match {
        case scala.util.Failure(e) => System.err.println(
          s"[checkpoints] could not reclaim superseded checkpoint $f " +
            s"(${String.valueOf(e.getMessage)}) — harmless garbage; " +
            "job-end checkpoint-dir deletion is the backstop")
        case _ => ()
      }

    /** Cut a frame the loop reads until the end (reclaimed by the
      * finisher, never by the window).
      */
    def pin[T](ds: Dataset[T]): Dataset[T] = {
      val out = Checkpoints.cut(ds)
      checkpointFileOf(out).foreach(pinned += _)
      out
    }

    /** [[pin]] under the reliable policy; the UNCHANGED lazy plan under
      * the local policy — for per-round frames that are plain
      * filters/projections over an already-cut parent. Locally the lazy
      * view is a zero-recompute read of the parent's checkpoint blocks
      * (local blocks are reclaimed by JVM reference, never by this
      * chain's window), so an eager pin was one extra action per round
      * for bytes the parent already materialized; the reliable policy
      * MUST still pin, because the window deletes the parent's files
      * two cuts later while a finisher still reads the view. The caller
      * must ensure the parent frame is itself cut — this method adds no
      * materialization of its own.
      */
    def pinIfReliable[T](ds: Dataset[T]): Dataset[T] =
      if (reliableDir(ds).isDefined) pin(ds) else ds

    private def reclaim(): Unit = {
      (window ++ pinned).foreach(reclaimQuiet)
      window.clear(); pinned.clear()
    }

    /** Final cut under BOTH policies + reclaim of every tracked file.
      * Use where the loop already ended with a cut of its result.
      */
    def seal[T](ds: Dataset[T]): Dataset[T] = {
      val out = Checkpoints.cut(ds) // out's own file is NOT tracked
      reclaim()
      out
    }

    /** [[seal]] under the reliable policy; the untouched plan under the
      * local policy (no extra materialization on the default path).
      */
    def sealIfReliable[T](ds: Dataset[T]): Dataset[T] =
      if (reliableDir(ds).isDefined) seal(ds) else ds

    /** Reclaim every tracked file with no final cut — ONLY when the
      * loop's result is driver-side data (nothing returned reads the
      * checkpoint files).
      */
    def reclaimAll(): Unit = reclaim()
  }

  /** A fresh cut ledger for one fixpoint loop. */
  def chain(keep: Int = 2): Chain = new Chain(keep)

  /** Call-site enrichment so fixpoint chains keep their shape:
    * `frame.select(...).cutLineage()`.
    */
  implicit class CutOps[T](private val ds: Dataset[T]) extends AnyVal {
    def cutLineage(): Dataset[T] = Checkpoints.cut(ds)
  }
}
