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
  *  - CLUSTER MODE: set `spark.graft.checkpoint.dir` to a reliable FS
  *    directory (HDFS/object store) and every cut becomes a RELIABLE
  *    `checkpoint` there — an executor loss recomputes the lost
  *    partitions from the checkpoint files and the fixpoint carries
  *    on. Cost: one distributed write per cut — pay it when the job
  *    is long enough that restart-from-zero is the bigger bill.
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

  // keyed by the CONTEXT, not just the dir string: a JVM cache keyed
  // by dir alone would skip setCheckpointDir on a NEW SparkContext
  // after a restart (same conf, same JVM) and every cut would throw
  // "Checkpoint directory has not been set"
  @volatile private var registered: Option[(org.apache.spark.SparkContext, String)] = None

  /** Cut the lineage of `ds` under the configured policy. */
  def cut[T](ds: Dataset[T]): Dataset[T] =
    ds.sparkSession.conf.getOption(DirConf).filter(_.nonEmpty) match {
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

  /** Call-site enrichment so fixpoint chains keep their shape:
    * `frame.select(...).cutLineage()`.
    */
  implicit class CutOps[T](private val ds: Dataset[T]) extends AnyVal {
    def cutLineage(): Dataset[T] = Checkpoints.cut(ds)
  }
}
