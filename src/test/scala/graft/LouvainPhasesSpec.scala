package graft

import graft.operators.LabelPropagation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full Louvain (move + contraction phases): the dumbbell fixture's
  * move phase provably plateaus below the structural optimum; the
  * contraction phase must take the remaining climb, modularity must
  * be monotone across phases, and the trace must prove the
  * post-contraction fixpoint in-row.
  */
class LouvainPhasesSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def trace = graft.SparkEntry
    .queries("q_graph_louvain_phases")(spark, dir)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(6), r.getLong(7)))
    .sortBy(t => (t._1, t._2))
  // (phase, round, moved, communities, modularity_den -> skipped, ppm)

  test("phase 1 plateaus below optimum; phase 2 contraction climbs; phase 3 fixpoint") {
    val t = trace
    // phase 1: the clique labeling moves NOTHING at node level
    val p1 = t.filter(_._1 == 1L)
    assert(p1.map(r => (r._2, r._3)) === Seq((0L, 0L), (1L, 0L)))
    assert(p1.forall(_._4 == 16L), "16 clique communities")
    // phase 2: the contracted move merges all 8 dumbbells in ONE round
    val p2 = t.filter(_._1 == 2L)
    assert(p2.map(r => (r._2, r._3)) === Seq((0L, 0L), (1L, 8L), (2L, 0L)))
    // round 0 re-measures the incoming labeling on the ORIGINAL graph:
    // the contraction preserved Q (the Blondel invariant, in-row)
    assert(p2.head._6 === p1.last._6)
    assert(p2.head._4 === 16L && p2.last._4 === 8L)
    // phase 3: the post-contraction view is a fixpoint
    val p3 = t.filter(_._1 == 3L)
    assert(p3.map(r => (r._2, r._3)) === Seq((0L, 0L), (1L, 0L)))
    assert(t.map(_._1).max === 3L, "the ladder stops at the proven fixpoint")
    // the measured SECOND CLIMB: phase 2 strictly improves modularity
    assert(p2.last._6 > p1.last._6,
      s"contraction must climb: ${p1.last._6} -> ${p2.last._6} ppm")
    // exact lattice values (m=104, den=4m²=43264): clique labeling
    // 37232/43264 = 860576 ppm; dumbbell labeling 37856/43264 = 875000
    assert(p1.last._6 === 860576L && p2.last._6 === 875000L)
    // monotone modularity across the whole trace (no round regresses)
    val ppms = t.map(_._6)
    assert(ppms.zip(ppms.tail).forall { case (a, b) => b >= a },
      s"modularity must be monotone across phases, got ${ppms.toSeq}")
  }

  test("reliable policy: identical trace, chain reclaims every checkpoint file") {
    // the r20 review finding: the cross-phase frames (nodeLab, the
    // contracted level graphs) are read far past the keep-2 window —
    // they must be PINNED or the reliable policy deletes files still
    // referenced (FileNotFound mid-ladder); and the trace is
    // driver-side, so reclaimAll must leave the dir EMPTY
    val defaultTrace = trace
    val ckdir = java.nio.file.Files
      .createTempDirectory("graft_louv_ckpt").toString
    spark.conf.set(graft.plans.Checkpoints.DirConf, ckdir)
    try {
      assert(trace === defaultTrace,
        "the checkpoint policy must not change the trace")
      def rddDirs(f: java.io.File): Int =
        Option(f.listFiles()).getOrElse(Array.empty).map { c =>
          (if (c.isDirectory) rddDirs(c) else 0) +
            (if (c.getName.startsWith("rdd-")) 1 else 0)
        }.sum
      assert(rddDirs(new java.io.File(ckdir)) === 0,
        "driver-side result: reclaimAll must leave no checkpoint files")
    } finally {
      spark.conf.unset(graft.plans.Checkpoints.DirConf)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckdir))
    }
  }

  test("louvainPhases refuses a phase cap that cannot prove the fixpoint") {
    val e = intercept[IllegalArgumentException] {
      LabelPropagation.louvainPhases(
        Seq((1L, 1L)).toDF("node", "community"),
        Seq((1L, 2L)).toDF("src", "dst"), maxRounds = 8, maxPhases = 1)
    }
    assert(e.getMessage.contains("maxPhases"))
  }

  test("flattened final labels are the 8 dumbbell blocks") {
    // recompute the final labeling from the trace's contract: every
    // dumbbell collapses to its lower clique's label 8j
    val labels = LabelPropagation.louvainPhases(
      spark.range(64).select(col("id").as("node"),
        (expr("id div 4") * 4).as("community")),
      dumbbellEdgesLocal, maxRounds = 8, maxPhases = 5)
    // the trace's last row says 8 communities at the fixpoint
    val last = labels.orderBy(col("phase").desc, col("round").desc).head()
    assert(last.getLong(3) === 8L)
  }

  private def dumbbellEdgesLocal = {
    val res = spark.range(64).select(col("id").as("n"))
    val intra = res.select(col("n").as("src"), expr("n div 4").as("c"))
      .join(res.select(col("n").as("dst"), expr("n div 4").as("c")), "c")
      .where(col("src") < col("dst"))
      .select(col("src"), col("dst"))
    val bridge = res.where(col("n") % 8 === 3)
      .select(col("n").as("src"), (col("n") + 1).as("dst"))
    intra.unionAll(bridge)
  }
}
