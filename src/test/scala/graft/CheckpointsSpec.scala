package graft

import graft.plans.Checkpoints
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The lineage-cut seam: default policy is localCheckpoint (the
  * local[32] right answer); with spark.graft.checkpoint.dir set, every
  * cut is a RELIABLE checkpoint into that directory — the cluster
  * fault-tolerance mode (an executor loss recomputes from checkpoint
  * files instead of killing a 13-round fixpoint). The policy must not
  * change any operator's answer.
  */
class CheckpointsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // symmetric (both directions) for ConnectedComponents.minLabel
  private def edges = {
    val e = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("d", "e"), ("e", "f"), ("x", "y")).toDF("src", "dst")
    e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
  }
  private def nodes = edges.select(col("src").as("node")).distinct()

  test("reliable policy: same fixpoint answers, checkpoint files on disk") {
    val defaultAnswer = graft.operators.ConnectedComponents
      .minLabel(nodes, edges).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val coreDefault = graft.operators.KCore
      .coreNumbers(spark, edges, maxRounds = 50).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try {
      val reliable = graft.operators.ConnectedComponents
        .minLabel(nodes, edges).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(reliable === defaultAnswer)
      val coreReliable = graft.operators.KCore
        .coreNumbers(spark, edges, maxRounds = 50).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(coreReliable === coreDefault)
      // the cuts really went to the reliable dir (rdd-* checkpoint
      // subdirs with part files — what an executor loss recovers from)
      def rddDirs(f: java.io.File): Int =
        Option(f.listFiles()).getOrElse(Array.empty).map { c =>
          (if (c.isDirectory) rddDirs(c) else 0) +
            (if (c.getName.startsWith("rdd-")) 1 else 0)
        }.sum
      assert(rddDirs(new java.io.File(dir)) > 0,
        s"no reliable checkpoint data under $dir")
    } finally spark.conf.unset(Checkpoints.DirConf)
  }

  test("default policy stays local: nothing written to a stale dir conf") {
    // after the unset above, cuts must be local again — a fresh dir
    // configured then unset must stay empty across an operator run
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt2").toString
    graft.operators.ConnectedComponents.minLabel(nodes, edges).collect()
    assert(Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .isEmpty)
  }
}
