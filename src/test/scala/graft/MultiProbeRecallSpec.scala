package graft

import org.scalatest.funsuite.AnyFunSuite

/** Multi-probe LSH (Lv et al. 2007) must actually buy recall: probing
  * the Hamming-distance-1 buckets of each band recovers neighbors whose
  * sketch differs by one flipped hyperplane, WITHOUT growing the index.
  * Pinned against the single-probe row on the shared exact denominator
  * (both recall rows divide by the same brute-force top-10).
  */
class MultiProbeRecallSpec extends AnyFunSuite with SparkTestBase {

  private def corpusRecall(name: String, dir: String): (Long, Long) = {
    val rows = SparkEntry.queries(name)(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    (rows.map(_._2).sum, rows.map(_._1).sum) // (found, exact)
  }

  test("multi-probe lifts recall over single-probe at two SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val (f1, e1) = corpusRecall("q_sim_ann_recall", dir)
      val (fm, em) = corpusRecall("q_sim_ann_multiprobe_recall", dir)
      assert(e1 === em, "the exact denominator must be shared")
      assert(fm >= f1, s"$dir: multi-probe found fewer (${fm} < ${f1})")
      info(f"$dir: single-probe ${f1.toDouble / e1}%.3f -> " +
        f"multi-probe ${fm.toDouble / em}%.3f")
    }
    // the lift must be REAL somewhere, or the probe expansion is dead
    // code on this fixture (measured r13: 0.03 -> 0.16 at sf0.01)
    val (f1, e1) = corpusRecall("q_sim_ann_recall", "/root/testdata/sf0.01")
    val (fm, _) = corpusRecall("q_sim_ann_multiprobe_recall",
      "/root/testdata/sf0.01")
    assert(fm > f1, s"no recall lift at sf0.01 ($fm vs $f1 of $e1)")
  }

  test("sim-pack query-side frames demote past the broadcast budget") {
    // probeScored / cosineRerank / the multiprobe key table all scale
    // with the corpus — under a tiny threshold shipAuto must drop every
    // broadcast-hash plan and the results must not change
    val dir = "/root/testdata/sf0.001"
    def run(name: String) = SparkEntry.queries(name)(spark, dir)
    def physPlan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    for (name <- Seq("q_sim_ann_multiprobe_recall", "q_sim_ann_ivf")) {
      val rows = run(name).collect().map(_.toString).sorted.toSeq
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
        val demoted = run(name)
        assert(!physPlan(demoted).contains("BroadcastHashJoin"),
          s"$name kept a broadcast-hash plan past the budget")
        assert(demoted.collect().map(_.toString).sorted.toSeq === rows,
          s"$name: fallback changed the rows")
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }
}
