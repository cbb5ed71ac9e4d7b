package graft

import graft.run.{Orchestrator, ToolsConfig}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end lifecycle of the whole graph plane — the integration
  * narrative the per-face specs pin piecewise: edge batches land
  * S8-idempotently, ONE cadence config drives all six whole-graph
  * artifacts (ranks, HITS, triangles, k-core, core numbers, LPA
  * communities), both gates read the persisted artifacts, retention
  * vacuums the consumed edge vintages, and the AS-OF guard refuses
  * snapshots the vacuum invalidated. Every step is the production
  * call sequence, nothing is reached into.
  */
class GraphPlaneLifecycleSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("land -> cadence-refresh x6 -> gate -> vacuum -> as-of refusal") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_graphlife").toString
    // cadence: one refresh per 2 landed edge batches, for all six
    // artifacts; retention: keep only the newest edge vintage (each
    // refresh covers the accumulated graph, so consumed vintages can go)
    ToolsConfig.writeConfigFile(ToolsConfig.mvConfigPath(wh), Seq(
      """{"target_table":"indexes/graph_host_ranks","refresh_every":2}""",
      """{"target_table":"indexes/graph_hits_scores","refresh_every":2}""",
      """{"target_table":"indexes/graph_triangle_counts","refresh_every":2}""",
      """{"target_table":"indexes/graph_kcore","refresh_every":2}""",
      """{"target_table":"indexes/graph_core_numbers","refresh_every":2}""",
      """{"target_table":"indexes/graph_communities","refresh_every":2}""",
      """{"target_table":"indexes/graph_edges","retention_keep_last":1}"""))

    def refreshAllDue(r: Orchestrator.Run): Seq[Boolean] = {
      // d is a discovered-but-uncrawled sink, so the rank refresh runs
      // the crawl-graph dangling policy (the classic face would refuse)
      val out = Seq(r.refreshGraphRanksIfDue(iters = 3,
          redistributeDangling = true).isDefined,
        r.refreshHitsScoresIfDue(2).isDefined,
        r.refreshTriangleCountsIfDue().isDefined,
        r.refreshKCoreIfDue(k = 2).isDefined,
        r.refreshCoreNumbersIfDue().isDefined,
        r.refreshLpaCommunitiesIfDue(rounds = 3).isDefined)
      r.flushAudit(); out
    }

    // B1: a triangle abc + pendant d — under the every=2 cadence the
    // first landing refreshes nothing
    val b1 = new Orchestrator.Run(spark, wh, "B1")
    b1.indexGraphBatch(Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
      .toDF("src", "dst"))
    b1.flushAudit()
    assert(refreshAllDue(b1) === Seq(false, false, false, false, false, false))

    // B2: close a second triangle acd — second landing is due, ONE
    // whole-graph fixpoint for each artifact covers both batches
    val b2 = new Orchestrator.Run(spark, wh, "B2")
    b2.indexGraphBatch(Seq(("a", "d")).toDF("src", "dst"))
    b2.flushAudit()
    assert(refreshAllDue(b2) === Seq(true, true, true, true, true, true))
    assert(refreshAllDue(b2) === Seq(false, false, false, false, false, false),
      "immediate re-check must skip on every artifact")

    // both gates read their persisted artifacts
    val docs = Seq((1L, "a"), (2L, "d"), (3L, "zzz"))
      .toDF("doc_id", "source")
    // the communities artifact is the operator's fixpoint on the
    // accumulated distinct edges
    val unionEdges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("a", "d"))
    import org.apache.spark.sql.functions.col
    assert(spark.read.parquet(s"$wh/indexes/graph_communities")
      .orderBy(col("node")).collect().map(r => (r.getString(0), r.getString(1))).toSeq
      === graft.operators.LabelPropagation
        .run(spark, unionEdges.toDF("src", "dst"), 3)
        .orderBy(col("node")).collect().map(r => (r.getString(0), r.getString(1))).toSeq)
    // the core-number artifact persists every node's maximal k on the
    // accumulated graph: the union abc+acd is two triangles sharing
    // edge a-c, so every node sits in the 2-core and none in a 3-core
    assert(spark.read.parquet(s"$wh/indexes/graph_core_numbers")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      === Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 2L))
    val lf = b2.linkFarmGateAgainstTriangles(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(lf === Map(1L -> true, 2L -> true, 3L -> false))
    assert(b2.hostGateAgainstRanks(docs).count() === 3L)
    // the core gate reads the SAME persisted decomposition at two
    // different thresholds — no re-peel between them
    val atK2 = b2.coreGateAgainstNumbers(docs, minCore = 2L).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(atK2 === Map(1L -> true, 2L -> true, 3L -> false))
    val atK3 = b2.coreGateAgainstNumbers(docs, minCore = 3L).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(atK3 === Map(1L -> false, 2L -> false, 3L -> false))

    // retention: the consumed B1 vintage vacuums away; live reads keep
    // working, the covered artifacts are untouched, and the B1
    // snapshot refuses instead of silently shrinking
    assert(b2.vacuumIfConfigured("indexes/graph_edges") === Seq("B1"))
    assert(b2.readTable("indexes/graph_edges").count() === 1L)
    assert(spark.read.parquet(s"$wh/indexes/graph_triangle_counts")
      .count() === 4L, "the refreshed artifact outlives its input batch")
    intercept[IllegalArgumentException] {
      b2.readTableAsOf("indexes/graph_edges", "B1")
    }

    // B3: a fresh landing after the vacuum — pending counts restart
    // from the covers= stamp, so one new batch is below the cadence
    val b3 = new Orchestrator.Run(spark, wh, "B3")
    b3.indexGraphBatch(Seq(("d", "e")).toDF("src", "dst"))
    b3.flushAudit()
    assert(refreshAllDue(b3) === Seq(false, false, false, false, false, false),
      "one post-vacuum landing stays under the every=2 cadence")
  }
}
