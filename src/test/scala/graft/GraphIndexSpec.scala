package graft

import graft.operators.PageRank
import graft.run.Orchestrator
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The warehouse-table form of the link-graph plane
  * (Orchestrator.indexGraphBatch / refreshGraphRanks /
  * hostGateAgainstRanks): landed batches accumulate the edge table
  * S8-idempotently, the rank refresh recomputes the whole-graph
  * fixpoint over the accumulated edges (collapsing cross-batch
  * duplicates), gating reads the PERSISTED ranks through the one
  * shared gate definition, and a replayed batch changes nothing.
  */
class GraphIndexSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def ranksAt(wh: String): Map[String, Long] =
    spark.read.parquet(s"$wh/indexes/graph_host_ranks")
      .as[(String, Long)].collect().toMap

  test("land, refresh, gate; replay is a no-op; duplicates collapse") {
    val wh = java.nio.file.Files.createTempDirectory("graft_graphidx").toString
    val b1Edges = Seq(("a", "b"), ("b", "a"))
    val b1 = new Orchestrator.Run(spark, wh, "B1")

    // gating before any refresh must fail loudly with the prescription,
    // never gate every document as unknown-host off an empty join
    val e = intercept[IllegalArgumentException] {
      b1.hostGateAgainstRanks(Seq((1L, "a")).toDF("doc_id", "source"))
    }
    assert(e.getMessage.contains("refreshGraphRanks"), e.getMessage)

    assert(b1.indexGraphBatch(b1Edges.toDF("src", "dst")) === 2L)
    b1.refreshGraphRanks(iters = 3)
    // the persisted ranks ARE the operator's fixpoint on the landed graph
    val direct1 = PageRank.run(spark, b1Edges.toDF("src", "dst"), 3)
      .as[(String, Long)].collect().toMap
    assert(ranksAt(wh) === direct1)

    // B2 re-lands a->b (cross-batch duplicate) plus two new edges: the
    // duplicate must collapse at refresh (classic PageRank is over the
    // DISTINCT edge set — a re-landed edge is not extra link signal)
    val b2 = new Orchestrator.Run(spark, wh, "B2")
    b2.indexGraphBatch(Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst"))
    b2.refreshGraphRanks(iters = 3)
    val unioned = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"))
    val direct2 = PageRank.run(spark, unioned.toDF("src", "dst"), 3)
      .as[(String, Long)].collect().toMap
    assert(ranksAt(wh) === direct2)
    assert(direct2 !== direct1, "fixture too weak: B2 must shift the ranks")

    // gate against the persisted table: known hosts carry their rank,
    // an unseen host surfaces as known_host=false, never a silent drop
    val gate = b2.hostGateAgainstRanks(
        Seq((1L, "a"), (2L, "c"), (3L, "zzz")).toDF("doc_id", "source"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) -1L else r.getLong(2)), r.getBoolean(3)))
      .toMap
    assert(gate(1L) === ((direct2("a"), true)))
    assert(gate(2L) === ((direct2("c"), true)))
    assert(gate(3L) === ((-1L, false)), "unknown host must be explicit")

    // replaying B1's edge load rewrites exactly its own partition: the
    // edge table's B1 slice stays single, and a re-refresh is stable
    val b1replay = new Orchestrator.Run(spark, wh, "B1")
    b1replay.indexGraphBatch(b1Edges.toDF("src", "dst"))
    val edges = spark.read.parquet(s"$wh/indexes/graph_edges")
    assert(edges.where(col("src") === "a" && col("dst") === "b")
      .select("dwh_batch_id").distinct().count() === 2L,
      "a->b appears under exactly its two landed batch partitions")
    assert(edges.count() === 5L, "replay must not append a third copy")
    b1replay.refreshGraphRanks(iters = 3)
    assert(ranksAt(wh) === direct2, "replay + refresh must be a no-op")

    // the refresh rides the mv_refresh audit plane (healable on failure)
    assert(b1replay.auditLog.exists(l =>
      l.step == "mv_refresh" && l.target == "indexes/graph_host_ranks"
        && l.status == "SUCCESS" && l.rows == 3L))
  }

  test("a build-phase refusal reaches the audit plane as FAILED") {
    // a dangling edge batch (the normal crawl shape) makes PageRank's
    // loud guard refuse DURING THE BUILD — that refusal must land a
    // FAILED mv_refresh row exactly like a dead write, or the
    // reprocess cycle never surfaces the stale rank table
    val wh = java.nio.file.Files.createTempDirectory("graft_graphidx2").toString
    val b = new Orchestrator.Run(spark, wh, "B1")
    b.indexGraphBatch(Seq(("a", "b")).toDF("src", "dst"))
    val e = intercept[IllegalArgumentException] { b.refreshGraphRanks(3) }
    assert(e.getMessage.contains("dangling"), e.getMessage)
    assert(b.auditLog.exists(l =>
      l.step == "mv_refresh" && l.target == "indexes/graph_host_ranks"
        && l.status == "FAILED" && l.message.contains("dangling")),
      b.auditLog.mkString("; "))
    assert(graft.run.Orchestrator.failedTargets(spark, wh, "B1")
      .contains("indexes/graph_host_ranks"),
      "the reprocess cycle must see the dead refresh")

    // the crawl-shaped policy: redistribute dangling mass instead of
    // refusing — the refresh succeeds, the sink gets a rank row, and
    // the table matches the operator called directly (the heal also
    // clears the FAILED target via the SUCCESS row)
    assert(b.refreshGraphRanks(3, redistributeDangling = true) === 2L)
    val direct = PageRank.runDanglingRedistributed(
        spark, Seq(("a", "b")).toDF("src", "dst"), 3)
      .as[(String, Long)].collect().toMap
    assert(ranksAt(wh) === direct)
    assert(direct.contains("b"), "the sink must hold a rank row")
    // SUCCESS rows are buffered (only failures flush eagerly); the
    // stage loop flushes at its boundary, which the heal check needs
    b.flushAudit()
    assert(!graft.run.Orchestrator.failedTargets(spark, wh, "B1")
      .contains("indexes/graph_host_ranks"),
      "a successful redistribute refresh must heal the failed target")
  }
}
