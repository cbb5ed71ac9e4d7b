package graft

import graft.run.Orchestrator
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Orchestrator.refreshKnnGraph — the kNN edge table as a warehouse
  * artifact: spec-equal to the query plane's memoized frame on
  * identical artifacts (one shared kernel), replay-safe on the
  * mv_refresh audit plane, and restricted to the indexed population.
  */
class KnnGraphIndexSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("table face == memoized query frame on identical artifacts") {
    val wh = java.nio.file.Files.createTempDirectory("graft_knng").toString
    val emb = Tables.t(spark, dir, "embeddings").select("vec_id", "embedding")

    // seed the warehouse with EXACTLY the query plane's artifacts: the
    // trained centroid frame as the centroid table, then index the full
    // corpus against it (indexAnnBatch persists the same min-struct
    // nearest assignment the memoized face computes on the fly)
    val r1 = new Orchestrator.Run(spark, wh, "B1")
    r1.writeBatch(emb, "bronze/embeddings")
    r1.writeBatch(graft.queries.SimQueries.trainedCentsForSpec(spark, dir)
      .select("cent_id", "cv"), "indexes/ann_centroids")
    r1.indexAnnBatch(r1.readBatch("bronze/embeddings")
      .select("vec_id", "embedding"))
    assert(r1.refreshKnnGraph(k = 5, nprobe = 3) > 0L)

    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "neighbor_id", "d2", "nn_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val table = edgeSet(spark.read.parquet(s"$wh/indexes/knn_graph"))
    val memoized = edgeSet(
      SparkEntry.queries("q_sim_knn_graph")(spark, dir))
    assert(table === memoized,
      "warehouse edge table must equal the registered row's frame")
    assert(table.nonEmpty, "vacuous equality")

    // replay-safety: a re-refresh (the heal-on-reprocess path) is a
    // stable overwrite, and the lifecycle rides the audit plane
    assert(r1.refreshKnnGraph(k = 5, nprobe = 3) === table.size.toLong)
    assert(edgeSet(spark.read.parquet(s"$wh/indexes/knn_graph")) === table)
    assert(r1.auditLog.count(l => l.step == "mv_refresh"
      && l.target == "indexes/knn_graph" && l.status == "SUCCESS") === 2)
  }

  test("unindexed bronze batches stay out; a dead refresh lands FAILED") {
    val wh = java.nio.file.Files.createTempDirectory("graft_knng2").toString
    val emb = Tables.t(spark, dir, "embeddings").select("vec_id", "embedding")

    // a refresh with no ANN index at all is a build-phase failure that
    // must reach the audit plane (the refreshGraphRanks contract)
    val r0 = new Orchestrator.Run(spark, wh, "B0")
    r0.writeBatch(emb.where(col("vec_id") % 10 =!= 0), "bronze/embeddings")
    intercept[Exception] { r0.refreshKnnGraph() }
    assert(r0.auditLog.exists(l => l.step == "mv_refresh"
      && l.target == "indexes/knn_graph" && l.status == "FAILED"))
    assert(graft.run.Orchestrator.failedTargets(spark, wh, "B0")
      .contains("indexes/knn_graph"))

    // index ONLY B0's slice; land a second bronze batch WITHOUT
    // indexing it — the graph must cover exactly the indexed population
    r0.indexAnnBatch(r0.readBatch("bronze/embeddings")
      .select("vec_id", "embedding"), nlist = 16)
    val r1 = new Orchestrator.Run(spark, wh, "B1")
    r1.writeBatch(emb.where(col("vec_id") % 10 === 0), "bronze/embeddings")
    r1.refreshKnnGraph(k = 3, nprobe = 2)
    r1.flushAudit()
    val nodes = spark.read.parquet(s"$wh/indexes/knn_graph")
      .select(col("doc_id")).unionAll(
        spark.read.parquet(s"$wh/indexes/knn_graph").select(col("neighbor_id")))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(nodes.nonEmpty)
    assert(nodes.forall(_ % 10 != 0),
      "an unindexed bronze batch leaked into the kNN graph")
    // the SUCCESS row heals B0's dead refresh for the reprocess cycle
    assert(!graft.run.Orchestrator.failedTargets(spark, wh, "B1")
      .contains("indexes/knn_graph"))
  }

  test("the kNN refresh rides the shared config-driven cadence") {
    import graft.run.ToolsConfig
    val wh = java.nio.file.Files.createTempDirectory("graft_knng3").toString
    val emb = Tables.t(spark, dir, "embeddings").select("vec_id", "embedding")
    ToolsConfig.writeConfigFile(ToolsConfig.mvConfigPath(wh), Seq(
      """{"target_table":"indexes/knn_graph","run_order":100,""" +
        """"enabled":true,"builder":"knn_graph","refresh_every":2}"""))

    def landAndIndex(bid: String, slice: org.apache.spark.sql.Column) = {
      val r = new Orchestrator.Run(spark, wh, bid)
      r.writeBatch(emb.where(slice), "bronze/embeddings")
      r.indexAnnBatch(r.readBatch("bronze/embeddings")
        .select("vec_id", "embedding"), nlist = 16)
      r
    }
    // one landed list batch < every=2: skip, no table materialized
    val r1 = landAndIndex("B1", col("vec_id") % 10 =!= 0)
    assert(r1.refreshKnnGraphIfDue(k = 3, nprobe = 2) === None)
    assert(!new java.io.File(s"$wh/indexes/knn_graph").exists())
    // the second landing crosses the cadence: one rebuild over the
    // whole indexed population
    val r2 = landAndIndex("B2", col("vec_id") % 10 === 0)
    assert(r2.refreshKnnGraphIfDue(k = 3, nprobe = 2).exists(_ > 0L))
    val edges1 = spark.read.parquet(s"$wh/indexes/knn_graph").count()
    assert(edges1 > 0L)
    // the covers= marker advanced: an immediate re-check skips
    assert(r2.refreshKnnGraphIfDue(k = 3, nprobe = 2) === None)
    assert(spark.read.parquet(s"$wh/indexes/knn_graph").count() === edges1)
  }
}
