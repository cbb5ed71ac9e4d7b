package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** All-vector kNN graph over IVF lists — the curation primitive between
  * ANN search and SemDeDup, as ONE kernel shared by the query plane
  * (SimQueries.knnGraphFrame, memoized because the driver contract
  * gives rows no warehouse) and the warehouse plane
  * (Orchestrator.refreshKnnGraph, which materializes the edges as the
  * table a curation pipeline builds once per corpus snapshot). One body
  * means the registered rows and the persisted table cannot drift.
  *
  * Every vector probes its `nprobe` nearest centroids (broadcast —
  * nlist-bounded), candidates come only from those lists (never
  * all-pairs), and an exact quantized-L2 rerank keeps the top `k` per
  * vector. Scale: candidates stay ~nprobe·n/nlist per vector, so the
  * rerank is output-proportional; both rank windows partition by
  * vector id (n partitions, each O(nprobe·n/nlist) rows — bounded,
  * never a single-partition window).
  */
object KnnGraph {

  /** @param vs     (vec_id, qv array<long>) — the vectors to graph;
    *               drives both the probe side and the neighbor rerank
    * @param cents  (cent_id, cv array<long>) — broadcast-sized
    * @param assign (vec_id, cent_id) — list membership (computed or
    *               read from the warehouse list table)
    * @param qaShip (q_id, qa array<long>) — the probe vectors wrapped
    *               by the caller's ship policy (broadcast at test SFs,
    *               shuffle join at scale — TextQueries.shipAuto)
    * @return (doc_id, neighbor_id, d2, nn_rank), nn_rank 1..k
    */
  def edges(vs: DataFrame, cents: DataFrame, assign: DataFrame,
            qaShip: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val byD2 = Window.partitionBy(col("q_id"))
      .orderBy(col("d2"), col("cent_id"))
    // rank lists on (q_id, cent_id, d2) ONLY — carrying the probe
    // vector through the probes x nlist window exchange would multiply
    // the shuffled bytes ~20x; the probe vectors join back on the
    // nprobe survivors through qaShip
    val probes = vs.crossJoin(broadcast(cents))
      .select(col("vec_id").as("q_id"), col("cent_id"),
        VectorFunctions.quantizedL2(col("qv"), col("cv")).as("d2"))
      .withColumn("rk", row_number().over(byD2)).where(col("rk") <= nprobe)
      .select(col("q_id"), col("cent_id"))
    val cands = probes.join(assign, "cent_id")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
    // exact rerank: candidate-proportional joins back to the quantized
    // vectors by id
    val byQ = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    cands
      .join(vs.select(col("vec_id"), col("qv").as("qb")), "vec_id")
      .join(qaShip, "q_id")
      .select(col("q_id"), col("vec_id"),
        VectorFunctions.quantizedL2(col("qa"), col("qb"))
          .cast(LongType).as("d2"))
      .withColumn("nn_rank", row_number().over(byQ).cast(LongType))
      .where(col("nn_rank") <= k)
      .select(col("q_id").as("doc_id"), col("vec_id").as("neighbor_id"),
        col("d2"), col("nn_rank"))
  }
}
