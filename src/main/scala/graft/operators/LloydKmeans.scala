package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Lloyd's k-means on the quantized integer lattice — THE one trainer
  * body behind every trained quantizer in the library: the registered
  * IVF/SemDeDup rows (SimQueries.lloydCentsFrom delegates here, with
  * its modulo-sampled seed) and the warehouse ANN rebuild
  * (Orchestrator.rebuildAnnIndex, with its deterministic capped seed).
  * One body means the query-plane trainings and the index lifecycle
  * cannot drift.
  *
  * Determinism contract (the cross-engine exactness discipline): fixed
  * iteration count (no convergence race), nearest-centroid assignment
  * on integer squared L2 with ties to the smallest cent_id via
  * min-struct, and component-mean updates floored back onto the
  * lattice (integer sums are order-free; one IEEE double division +
  * floor is bit-identical on any engine). Empty clusters drop.
  *
  * Scale notes (100 TB): the centroid frame is broadcast (nlist ≪
  * memory — callers cap it); each round is one corpus scan
  * (crossJoin + map-side-combinable min-struct aggregate) and one
  * (cent, dim) partial-sum shuffle. Each round's centroids are
  * localCheckpointed (tiny: nlist x dim longs) so downstream consumers
  * never lazily replay the whole training lineage — use a reliable
  * checkpoint dir on a real cluster. Production trains on a sample;
  * full-corpus passes are the small-scale oracle contract.
  */
object LloydKmeans {

  /** Nearest-centroid assignment: (vec_id, cent_id), one row per
    * distinct vec_id (duplicate input rows collapse through the
    * groupBy). Broadcast crossJoin + min-struct — no window, one
    * map-side-combinable aggregate.
    *
    * @param vs    (vec_id, qv array<long>) on the quantized lattice
    * @param cents (cent_id, cv array<long>)
    */
  def assignNearest(vs: DataFrame, cents: DataFrame): DataFrame =
    vs.crossJoin(broadcast(cents))
      .groupBy(col("vec_id"))
      .agg(min(struct(
        VectorFunctions.quantizedL2(col("qv"), col("cv")).as("d2"),
        col("cent_id").as("cent_id"))).as("best"))
      .select(col("vec_id"), col("best.cent_id").as("cent_id"))

  /** The training loop: `iters` rounds of assignment + floored-mean
    * update from the given seed. Returns (cent_id, cv); cent_ids are
    * the surviving seed ids. A seed with duplicate cent_id rows is
    * tolerated (duplicates collapse at the first update's groupBy).
    */
  def train(vs: DataFrame, seed: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val chain = graft.plans.Checkpoints.chain() // reliable-policy file GC
    var cents = seed
    for (_ <- 1 to iters) {
      cents = assignNearest(vs, cents).join(vs, "vec_id")
        .select(col("cent_id"), posexplode(col("qv")).as(Seq("d", "x")))
        .groupBy(col("cent_id"), col("d"))
        .agg(floor(sum(col("x")).cast(DoubleType) / count(lit(1)))
          .cast(LongType).as("m"))
        .groupBy(col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
          e => e.getField("m")).as("cv"))
      // Deliberately cut EVERY round (not the fixed-iteration
      // CutStride): the next round BROADCASTS this frame, and an un-cut
      // centroid plan would put the whole previous training pass inside
      // a broadcast build — the guide §3 broadcast-timeout hazard. The
      // frame is nlist x dim longs, so the materialization is ~free and
      // buys a leaf-sized broadcast.
      cents = chain.cut(cents)
    }
    // finisher: under the reliable policy one cheap re-cut of the
    // <=1024-row codebook reclaims BOTH window files (round N-1's is
    // read by nothing); under the local policy the plan is unchanged
    chain.sealIfReliable(cents)
  }
}
