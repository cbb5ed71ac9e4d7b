package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by iterative
  * min-label propagation: every node starts labeled with itself; each
  * round a node takes the minimum label among itself and its neighbors;
  * at fixpoint the label is the component's minimum node id — the
  * transitive-closure version of the greedy keep-first dedup policy
  * (keep-first under-merges chains a~b~c where a~c was never a
  * candidate pair).
  *
  * This is the relabel-to-fixpoint sibling of graft.plans.Recursion
  * .iterate (which accumulates a UNION of frontiers — the right shape
  * for reachability rows, but not for convergence on cyclic graphs,
  * where a frontier never empties without dedup-against-everything).
  *
  * Scale notes (100 TB): each round is one shuffle join (edges ⋈ labels
  * on dst) + one aggregation on src — all row data stays distributed;
  * the driver holds only the changed-row count. Rounds needed = graph
  * diameter; near-dup candidate graphs are overwhelmingly tiny cliques
  * and chains (diameter ≤ ~3). For adversarial long-path graphs the
  * classic fix is alternating large-star/small-star (Kiveris et al.,
  * "Connected Components in MapReduce", SoCC 2014) which converges in
  * O(log n) rounds at the cost of a second join per round — not needed
  * for the dedup workload this serves. `localCheckpoint` truncates
  * lineage per round (use reliable checkpoint on a cluster).
  */
object ConnectedComponents {

  /** @param nodes one column `node` — every vertex (isolated ones too)
    * @param edges columns `src`, `dst` — must already be symmetric
    *              (both directions present)
    * @param maxIters safety cap on propagation rounds
    * @return (node, component) with component = min node id reachable
    */
  def minLabel(nodes: DataFrame, edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val e = edges.persist() // reused every round; tiny vs the corpus
    try {
    // Only nodes incident to an edge can ever change label — iterate
    // over that subgraph (candidate graphs are ≪ the corpus at scale)
    // and union the untouched singletons back at the end.
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("component"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbrMin = e.join(labels, e("dst") === labels("node"))
        .groupBy(e("src").as("n2"))
        .agg(min(col("component")).as("nbr_min"))
      // One materialization per round: checkpoint the (relabel, changed?)
      // frame, then both the convergence count and the next round read it.
      val next = labels.join(nbrMin, col("node") === col("n2"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"),
          (col("nbr_min") < col("component")).as("chg"))
        .localCheckpoint()
      changed = next.where(col("chg")).count()
      labels = next.select(col("node"), col("component"))
      iter += 1
    }
    // an unconverged result is WRONG components, not slow components —
    // fail loudly instead of returning intermediate labels
    if (changed > 0)
      throw new IllegalStateException(
        s"label propagation did not converge in $maxIters rounds " +
          s"($changed labels still changing); the graph diameter exceeds " +
          "the cap — raise maxIters or switch to large-star/small-star")
    val isolated = nodes.join(labels.select(col("node")), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    labels.unionAll(isolated)
    } finally e.unpersist()
  }
}
