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
  * and chains (diameter ≤ ~3). For adversarial long-path graphs use
  * `largeSmallStar` below (Kiveris et al., SoCC 2014): O(log n)
  * rounds on any graph shape at the cost of a second grouped shuffle
  * per round. `localCheckpoint` truncates
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
    val chain = graft.plans.Checkpoints.chain() // reliable-policy file GC
    try {
    // Only nodes incident to an edge can ever change label — iterate
    // over that subgraph (candidate graphs are ≪ the corpus at scale)
    // and union the untouched singletons back at the end.
    var labels = chain.cut(e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("component")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbrMin = e.join(labels, e("dst") === labels("node"))
        .groupBy(e("src").as("n2"))
        .agg(min(col("component")).as("nbr_min"))
      // ONE action per round (the KCore Observation discipline): the
      // changed count rides the cut's materialization instead of a
      // second count() job over the checkpointed frame — halving the
      // actions (and at scale the job barriers) per propagation round.
      val obs = org.apache.spark.sql.Observation()
      val next = chain.cut(labels.join(nbrMin, col("node") === col("n2"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"),
          (col("nbr_min") < col("component")).as("chg"))
        .observe(obs, coalesce(sum(col("chg").cast("long")), lit(0L))
          .as("chg_n")))
      changed = obs.get("chg_n").asInstanceOf[Long]
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
    // reliable policy: one final materialization reclaims every round
    // file; local policy: the untouched lazy plan (no extra cut)
    chain.sealIfReliable(labels.unionAll(isolated))
    } finally e.unpersist()
  }

  /** Connected components by alternating large-star/small-star edge
    * rewriting (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014) — the adversarial-diameter path beside
    * `minLabel`: where min-label needs diameter-many rounds (a 1M-node
    * chain = 1M shuffles), the star operations contract every path
    * around its local minimum, converging in O(log n) rounds on ANY
    * graph shape, at the cost of two grouped shuffles per round instead
    * of one.
    *
    * Each round, per center node u over its neighborhood N(u) with
    * m = min(N(u) ∪ {u}):
    *  - large-star: every neighbor LARGER than u re-points to m
    *    (strictly decreases larger-neighbor potential, keeps
    *    connectivity);
    *  - small-star: on the larger→smaller directed form, every smaller
    *    neighbor plus u itself re-points to m.
    * The fixpoint is a forest of depth-1 stars whose roots are the
    * component minima — the labels fall straight out of the edge list.
    *
    * Convergence detection: the canonical edge set is compared by
    * (count, sum of xxhash64) between rounds — one tiny aggregate per
    * round, no driver-side edge materialization. Like `minLabel`, an
    * unconverged cap is a loud failure, never wrong labels.
    */
  def largeSmallStar(nodes: DataFrame, edges: DataFrame,
                     maxIters: Int = 30): DataFrame = {
    // canonical form: self-loops dropped, one row per undirected edge,
    // directed larger → smaller (u > v)
    val chain = graft.plans.Checkpoints.chain()
    // ONE action per round (the KCore Observation discipline): the
    // convergence fingerprint — (count, decimal sum of xxhash64; a
    // BIGINT sum over uniform 64-bit hashes would overflow-throw under
    // ANSI, decimal(38,0) holds ~1e19 edges — rides each cut's
    // materialization instead of a second aggregate job per round.
    def cutFingerprinted(df: DataFrame): (DataFrame, (Long, String)) = {
      val obs = org.apache.spark.sql.Observation()
      val out = chain.cut(df.observe(obs,
        count(lit(1)).as("n"),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")).as("h")))
      (out, (obs.get("n").asInstanceOf[Long], String.valueOf(obs.get("h"))))
    }

    var (e, prev) = cutFingerprinted(edges.where(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .distinct())
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // large-star over the symmetric adjacency: per center u,
      // m = min(neighbors ∪ {u}); larger neighbors re-point to m.
      // ONE u-exchange serves the min aggregate AND the re-point join
      // (r21, guide §2.4 — hash(u) satisfies both), instead of one
      // exchange per consumer.
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u"))
      val largeMin = sym.groupBy(col("u").as("c"))
        .agg(min(col("v")).as("mn"))
        .select(col("c"), least(col("mn"), col("c")).as("m"))
      // the re-pointed frame is keyed by the NEW center (the old v), so
      // it gets its own u-exchange — shared by the distinct (hash(u)
      // clusters (u, v)), the small-star min aggregate and the
      // small-star join below (was: a (u,v) distinct exchange PLUS a
      // u exchange for the aggregate/join)
      val large = sym.join(largeMin, sym("u") === largeMin("c"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .repartition(col("u")).distinct()

      // small-star on the directed form: per u, m = min of its smaller
      // neighbors; the other smaller neighbors and u itself point to m
      val smallMin = large.groupBy(col("u").as("c")).agg(min(col("v")).as("m"))
      val small = large.join(smallMin, large("u") === smallMin("c"))
        .select(col("u"), col("v"), col("m"))
      // no inner distinct on the (u, m) branch: the outer distinct
      // dedupes the union anyway (its map-side partial aggregation
      // already combines) — the inner one was one more full exchange
      // per round for intermediate multiplicity nobody reads (r21)
      val (next, cur) = cutFingerprinted(small.where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(small.select(col("u"), col("m").as("v")))
        .distinct())
      converged = cur == prev
      prev = cur
      e = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"large-star/small-star did not converge in $maxIters rounds — " +
          "O(log n) is the expected bound, so this indicates a bug or a " +
          "pathological input; raise maxIters only after inspecting the graph")

    // fixpoint = depth-1 stars: members carry (node → root); roots are
    // exactly the targets that never appear as a source. ONE endpoint
    // aggregate serves roots AND the isolated anti-join (r21 resume,
    // guide §2.4 — was two distincts + an anti-join for roots PLUS a
    // union-distinct + anti-join for isolated, i.e. ~4 exchanges over
    // the same fixpoint edge frame; exchange reuse dedupes the shared
    // aggregate's map side across the two consumers)
    val members = e.select(col("u").as("node"), col("v").as("component"))
    val ends = e.select(col("u").as("node"), lit(true).as("s"))
      .unionAll(e.select(col("v").as("node"), lit(false).as("s")))
      .groupBy(col("node")).agg(max(col("s")).as("has_out"))
    val roots = ends.where(!col("has_out"))
      .select(col("node"), col("node").as("component"))
    val isolated = nodes.join(ends.select(col("node")), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    chain.sealIfReliable(members.unionAll(roots).unionAll(isolated))
  }
}
