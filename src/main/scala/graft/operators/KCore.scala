package graft.operators


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-k core decomposition (Seidman 1983 "Network structure and
  * minimum degree") by synchronous peeling: repeatedly delete every
  * node whose degree among SURVIVING nodes is < k until a fixpoint;
  * what remains is the k-core — the maximal subgraph of minimum
  * degree k. Crawl curation uses it as the robust "densely embedded"
  * cut that single-shot degree thresholds miss: a page kept by
  * `deg >= k` on the full graph can owe all its links to peeled spam
  * leaves, while k-core membership certifies k links into the
  * surviving subgraph itself (pendant chains unravel one node per
  * round — exactly the cascade a one-pass filter cannot see).
  *
  * Scale notes (100 TB): each round is two left-semi joins of the edge
  * list against the surviving node set plus one keyed count — all
  * equi-shuffles on node ids, nothing driver-side except the 1-row
  * convergence count. Round count is the longest peel cascade (the
  * graph's degeneracy ordering depth), not |V|; production graphs
  * converge in tens of rounds. The survivor frame is localCheckpointed
  * per round to keep the loop's lineage flat (reliable checkpoint on a
  * real cluster). For the FULL core-number decomposition (every node's
  * maximal k), production runs this peel per k on a logarithmic ladder
  * or switches to distributed Montresor et al. 2011 message passing;
  * the fixed-k membership cut here is the gate form a pipeline
  * actually applies.
  *
  * Determinism: the peel is a monotone set fixpoint — no ordering, no
  * floats — so any engine running the same rounds produces the same
  * rows bit-for-bit; degrees are exact BIGINTs.
  */
object KCore {

  /** Nodes of the k-core of the simple graph induced by `edges`, with
    * their full-graph and in-core degrees.
    *
    * Input tolerance matches [[Triangles.localCounts]]: direction,
    * multi-edges and self-loops are canonicalized away; NULL endpoints
    * fail loudly (a null edge would silently deflate its partner's
    * degree and over-peel).
    *
    * @param edges     columns `src`, `dst` (any orderable node type)
    * @param k         minimum surviving degree (>= 1)
    * @param maxRounds loud cap on peel rounds: the fixpoint MUST be
    *                  reached within this many rounds or the call
    *                  fails — a silent cap would return a superset of
    *                  the k-core and pass spam the gate exists to stop
    * @return (node, deg_full, deg_core) — one row per k-core member
    */
  def peel(spark: SparkSession, edges: DataFrame, k: Int,
           maxRounds: Int): DataFrame = {
    require(k >= 1, s"KCore: k must be >= 1, got $k")
    require(maxRounds >= 1, s"KCore: maxRounds must be >= 1, got $maxRounds")
    val raw = edges.select(col("src"), col("dst"))
    val g = raw.agg(count(lit(1)),
      count(when(col("src").isNotNull && col("dst").isNotNull, 1))).head()
    require(g.getLong(0) > 0,
      "KCore: empty edge frame — land edges before peeling")
    require(g.getLong(1) == g.getLong(0),
      s"KCore: ${g.getLong(0) - g.getLong(1)} edges carry a NULL " +
        "endpoint — a null edge silently deflates its partner's degree " +
        "and over-peels; repair the edge feed")
    val canon = raw
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .persist()
    val chain = graft.plans.Checkpoints.chain() // reliable-policy file GC
    try {
      def degAmong(alive: DataFrame): DataFrame = {
        val ae = canon
          .join(alive.select(col("node").as("u")), Seq("u"), "left_semi")
          .join(alive.select(col("node").as("v")), Seq("v"), "left_semi")
        ae.select(col("u").as("node"))
          .unionAll(ae.select(col("v").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      }
      // full-graph degrees need no aliveness filter — one direct
      // aggregate over the canonical edge endpoints. PINNED: the final
      // join reads it after the last peel round. The initial node count
      // rides the pin's materialization (one action, not two).
      val obs0 = org.apache.spark.sql.Observation()
      val degFull = chain.pin(canon.select(col("u").as("node"))
        .unionAll(canon.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .observe(obs0, count(lit(1)).as("n")))
      // peel: survivors(r) = nodes with deg >= k among survivors(r-1);
      // the set only shrinks, so equal counts mean equal sets — the
      // 1-row count is the whole convergence test
      var survivors = degFull
      var aliveN = obs0.get("n").asInstanceOf[Long]
      var converged = aliveN == 0L
      var round = 0
      while (!converged) {
        round += 1
        require(round <= maxRounds,
          s"KCore: no fixpoint after $maxRounds peel rounds " +
            s"($aliveN nodes still alive) — a capped result would be a " +
            "SUPERSET of the k-core; raise maxRounds for this cascade")
        // one job per round: the survivor count rides the checkpoint
        // materialization as an Observation instead of a second action
        val obs = org.apache.spark.sql.Observation()
        val next = chain.cut(degAmong(survivors)
          .where(col("deg") >= k)
          .observe(obs, count(lit(1)).as("n")))
        val n = obs.get("n").asInstanceOf[Long]
        converged = n == aliveN || n == 0L
        survivors = next
        aliveN = n
      }
      // seal: the final cut this loop always had, now also reclaiming
      // every round's checkpoint files under the reliable policy
      chain.seal(
        survivors.select(col("node"), col("deg").as("deg_core"))
          .join(degFull.select(col("node"), col("deg").as("deg_full")),
            "node")
          .select(col("node"), col("deg_full"), col("deg_core")))
    } finally canon.unpersist()
  }

  /** FULL core decomposition — every node's maximal k (the production
    * form [[peel]]'s docstring names): the ascending-k ladder over the
    * same synchronous peel. One pass maintains the survivor set and
    * the current k; each round computes surviving degrees and either
    * REMOVES the below-k nodes (they leave with core number k−1 —
    * including nodes whose last neighbor just fell, which vanish from
    * the degree frame entirely) or, when nothing is below k, JUMPS k
    * straight to (min surviving degree) + 1 — a survivor set with min
    * degree d is the k-core for every k ≤ d, so the intermediate
    * thresholds are provably empty rungs and climbing them one at a
    * time would burn one full degree round each (on a clique that is
    * the whole ladder). Total rounds = Σ per-rung cascade depths +
    * #distinct support levels, never the degeneracy itself — the same
    * unit cost as [[peel]] (two semi-joins + one keyed count per
    * round; the min-degree rides the SAME observation as the count),
    * amortized over EVERY k instead of one: curation pipelines that
    * threshold different sources at different k read the one
    * persisted (node, core) table instead of re-running the peel per
    * threshold.
    *
    * Determinism and guards match [[peel]] (monotone set fixpoint, no
    * floats, loud NULL/empty refusals); `maxRounds` caps the TOTAL
    * ladder rounds — a capped run would MISLABEL every unfinished
    * node's core, so it refuses loudly. Isolated nodes never appear
    * (no edges → no rows), consistent with [[peel]].
    *
    * @return (node, core) — one row per node with ≥ 1 edge; core >= 1
    */
  def coreNumbers(spark: SparkSession, edges: DataFrame,
                  maxRounds: Int): DataFrame = {
    require(maxRounds >= 1,
      s"KCore: maxRounds must be >= 1, got $maxRounds")
    val raw = edges.select(col("src"), col("dst"))
    val g = raw.agg(count(lit(1)),
      count(when(col("src").isNotNull && col("dst").isNotNull, 1))).head()
    require(g.getLong(0) > 0,
      "KCore: empty edge frame — land edges before decomposing")
    require(g.getLong(1) == g.getLong(0),
      s"KCore: ${g.getLong(0) - g.getLong(1)} edges carry a NULL " +
        "endpoint — a null edge silently deflates its partner's degree " +
        "and mislabels core numbers; repair the edge feed")
    val canon = raw
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .persist()
    val chain = graft.plans.Checkpoints.chain() // reliable-policy file GC
    try {
      def degAmong(alive: DataFrame): DataFrame = {
        val ae = canon
          .join(alive.select(col("node").as("u")), Seq("u"), "left_semi")
          .join(alive.select(col("node").as("v")), Seq("v"), "left_semi")
        ae.select(col("u").as("node"))
          .unionAll(ae.select(col("v").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      }
      // the initial node count rides the cut's materialization (one
      // action, not two — the peel rounds' Observation discipline)
      val obs0 = org.apache.spark.sql.Observation()
      var survivors = chain.cut(canon.select(col("u").as("node"))
        .unionAll(canon.select(col("v").as("node")))
        .distinct()
        .observe(obs0, count(lit(1)).as("n")))
      var nSurv = obs0.get("n").asInstanceOf[Long]
      var k = 1
      var round = 0
      val assigned = Vector.newBuilder[DataFrame]
      while (nSurv > 0L) {
        round += 1
        require(round <= maxRounds,
          s"KCore: core decomposition not finished after $maxRounds " +
            s"rounds ($nSurv nodes unassigned at k=$k) — a capped run " +
            "would mislabel every unassigned node's core; raise " +
            "maxRounds for this cascade")
        val obs = org.apache.spark.sql.Observation()
        val degHigh = chain.cut(degAmong(survivors)
          .where(col("deg") >= k)
          .observe(obs, count(lit(1)).as("n"), min(col("deg")).as("mind")))
        val nHigh = obs.get("n").asInstanceOf[Long]
        if (nHigh == nSurv) {
          // nothing below k: the survivor set IS the k-core — and the
          // k'-core for every k' up to its min degree d, so the
          // intermediate rungs are provably empty. Jump to d+1 AND
          // execute that rung's first peel sub-round straight off the
          // ALREADY-MATERIALIZED degree frame (the deg==d nodes are
          // exactly what peeling at d+1 removes first, with core d);
          // re-deriving the same degrees next round would waste the
          // round's two semi-joins per support level
          val mind = obs.get("mind").asInstanceOf[Long]
          // PINNED: every per-rung core frame is read by the final union
          assigned += chain.pin(degHigh.where(col("deg") === mind)
            .select(col("node"), lit(mind).as("core")))
          val obs2 = org.apache.spark.sql.Observation()
          survivors = chain.cut(degHigh.where(col("deg") > mind)
            .select(col("node"))
            .observe(obs2, count(lit(1)).as("n"))) // one scan of the cached frame, no joins
          nSurv = obs2.get("n").asInstanceOf[Long]
          k = mind.toInt + 1
        } else {
          // peel: everyone not in degHigh — below-k nodes AND nodes
          // whose degree frame row vanished with their last neighbor —
          // leaves with core number k-1
          assigned += chain.pin(survivors
            .join(degHigh.select(col("node")), Seq("node"), "left_anti")
            .select(col("node"), lit((k - 1).toLong).as("core")))
          survivors = chain.cut(degHigh.select(col("node")))
          nSurv = nHigh
        }
      }
      val frames = assigned.result()
      // self-loop-only input: the guards pass (edges exist) but the
      // canonical simple graph is empty — the graceful empty frame,
      // matching peel's behavior on the identical input
      if (frames.isEmpty) {
        // the initial survivors cut is tracked but the empty result
        // reads nothing — reclaim it (the finisher contract holds on
        // every exit path)
        chain.reclaimAll()
        canon.select(col("u").as("node"), lit(0L).as("core")).limit(0)
      }
      // seal: the final cut this ladder always had, now also reclaiming
      // every rung's pinned + windowed files under the reliable policy
      else chain.seal(frames.reduce(_ unionAll _))
    } finally canon.unpersist()
  }
}
