package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixed-iteration PageRank in pure integer arithmetic — the link-
  * quality weighting a pretraining pipeline applies to a crawl's host
  * graph (CommonCrawl-style URL scoring), expressed so the result is
  * BIT-IDENTICAL on any engine:
  *
  *   r0(v)      = SCALE div n
  *   teleport   = (15 * (SCALE div n)) div 100
  *   r_{k+1}(v) = teleport + (85 * Σ_{u→v} (r_k(u) div deg(u))) div 100
  *
  * All quantities are nonnegative BIGINTs, so Spark's `div` (truncate
  * toward zero) and DuckDB's `//` (floor) coincide, and integer sums
  * are order-independent — the same quantized-lattice discipline as
  * graft.operators.EmbeddingPca / the Lloyd-trained ANN rows. Rank mass
  * leaks only truncation dust (< 1 unit per node per round at
  * SCALE = 1e12).
  *
  * The damping split (85/100) is Brin & Page's 0.85. Dangling nodes are
  * the caller's problem by contract: `edges` must give every node at
  * least one out-edge (an undirected graph fed as both directions
  * satisfies this for free); mass that would leave through a dangling
  * node is neither redistributed nor tracked.
  *
  * Scale notes (100 TB): per iteration ONE join of the edge list with
  * the rank frame on `src` and ONE aggregation on `dst` — both key
  * shuffles of the edge list; the rank frame is |V| rows (≪ |E|) and is
  * `localCheckpoint`ed per round so the loop's lineage stays flat (use
  * a reliable checkpoint dir on a real cluster). The edge list is
  * degree-annotated ONCE and persisted; with K fixed and small the
  * driver holds only `n` (one metadata-plane scalar).
  */
object PageRank {

  val Scale = 1000000000000L

  /** @param edges  columns `src`, `dst` (LongType node ids); every node
    *               referenced must appear as a `src` at least once
    * @param iters  fixed iteration count (both engines unroll the same K)
    * @return (node, rank_scaled) — one row per node, rank in SCALE units
    */
  def run(spark: SparkSession, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast(LongType).as("deg"))
    val ewd = edges.join(
      deg.select(col("node").as("src"), col("deg")), "src")
      .persist() // reused every round
    try {
      val n = deg.count() // ONE driver scalar: |V|
      require(n > 0, "PageRank: empty graph")
      val r0 = Scale / n
      val tp = 15L * r0 / 100L
      // The node spine: every node (deg requires each to appear as src).
      // Each round's aggregation only yields rows for nodes with IN-edges;
      // left-joining the shares back onto the spine keeps zero-in-degree
      // nodes (out-edges only — ubiquitous in crawl graphs) in the frame
      // at rank = teleport, so their outgoing contributions survive into
      // the next round instead of silently vanishing.
      val spine = deg.select(col("node")).localCheckpoint()
      var ranks = spine.select(col("node"), lit(r0).as("r"))
      (1 to iters).foreach { _ =>
        val shares = ewd.join(ranks, ewd("src") === ranks("node"))
          .select(col("dst"), expr("r div deg").as("share"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("share")).as("s"))
        ranks = spine.join(shares, Seq("node"), "left")
          .select(col("node"),
            (lit(tp) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
          .localCheckpoint()
      }
      ranks.select(col("node"), col("r").as("rank_scaled"))
    } finally ewd.unpersist()
  }
}
