package graft.operators

import graft.plans.Checkpoints.CutOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed triangle counting + local clustering coefficient over an
  * undirected simple graph — the community-density signal a crawl
  * curation pipeline reads next to [[PageRank]]/[[Hits]]: link farms
  * and mirror rings show up as near-clique neighborhoods (LCC ≈ 1)
  * while organic hub pages keep sparse neighborhoods (LCC ≈ 0), so the
  * coefficient separates "many links" from "colluding links", which
  * raw degree cannot.
  *
  * Algorithm: degree-ordered edge orientation (Schank & Wagner 2005;
  * the MapReduce formulation is Suri & Vassilvitskii, WWW 2011). Each
  * undirected edge is directed from its lower endpoint to its higher
  * endpoint under the total order (degree, node id); every triangle
  * then has exactly ONE vertex with two out-edges into the other two,
  * so enumerating wedges at each vertex's out-neighborhood and closing
  * them against the oriented edge set counts each triangle exactly
  * once — no /6 correction, no duplicate pairs.
  *
  * Scale notes (100 TB): the orientation bounds every out-degree by
  * O(√m) — a celebrity node with 10⁸ in-links gets out-degree only to
  * HIGHER-ranked nodes, of which there are at most O(√m) — so the
  * wedge self-join (the only superlinear step) is Σ outdeg² ≤ O(m^1.5)
  * worst-case and near-linear on power-law graphs, with NO skewed
  * reduce key: the wedge join key is the wedge center, whose fan-out
  * is the bounded out-degree. Every step is an equi-join or keyed
  * aggregate (shuffle-partitioned, map-side combinable); nothing is
  * collected to the driver.
  *
  * Determinism: all outputs are exact BIGINT counts; the coefficient
  * is published on an integer ppm lattice via truncating division
  * (`2·tri·10⁶ div deg·(deg−1)`), so any engine computing the same
  * simple graph reproduces the rows bit-for-bit.
  */
object Triangles {

  /** Per-node triangle counts over the simple graph induced by `edges`.
    *
    * Input tolerance: direction, multi-edges and self-loops are
    * normalization noise in real link feeds — edges are canonicalized
    * to unordered pairs, self-loops dropped, duplicates merged. NULL
    * endpoints are NOT tolerated (the [[Hits]] contract): a null would
    * silently vanish from the canonical pair frame and undercount its
    * partner's neighborhood, so the feed must be repaired first.
    *
    * @param edges columns `src`, `dst` (any orderable node type)
    * @return (node, deg, tri_cnt, lcc_ppm) — one row per node with at
    *         least one neighbor; `lcc_ppm` = 0 where deg < 2
    */
  def localCounts(spark: SparkSession, edges: DataFrame): DataFrame = {
    val raw = edges.select(col("src"), col("dst"))
    val g = raw.agg(count(lit(1)),
      count(when(col("src").isNotNull && col("dst").isNotNull, 1))).head()
    require(g.getLong(0) > 0,
      "Triangles: empty edge frame — land edges before counting")
    require(g.getLong(1) == g.getLong(0),
      s"Triangles: ${g.getLong(0) - g.getLong(1)} edges carry a NULL " +
        "endpoint — they would silently drop from the canonical pair " +
        "frame and undercount their partner's neighborhood; repair the " +
        "edge feed")
    val canon = raw
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .persist()
    val deg = canon.select(col("u").as("node"))
      .unionAll(canon.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .persist()
    var oriented: DataFrame = null
    try {
      // orient each edge from the (deg, node)-smaller endpoint to the
      // larger; carry the head's degree so wedges can order their legs
      // under the SAME total order without a re-join
      val ed = canon
        .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      val uFirst = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      // persisted: three consumers below (both wedge legs + the
      // closing-edge probe) would otherwise re-run the two degree
      // joins each
      oriented = ed.select(
        when(uFirst, col("u")).otherwise(col("v")).as("a"),
        when(uFirst, col("v")).otherwise(col("u")).as("b"),
        when(uFirst, col("dv")).otherwise(col("du")).as("db"))
        .persist()
      // wedges (a→b1, a→b2) with b1 below b2 in the orientation order;
      // the closing edge, if present, is oriented b1→b2 by construction
      val o1 = oriented.select(col("a"), col("b").as("b1"),
        col("db").as("db1"))
      val o2 = oriented.select(col("a"), col("b").as("b2"),
        col("db").as("db2"))
      val tris = o1.join(o2, Seq("a"))
        .where(col("db1") < col("db2") ||
          (col("db1") === col("db2") && col("b1") < col("b2")))
        .join(oriented.select(col("a").as("b1"), col("b").as("b2")),
          Seq("b1", "b2"))
        .select(col("a"), col("b1"), col("b2"))
      val perNode = tris.select(col("a").as("node"))
        .unionAll(tris.select(col("b1").as("node")))
        .unionAll(tris.select(col("b2").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("tri_cnt"))
      deg.join(perNode, Seq("node"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"),
          when(col("deg") >= 2,
            expr("(2 * coalesce(tri_cnt, 0L) * 1000000) " +
              "div (deg * (deg - 1))"))
            .otherwise(lit(0L)).as("lcc_ppm"))
        .cutLineage()
    } finally {
      // the eager localCheckpoint above already materialized through
      // every cache, so nothing is recomputed by releasing them here —
      // and a guard failure releases whatever was built before it
      canon.unpersist(); deg.unpersist()
      if (oriented != null) oriented.unpersist()
    }
  }
}
