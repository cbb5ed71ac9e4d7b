package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007, "Near linear
  * time algorithm to detect community structures") — community
  * detection, the signal [[ConnectedComponents]] cannot give on a
  * CONNECTED graph: components answer "is there any path", LPA answers
  * "where do the dense blocks sit". Curation uses it to find mirror
  * farms and topic pockets inside one giant crawl component.
  *
  * Semantics (pinned, both engines): labels start as the node's own
  * id; each round every node adopts the most frequent label among its
  * neighbors, ties to the LEXICOGRAPHICALLY SMALLEST label; all nodes
  * update simultaneously (synchronous). The report is the labeling
  * after exactly `rounds` rounds — classic synchronous LPA can
  * oscillate on bipartite structures, so a fixed round count is the
  * deterministic contract (the PageRank fixed-iteration discipline),
  * not a fixpoint claim. Everything is counts and string ordering —
  * no floats, no RNG — so any engine reproduces the rows bit-for-bit.
  *
  * Scale notes (100 TB): each round is one edge-keyed join against
  * the |V|-row label frame, one (node, label) count aggregate
  * (map-side combinable), and one per-node argmax window whose
  * partition is bounded by the node's distinct neighbor-label count —
  * never a global or corpus-sized sort. Labels are localCheckpointed
  * per round (flat lineage; reliable checkpoint on a real cluster).
  * Input tolerance and guards match [[Triangles.localCounts]].
  */
object LabelPropagation {

  /** @param edges  columns `src`, `dst` (undirected; canonicalized)
    * @param rounds fixed synchronous update rounds (>= 1)
    * @return (node, community) after exactly `rounds` rounds
    */
  def run(spark: SparkSession, edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"LabelPropagation: rounds must be >= 1, got $rounds")
    val raw = edges.select(col("src"), col("dst"))
    val g = raw.agg(count(lit(1)),
      count(when(col("src").isNotNull && col("dst").isNotNull, 1))).head()
    require(g.getLong(0) > 0,
      "LabelPropagation: empty edge frame — land edges before labeling")
    require(g.getLong(1) == g.getLong(0),
      s"LabelPropagation: ${g.getLong(0) - g.getLong(1)} edges carry a " +
        "NULL endpoint — their votes would silently vanish from every " +
        "neighborhood; repair the edge feed")
    val canon = raw
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .persist()
    try {
      val adj = canon.select(col("u").as("node"), col("v").as("nbr"))
        .unionAll(canon.select(col("v").as("node"), col("u").as("nbr")))
        .localCheckpoint()
      var labels = adj.select(col("node")).distinct()
        .select(col("node"), col("node").as("community"))
        .localCheckpoint()
      val byVote = Window.partitionBy(col("node"))
        .orderBy(col("cnt").desc, col("community"))
      (1 to rounds).foreach { _ =>
        labels = adj
          .join(labels.select(col("node").as("nbr"), col("community")),
            "nbr")
          .groupBy(col("node"), col("community"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("__rn", row_number().over(byVote))
          .where(col("__rn") === 1)
          .select(col("node"), col("community"))
          .localCheckpoint()
      }
      labels
    } finally canon.unpersist()
  }
}
