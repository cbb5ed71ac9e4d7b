package graft.queries

import graft.Tables.t
import graft.operators.{ConnectedComponents, FuzzyJoin, Hits, KCore, LabelPropagation, PageRank, Triangles}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Entity-resolution and link-graph operators — the record-linkage face
  * of the reference's duplicate detection (scripts/validate_row.py:172-173
  * generalized from exact-key to near-key matching) plus the crawl-graph
  * scoring a pretraining pipeline applies to host links:
  *
  *  - q_dedup_fuzzy_join     — SymSpell deletion-blocked edit-distance
  *                             join (operators/FuzzyJoin): lossless
  *                             candidates, exact levenshtein post-filter.
  *  - q_dedup_fuzzy_cluster  — the fuzzy pairs composed into transitive
  *                             entity clusters via the O(log n)
  *                             star-contraction components operator.
  *  - q_graph_pagerank       — fixed-iteration integer-lattice PageRank
  *                             (operators/PageRank) over a host link
  *                             graph; hosts 7..19 have out-edges only,
  *                             so the row itself exercises the
  *                             zero-in-degree spine path.
  *  - q_text_fuzzy_distance  — the SQL-registered damerau_levenshtein
  *                             kernel beside the built-in levenshtein
  *                             (the transposition delta is visible on
  *                             reversed strings: dl("ab","ba")=1, lev=2).
  *
  * Scale notes: the fuzzy join runs on the DISTINCT key frame (64 names
  * here; vocabulary-sized, not corpus-sized, at any SF — near-key
  * matching on raw rows would square duplicate keys for nothing), the
  * components contraction is O(log n) shuffle rounds, and PageRank is
  * one edge-list join + one aggregation per fixed iteration.
  */
object GraphQueries extends QueryPack {

  private val FuzzyDist = 2
  private val PageRankIters = 5
  private val HitsIters = 3
  private val KCoreK = 2

  /** Fixed synchronous LPA rounds for q_graph_lpa — both engines
    * unroll the same 4 (the PageRank fixed-iteration discipline;
    * synchronous LPA may oscillate, so the row reports round 4's
    * labeling, not a fixpoint claim).
    */
  private val LpaRounds = 4

  /** Round cap for the iterated-Louvain row (refineTrace's loud
    * bound). The fixture reaches its gain fixpoint at round 2 (round 1
    * merges the bipartite halves, round 2 proves no move remains) —
    * the cap is margin, and the oracle unrolls exactly the 2 rounds
    * the fixture's trace contains.
    */
  private val LouvainMaxRounds = 8
  private[graft] val LouvainFixtureRounds = 2

  /** Dumbbell fixture for the FULL-Louvain (contraction) row: 64
    * nodes (the documents doc_id % 64 residues — all present from 64
    * docs up, so the graph is identical at every SF), 16 cliques of 4
    * (clique c = nodes 4c..4c+3), paired into 8 dumbbells by one
    * bridge edge (8j+3)–(8j+4). m = 16·6 + 8 = 104. The
    * resolution-limit shape (Fortunato & Barthélémy 2007): from the
    * clique labeling no single node's down-label move has positive
    * gain (a bridge node would leave its 3 clique neighbors for 1 —
    * Δ·4m² = −8m−32 < 0), yet merging the two cliques of a dumbbell
    * raises Q (contracted supernode gain Δ·4m² = 4m − 2·13² =
    * 416−338 = +78) — exactly the climb only the contraction phase
    * can take. Mirrored verbatim in the oracle.
    */
  private[graft] val LouvainPhaseMaxRounds = 8
  private[graft] val LouvainPhaseMaxPhases = 5

  private def dumbbellNodes(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select((col("doc_id") % 64).cast(LongType).as("n")).distinct()

  private def dumbbellEdges(s: SparkSession, dir: String): DataFrame = {
    val res = dumbbellNodes(s, dir)
    val intra = res.select(col("n").as("src"), expr("n div 4").as("c"))
      .join(res.select(col("n").as("dst"), expr("n div 4").as("c")), "c")
      .where(col("src") < col("dst"))
      .select(col("src"), col("dst"))
    val bridge = res.where(col("n") % 8 === 3)
      .select(col("n").as("src"), (col("n") + 1).as("dst"))
    intra.unionAll(bridge)
  }

  private def dumbbellCliqueLabels(s: SparkSession, dir: String): DataFrame =
    dumbbellNodes(s, dir)
      .select(col("n").as("node"), (expr("n div 4") * 4).as("community"))

  /** Link-farm gate cuts: flag a host when its neighborhood is both
    * LARGE (deg ≥ 4) and DENSE (lcc ≥ 0.5 in ppm) — the
    * colluding-ring signature. Shared by all three gate faces.
    */
  private[graft] val LinkFarmMinDeg = 4L
  private[graft] val LinkFarmMinLccPpm = 500000L

  /** SOURCE-level link graph for the link-farm gate: nodes are the
    * documents' actual `source` values (source = src<doc_id%20> on
    * this fixture), edges pair each source with a second residue
    * stream under the (a+b)%3=0 rule — the ≡0 class forms the clique
    * ring, the other classes stay triangle-free at equal degree.
    * Mirrored verbatim in the q_graph_linkfarm_gate oracle.
    */
  private def sourceLinkEdges(s: SparkSession, dir: String): DataFrame = {
    val a = col("doc_id") % 20
    val b = expr("doc_id div 20") % 20
    t(s, dir, "documents")
      .where(a =!= b && (a + b) % 3 === 0)
      .select(col("source").as("src"),
        concat(lit("src"), b.cast(StringType)).as("dst"))
  }

  /** SOURCE-level graph for the CORE-NUMBER gate, built so cores
    * actually differ across sources (the all-one-core sourceLinkEdges
    * graph could not separate anything): a ring over all 20 source
    * residues (every node core 2) plus a 7-clique among the ≡0-mod-3
    * residues (those nodes core 6) — so a minCore=3 threshold keeps
    * exactly the clique-embedded sources. Mirrored verbatim in the
    * q_graph_core_gate oracle.
    */
  private def coreGateEdges(s: SparkSession, dir: String): DataFrame = {
    val a = col("doc_id") % 20
    val b = expr("doc_id div 20") % 20
    val docs = t(s, dir, "documents")
    val ring = docs.select(
      concat(lit("src"), a.cast(StringType)).as("src"),
      concat(lit("src"), ((a + 1) % 20).cast(StringType)).as("dst"))
    val clique = docs
      .where(a % 3 === 0 && b % 3 === 0 && a =!= b)
      .select(concat(lit("src"), a.cast(StringType)).as("src"),
        concat(lit("src"), b.cast(StringType)).as("dst"))
    ring.unionAll(clique)
  }

  /** Gate threshold: keep sources embedded at least this densely —
    * the clique ring sits at core 6, the plain ring at core 2, so 3
    * separates them. Shared by the row and the table face.
    */
  private[graft] val CoreGateMinCore = 3L

  /** ONE core-number gate definition for the registered row and the
    * table-backed form (Orchestrator.coreGateAgainstNumbers) — the
    * linkFarmGateOf discipline: broadcast the (graph-sized) core
    * table, left-join on the document's source, surface unknown hosts
    * as known_host=false (never a silent drop), keep iff the source's
    * core number clears the threshold. Map-side after the broadcast
    * join.
    */
  private[graft] def coreGateOf(docs: DataFrame, cores: DataFrame,
                                minCore: Long): DataFrame =
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(cores.select(col("node").as("source"), col("core"))),
        Seq("source"), "left")
      .select(col("doc_id"), col("source").as("host"), col("core"),
        col("core").isNotNull.as("known_host"),
        coalesce(col("core") >= minCore, lit(false)).as("kept"))

  /** Per-(session, SF) memo of the round-4 LPA labeling on the
    * residue fixture graph — the stand-in for the PERSISTED
    * indexes/graph_communities artifact. THREE rows probe it (the
    * communities report, the modularity A/B, the refined A/B), so
    * recomputing the 4 synchronous rounds per row would triple the
    * one-time cost the warehouse table amortizes in production.
    */
  private val lpaLabelsMemo = new SessionMemo[String, DataFrame]()

  private[graft] def lpaLabels(s: SparkSession, dir: String): DataFrame =
    lpaLabelsMemo.get(s, dir) {
      LabelPropagation.run(s, triangleFixtureEdges(s, dir), LpaRounds)
    }

  /** Per-(session, SF) memo of the source-graph core numbers the
    * registered gate row probes — the stand-in for the PERSISTED
    * indexes/graph_core_numbers artifact the table face reads.
    */
  private val sourceCoreMemo = new SessionMemo[String, DataFrame]()

  private[graft] def sourceCoreNumbers(s: SparkSession,
                                       dir: String): DataFrame =
    sourceCoreMemo.get(s, dir) {
      KCore.coreNumbers(s, coreGateEdges(s, dir), maxRounds = 32)
    }

  /** Per-(session, SF) memo of the source-graph triangle counts the
    * registered gate row probes — the stand-in for the PERSISTED
    * indexes/graph_triangle_counts artifact the table face reads
    * (the hostRanks discipline: the driver contract gives the row no
    * warehouse).
    */
  private val sourceTriMemo = new SessionMemo[String, DataFrame]()

  private[graft] def sourceTriangleCounts(s: SparkSession,
                                          dir: String): DataFrame =
    sourceTriMemo.get(s, dir) {
      Triangles.localCounts(s, sourceLinkEdges(s, dir))
    }

  /** ONE link-farm gate definition for the batch row, the
    * table-backed form and the streaming face: broadcast the (graph-
    * sized) triangle-count table, left-join on the document's source,
    * surface unknown hosts as known_host=false (never a silent drop),
    * flag iff the neighborhood is large AND dense. Map-side after the
    * broadcast join — works unchanged on a streaming frame.
    */
  private[graft] def linkFarmGateOf(docs: DataFrame,
                                    tri: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(tri.select(col("node").as("source"), col("deg"),
        col("lcc_ppm"))), Seq("source"), "left")
      .select(col("doc_id"), col("source").as("host"),
        col("deg"), col("lcc_ppm"),
        col("lcc_ppm").isNotNull.as("known_host"),
        coalesce(col("deg") >= LinkFarmMinDeg
          && col("lcc_ppm") >= LinkFarmMinLccPpm, lit(false)).as("flagged"))

  /** The residue-structured host graph shared by q_graph_triangles
    * and q_graph_lpa: nodes h0..h28 from doc_id residues, edge rule
    * (a+b)%3=0 — triangles concentrate in the ≡0 class and the three
    * residue classes form the community structure.
    */
  private[graft] def triangleFixtureEdges(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "documents").select(
      (col("doc_id") % 29).as("a"),
      (expr("doc_id div 29") % 29).as("b"))
    p.where(col("a") =!= col("b") && (col("a") + col("b")) % 3 === 0)
      .select(concat(lit("h"), col("a").cast(StringType)).as("src"),
        concat(lit("h"), col("b").cast(StringType)).as("dst"))
  }

  /** Loud peel-round cap for the registered k-core row AND the round
    * count the DuckDB oracle unrolls — the fixture's longest cascade is
    * 13 rounds (the pendant path), so 16 proves convergence with margin
    * while keeping Spark's early-exit invisible in the rows (extra
    * rounds past a fixpoint are no-ops on both engines).
    */
  private val KCoreMaxRounds = 16

  /** Total ladder-round cap for q_graph_core_numbers: the fixture's
    * ladder spends ~13 rounds in the k=2 rung (the pendant cascade)
    * and a couple per populated rung; the support-jump rule collapses
    * the empty rungs between the cycle's core 2 and the clique's core
    * 10 into one round — 64 proves completion with wide margin.
    */
  private val CoreNumMaxRounds = 64

  /** The k-core fixture graph: doc_id % 500 pins the SAME edge set at
    * every SF (doc_id is dense from 0 at each scale), split four ways
    * by residue into an 11-clique (nodes 0-10), a pendant path 11-23
    * anchored at node 0, a 7-cycle 24-30, and a star centered at 31
    * with leaves 32-36. Mirrored verbatim by [[kcoreEdgesCte]].
    */
  private[graft] def kcoreEdges(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id") % 500
    val tc = d % 4
    val i = expr("(doc_id % 500) div 4")
    val j13 = i % 13
    val j12 = i % 12
    val a = when(tc <= 1, i % 11)
      .when(tc === 2, when(j13 < 12, lit(11) + j13).otherwise(lit(0)))
      .otherwise(when(j12 < 7, lit(24) + j12).otherwise(lit(31)))
    val b = when(tc <= 1, expr("((doc_id % 500) div 4) div 11") % 11)
      .when(tc === 2, when(j13 < 12, lit(12) + j13).otherwise(lit(11)))
      .otherwise(when(j12 < 7, lit(24) + (j12 + 1) % 7)
        .otherwise(lit(25) + j12))
    t(s, dir, "documents")
      .select(a.as("a"), b.as("b"))
      .where(col("a") =!= col("b"))
      .select(concat(lit("n"), col("a").cast(StringType)).as("src"),
        concat(lit("n"), col("b").cast(StringType)).as("dst"))
  }

  /** Edit-distance bound for the incremental (batch-vs-master) match:
    * d=1 — the dirty-feed fixture perturbs keys by one deletion, and
    * master-data reconciliation classically uses tight bounds.
    */
  private[graft] val IncrFuzzyDist = 1

  /** Per-(session, SF) memo of the MASTER key variant index probed by
    * q_dedup_fuzzy_incremental: the deletion-neighborhood blocking
    * table (variant_hash, name_master) over the distinct master keys.
    * In production this is a persisted warehouse table maintained
    * batch-over-batch (the run/Orchestrator.indexDedupBatch
    * discipline); memoizing + persisting here models exactly that —
    * the per-query cost is the batch probe, never a master re-block.
    * MEMORY_AND_DISK so cache pressure demotes to disk instead of
    * silently recomputing.
    */
  private val fuzzyIdxMemo = new SessionMemo[String, DataFrame]()

  private[graft] def masterFuzzyIndex(s: SparkSession, dir: String): DataFrame =
    fuzzyIdxMemo.get(s, dir) {
      import org.apache.spark.storage.StorageLevel
      t(s, dir, "part")
        .where(col("p_partkey") % 10 =!= 0)
        .select(col("p_name").as("name_master")).distinct()
        .withColumn("__vh", explode(
          FuzzyJoin.deletionVariants(col("name_master"), IncrFuzzyDist)))
        .withColumn("__vh", xxhash64(col("__vh")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** Loud cap on the streaming gate's frozen variant model: master KEY
    * sets are dimension-sized by contract (names, codes, titles — not
    * corpus text), so the model must fit a plan literal; a master list
    * that blows this cap needs the batch prober, not a bigger literal.
    */
  private[graft] val MaxVariantModelEntries = 500000

  /** The master variant index collected as a FROZEN model for the
    * streaming gate (StreamingJobs.fuzzyMatchStream): variant_hash ->
    * sorted master names. Metadata-plane collect, bounded by the
    * distinct-key vocabulary x neighborhood size and guarded loudly —
    * the same train-on-warehouse, ship-as-literal shape as the DSIR
    * and calibrated gate models.
    */
  private[graft] def masterVariantModel(
      s: SparkSession, dir: String): Map[Long, Seq[String]] = {
    val grouped = masterFuzzyIndex(s, dir)
      .groupBy(col("__vh"))
      .agg(sort_array(collect_list(col("name_master"))).as("names"))
    // ONE job, capped driver materialization: limit(cap+1) bounds what
    // the driver ever holds (the require fires on the sentinel row), and
    // a compliant model is collected in the same pass instead of
    // re-running the aggregation for a separate count
    val rows = grouped.limit(MaxVariantModelEntries + 1).collect()
    require(rows.length <= MaxVariantModelEntries,
      s"masterVariantModel: > $MaxVariantModelEntries variant entries " +
        "exceed the plan-literal cap — use the batch prober")
    rows.map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
  }

  /** The new-batch key frame for the incremental match: today's
    * arrivals (p_partkey % 10 == 0) with the leading character dropped
    * — a deterministic "dirty feed" one deletion away from its master
    * key, so the fixture exercises real near-matches, not just
    * exact-equality hits.
    */
  private[graft] def dirtyBatchKeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").where(col("p_partkey") % 10 === 0)
      .select(expr("substring(p_name, 2)").as("name_new")).distinct()

  /** ONE probe definition for batch-vs-master fuzzy matching, shared by
    * the registered row (memoized index) and the warehouse-table form
    * (run/Orchestrator.fuzzyMatchAgainstIndex) so the two cannot drift:
    * the batch keys (`name_new`) explode their deletion neighborhoods
    * map-side and equi-join the variant index (`__vh`, `name_master`);
    * exact threshold-levenshtein filter; ONE bounded per-key window
    * picks the best master (min dist, lexicographic tiebreak); the left
    * join keeps unmatched keys as explicit matched=false rows.
    */
  private[graft] def fuzzyMatchKeys(batch: DataFrame, variantIdx: DataFrame,
                                    maxDist: Int): DataFrame = {
    val cand = batch
      .withColumn("__vh", explode(
        FuzzyJoin.deletionVariants(col("name_new"), maxDist)))
      .withColumn("__vh", xxhash64(col("__vh")))
      .join(variantIdx, "__vh")
      .select(col("name_new"), col("name_master")).distinct()
      .withColumn("dist",
        levenshtein(col("name_new"), col("name_master"), maxDist))
      .where(col("dist") >= 0)
    val w = Window.partitionBy(col("name_new"))
      .orderBy(col("dist"), col("name_master"))
    val best = cand.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("name_new"), col("name_master"),
        col("dist").cast(LongType).as("dist"))
    batch.join(best, Seq("name_new"), "left")
      .select(col("name_new"),
        col("name_master").as("matched_master"), col("dist"),
        col("name_master").isNotNull.as("matched"))
  }

  /** Distinct part names, renamed for the two sides of the self fuzzy
    * join (FuzzyJoin requires disjoint column names across sides).
    */
  private def nameSides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val names = t(s, dir, "part").select(col("p_name")).distinct()
    (names.select(col("p_name").as("name_a")),
      names.select(col("p_name").as("name_b")))
  }

  /** Per-(session, SF) memo of the fuzzy pair frame — TWO registered
    * rows (join + cluster) consume it, so an un-memoized build would
    * re-run the whole blocking join (explode, two guard shuffles,
    * candidate distinct, levenshtein filter) per consumer per bench
    * run (the TextQueries.dedupFrame lesson: ~14 s of triplicated
    * closure work before that memo landed). Memoizing also bounds
    * FuzzyJoin.join's two internal variant-frame persists to one build
    * per (session, SF) — they have no owner to unpersist them, so the
    * cap on rebuilds is the leak control.
    */
  private val fuzzyPairsMemo = new SessionMemo[String, DataFrame]()

  private def fuzzyPairs(s: SparkSession, dir: String): DataFrame =
    fuzzyPairsMemo.get(s, dir) {
      import org.apache.spark.storage.StorageLevel
      val (l, r) = nameSides(s, dir)
      // a < b keeps one row per unordered pair (the join emits both
      // orientations of a symmetric relation)
      FuzzyJoin.join(l, r, "name_a", "name_b", FuzzyDist)
        .where(col("name_a") < col("name_b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** Per-(session, SF) memo of the fuzzy entity-cluster table (node,
    * component) — the contraction runs eagerly, so memoizing it models
    * the persisted cluster table a pipeline materializes once per
    * master snapshot; the cluster row and the row-level canonical
    * re-attachment both read it.
    */
  private val fuzzyClustersMemo = new SessionMemo[String, DataFrame]()

  private def fuzzyClusters(s: SparkSession, dir: String): DataFrame =
    fuzzyClustersMemo.get(s, dir) {
      val pairs = fuzzyPairs(s, dir)
      val edges = pairs
        .select(col("name_a").as("src"), col("name_b").as("dst"))
        .unionAll(pairs
          .select(col("name_b").as("src"), col("name_a").as("dst")))
      val nodes = t(s, dir, "part")
        .select(col("p_name").as("node")).distinct()
      ConnectedComponents.largeSmallStar(nodes, edges)
    }

  /** Per-(session, SF) memo of the host rank table — the PageRank loop
    * runs eagerly (localCheckpointed fixpoint), so memoizing models the
    * persisted host-score table crawl curation serves gates from; the
    * rank row and the per-document gate both read it.
    */
  private val hostRanksMemo = new SessionMemo[String, DataFrame]()

  private[graft] def hostRanks(s: SparkSession, dir: String): DataFrame =
    hostRanksMemo.get(s, dir) {
      val edges = t(s, dir, "documents")
        .select(col("source").as("src"),
          concat(lit("src"), (col("doc_id") % 7).cast(StringType)).as("dst"))
        .distinct()
      PageRank.run(s, edges, PageRankIters)
    }

  /** Host-quality keep threshold for the gate rows: above every
    * teleport-only rank (zero-in-degree hosts sit at tp ≈ SCALE·0.15/n)
    * and below every linked host's fixpoint on this graph shape — the
    * "has actual inbound trust" cut.
    */
  private[graft] val HostRankKeep = 10000000000L

  /** ONE gate definition for batch and stream (the gopherFrameOf
    * discipline): left-join the host score table on source, keep iff
    * the rank clears the cut; an unknown host surfaces as
    * known_host=false, never a silent pass/fail. Map-side after a
    * broadcast-sized join — works unchanged on a streaming frame.
    */
  private[graft] def hostGateOf(docs: DataFrame, ranks: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(ranks
        .select(col("node").as("source"),
          col("rank_scaled").as("host_rank"))), Seq("source"), "left")
      .select(col("doc_id"), col("source").as("host"), col("host_rank"),
        col("host_rank").isNotNull.as("known_host"),
        coalesce(col("host_rank") > HostRankKeep, lit(false)).as("keep"))

  val queries: Map[String, Q] = Map(
    // Near-key record linkage on the distinct name frame: every
    // unordered pair within edit distance 2, found via deletion-
    // neighborhood blocking (never an all-pairs scan), exact-filtered.
    "q_dedup_fuzzy_join" -> ((s, dir) =>
      fuzzyPairs(s, dir).select(col("name_a"), col("name_b"),
        col("dist").cast(LongType).as("dist"))),

    // Entity resolution: the fuzzy pair graph's transitive closure via
    // alternating large-star/small-star contraction — component = the
    // lexicographically smallest name reachable, keep = the canonical
    // representative. Same composition as q_dedup_components, with the
    // near-key (edit-distance) pair generator instead of MinHash-LSH.
    "q_dedup_fuzzy_cluster" -> ((s, dir) =>
      fuzzyClusters(s, dir)
        .select(col("node").as("p_name"), col("component"),
          (col("node") === col("component")).as("keep"))),

    // Row-level canonical re-attachment — the documented consumption
    // contract of the cluster table ("callers re-attach row ids by an
    // exact equi-join on the matched key"): every part row gets its
    // entity-canonical name via one equi-join against the persisted
    // cluster table. This is what downstream marts key on.
    "q_dedup_fuzzy_canonical" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"), col("p_name"))
        .join(fuzzyClusters(s, dir)
          .select(col("node").as("p_name"),
            col("component").as("canonical_name")), "p_name")
        .select(col("p_partkey"), col("p_name"), col("canonical_name"))),

    // Host-graph link scoring: each document "links" its host to host
    // (doc_id mod 7), so hosts src7.. have out-edges but ZERO in-edges
    // — the crawl-graph shape (hub pages nobody links back to) that
    // must keep teleport rank, not vanish. Integer-lattice arithmetic
    // makes the result hash-exact against the oracle's unrolled CTEs.
    "q_graph_pagerank" -> ((s, dir) =>
      hostRanks(s, dir).select(col("node").as("host"), col("rank_scaled"))),

    // Per-document host-quality gate — the production CONSUMPTION of
    // the rank table: each document left-joins the persisted host
    // scores (never recomputing the graph) and keeps iff its host has
    // actual inbound trust (rank above every teleport-only value). A
    // host missing from the rank table surfaces as known_host=false,
    // never a silent pass/fail — the calibrated-gate discipline.
    "q_graph_host_gate" -> ((s, dir) =>
      hostGateOf(t(s, dir, "documents"), hostRanks(s, dir))),

    // Weighted variant: the link COUNT between two hosts is the weight
    // (the natural strength signal a crawl graph provides — no distinct,
    // the multi-edge multiplicity IS the data). A host linking B 24x
    // and C once sends B 24x the share; integer lattice as above, with
    // the loud MaxWeight overflow guard inside the operator.
    "q_graph_pagerank_weighted" -> ((s, dir) => {
      val edges = t(s, dir, "documents")
        .select(col("source").as("src"),
          concat(lit("src"), (col("doc_id") % 7).cast(StringType)).as("dst"))
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).cast(LongType).as("w"))
      PageRank.runWeighted(s, edges, PageRankIters)
        .select(col("node").as("host"), col("rank_scaled"))
    }),

    // Personalized (topic-sensitive, Haveliwala 2002) variant: teleport
    // mass restricted to a 3-host seed set — rank measures
    // link-proximity to trusted seeds (the seed-biased host scoring
    // crawl curation runs). Hosts unreachable from the seeds rank 0.
    "q_graph_pagerank_personalized" -> ((s, dir) => {
      val edges = t(s, dir, "documents")
        .select(col("source").as("src"),
          concat(lit("src"), (col("doc_id") % 7).cast(StringType)).as("dst"))
        .distinct()
      val seeds = t(s, dir, "documents")
        .select(col("source").as("node")).distinct()
        .where(col("node").isin("src0", "src1", "src2"))
      PageRank.runPersonalized(s, edges, seeds, PageRankIters)
        .select(col("node").as("host"), col("rank_scaled"))
    }),

    // Dangling-tolerant variant — the crawl-FRONTIER shape: each host
    // also "links" a sink node ('snk' || doc_id%3, a discovered-but-
    // not-yet-crawled page) that has NO out-edges. The classic faces
    // refuse such graphs loudly (their sink mass would vanish); this
    // face keeps sink rows and redistributes their mass uniformly each
    // round (the classic dangling-vector treatment) — sinks still
    // accumulate rank, and total mass is conserved up to lattice dust.
    "q_graph_pagerank_dangling" -> ((s, dir) => {
      val edges = t(s, dir, "documents")
        .select(col("source").as("src"),
          concat(lit("snk"), (col("doc_id") % 3).cast(StringType)).as("dst"))
        .distinct()
      PageRank.runDanglingRedistributed(s, edges, PageRankIters)
        .select(col("node").as("host"), col("rank_scaled"))
    }),

    // HITS hubs/authorities (Kleinberg 1999) — the second classic
    // link-analysis signal beside PageRank, on the crawl-frontier edge
    // set: sources link sink pages, so sources score as HUBS (link to
    // good authorities) and sinks as AUTHORITIES (linked by good hubs)
    // — curation uses the authority side to find canonical content and
    // the hub side to flag link farms. Integer power-iteration rescale
    // per round keeps both engines bit-identical.
    "q_graph_hits" -> ((s, dir) => {
      val edges = t(s, dir, "documents")
        .select(col("source").as("src"),
          concat(lit("snk"), (col("doc_id") % 3).cast(StringType)).as("dst"))
        .distinct()
      Hits.run(s, edges, HitsIters)
        .select(col("node").as("host"), col("hub_scaled"),
          col("auth_scaled"))
    }),

    // Triangle counts + local clustering coefficient on a host graph
    // (operators/Triangles: degree-ordered orientation, each triangle
    // enumerated exactly once). The fixture wires residues of doc_id
    // into a 29-node graph whose (a+b)%3=0 edge rule concentrates
    // every triangle inside the ≡0 residue class — so the output
    // separates clique-embedded hosts (lcc ≈ 10⁶ ppm) from hosts with
    // the same DEGREE but triangle-free neighborhoods (lcc = 0), which
    // is exactly the link-farm-vs-hub distinction the operator exists
    // to draw. Oracle = the plain u<v<w three-way self-join; the
    // orientation must be invisible in the rows.
    "q_graph_triangles" -> ((s, dir) =>
      Triangles.localCounts(s, triangleFixtureEdges(s, dir))),

    // Link-farm gate — the triangle plane's production consumer: a
    // host with MANY links (high degree) whose neighbors also all link
    // each other (lcc near 10^6 ppm) is a colluding ring, not an
    // organic hub; raw degree cannot draw that line, the clustering
    // coefficient can. ONE gate definition (linkFarmGateOf) serves
    // this row, the table form (Orchestrator
    // .linkFarmGateAgainstTriangles over the persisted
    // graph_triangle_counts artifact) and the streaming face
    // (StreamingJobs.linkFarmGateStream), so the three cannot drift —
    // the hostGateOf discipline. On this fixture the ≡0 residue
    // sources form the clique ring and get flagged; the bipartite
    // classes keep identical DEGREES but zero triangles and pass.
    "q_graph_linkfarm_gate" -> ((s, dir) =>
      linkFarmGateOf(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        sourceTriangleCounts(s, dir))),

    // Synchronous label-propagation communities
    // (operators/LabelPropagation, fixed 4 rounds) on the same
    // residue-structured host graph: components would report ONE blob
    // (the graph is connected), LPA recovers the three residue-class
    // communities (the ≡0 clique block and the 1/2 bipartite halves) —
    // the mirror-farm/topic-pocket signal inside a single crawl
    // component. Oracle = the identical 4 unrolled synchronous rounds.
    // The labeling is session-memoized (lpaLabels — the persisted
    // communities artifact's stand-in): the modularity and refined
    // rows probe the SAME labeling, as their production forms probe
    // the one warehouse table.
    "q_graph_lpa" -> ((s, dir) => lpaLabels(s, dir)),

    // k-core membership (operators/KCore: synchronous peel to
    // fixpoint) on a fixture built to exercise the CASCADE that makes
    // the operator more than a degree filter: doc_id % 500 (the same
    // edge set at every SF) wires an 11-clique, a 13-node pendant path
    // anchored to it, a 7-cycle, and a 5-leaf star. At k=2 the star
    // peels in two rounds, the path unravels ONE NODE PER ROUND for 12
    // rounds — every interior node had degree 2 until its outer
    // neighbor fell — and the fixpoint keeps exactly clique + cycle.
    // A one-pass `deg >= 2` filter would keep the whole path; the hash
    // compare certifies the cascade.
    "q_graph_kcore" -> ((s, dir) => {
      val edges = kcoreEdges(s, dir)
      KCore.peel(s, edges, KCoreK, KCoreMaxRounds)
    }),

    // FULL core-number decomposition (KCore.coreNumbers — the
    // ascending-k ladder over the same synchronous peel) on the same
    // cascade fixture: one pass assigns every node its MAXIMAL k, so
    // pipelines thresholding different sources at different k read one
    // persisted table instead of re-peeling per k. The fixture's
    // ground truth exercises the whole ladder: the 11-clique lands at
    // core 10, the 7-cycle at core 2, the pendant path and the star at
    // core 1 — and the path still unravels one node per round inside
    // the k=2 rung (the cascade a one-pass degree filter cannot see).
    // Oracle = the unrolled peel-ladder CTE (k=2..11 rungs, each rung
    // peeled to fixpoint from the previous rung's core, core(v) = max
    // rung containing v).
    "q_graph_core_numbers" -> ((s, dir) =>
      KCore.coreNumbers(s, kcoreEdges(s, dir), CoreNumMaxRounds)),

    // Core-number gate — the decomposition's production consumer (the
    // linkFarmGate discipline): keep a document iff its source sits at
    // least minCore-deep in the link graph — robust density a raw
    // degree threshold cannot certify (the ring nodes have degree >= 2
    // forever; only the clique ring survives the k=3 peel). ONE gate
    // definition (coreGateOf) serves this row and the table form
    // (Orchestrator.coreGateAgainstNumbers over the persisted
    // graph_core_numbers artifact), and the per-source threshold reads
    // the ONE core-number table — no re-peel per threshold. Oracle =
    // the same unrolled ladder + the same gate join.
    "q_graph_core_gate" -> ((s, dir) =>
      coreGateOf(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        sourceCoreNumbers(s, dir), CoreGateMinCore)),

    // LPA quality measurement — the measure-don't-assume row every
    // heuristic operator carries, for the communities row above:
    // Newman-Girvan modularity of the round-4 labeling on the integer
    // lattice (num/den exact BIGINTs, ppm via floor division), A/B'd
    // against the fixture's STRUCTURAL two-block partition (the ≡0
    // residue class vs the merged 1-2 bipartite block — the partition
    // the edge rule actually induces). Measured: lpa_round4 =
    // 11590 ppm vs residue_blocks = 452032 ppm — the honest number
    // behind the communities row: synchronous LPA keeps the bipartite
    // halves apart (their edges are all inter-class), so its labeling
    // captures far less modularity than the merged-block truth. A
    // consumer thresholding on community quality reads THIS row, not
    // the label count. Oracle = the identical 4 unrolled rounds + the
    // same lattice arithmetic for both labelings.
    "q_graph_lpa_modularity" -> ((s, dir) => {
      val edges = triangleFixtureEdges(s, dir)
      val lpa = lpaLabels(s, dir)
      val blocks = lpa.select(col("node"),
        when(expr("CAST(substring(node, 2, 10) AS BIGINT)") % 3 === 0,
          lit("b0")).otherwise(lit("b12")).as("community"))
      // ONE shared-frame measurement plan for both labelings (r21
      // resume, guide §2.4 — was two independent modularity subplans:
      // two guard scans, two canon distincts, two degree aggregates);
      // identical per-state arithmetic, so the rows are unchanged
      LabelPropagation.modularityAB(lpa, blocks, edges)
        .select(when(col("__st") === 0L, "lpa_round4")
            .otherwise("residue_blocks").as("labeling"),
          col("communities"), col("m_edges"), col("modularity_num"),
          col("modularity_den"), col("modularity_ppm"))
    }),

    // Modularity REFINEMENT — the follow-through on the A/B above:
    // one deterministic Louvain move round (refineOnce — synchronous,
    // oscillation-free by the down-label rule) applied to the round-4
    // LPA labeling, with the SAME modularity measurement beside it.
    // Measured on the fixture: 11590 ppm -> 452032 ppm in ONE round —
    // the move phase merges the bipartite halves LPA kept apart and
    // recovers exactly the structural two-block partition the A/B
    // named as the target. The row reports before AND after, so the
    // gain is the artifact, not a claim. Oracle = the identical move
    // arithmetic unrolled over l_4.
    "q_graph_lpa_refined" -> ((s, dir) => {
      val edges = triangleFixtureEdges(s, dir)
      // ONE shared-frame plan for the move round AND both measurements
      // (r21 resume, guide §2.4 — the composed form ran three guarded
      // canon scans/degree aggregates and duplicated the un-cut refined
      // subtree into every measurement join); same move + measurement
      // arithmetic, so the rows are unchanged
      LabelPropagation.refineOnceMeasured(lpaLabels(s, dir), edges)
        .select(when(col("__st") === 0L, "lpa_round4")
            .otherwise("refined_1").as("labeling"),
          col("communities"), col("m_edges"), col("modularity_num"),
          col("modularity_den"), col("modularity_ppm"))
    }),

    // Iterated Louvain to a GAIN FIXPOINT — the production form of the
    // single move round above (refineTrace: loop refineOnce under the
    // down-label termination contract, loud round cap, and the
    // per-round modularity trace AS the row). Measured on the fixture:
    // round 0 = 11590 ppm (the LPA round-4 labeling), round 1 = 452032
    // ppm (the bipartite halves merge in one move round), round 2
    // moved=0 — the fixpoint PROVEN in-row, already at the structural
    // optimum on THIS fixture, so the curve has one plateau and it is
    // the target; the contraction ladder for corpora that plateau
    // BELOW their optimum is q_graph_louvain_phases. A consumer reads
    // the trace, not a convergence claim. Oracle = the identical move
    // arithmetic unrolled twice + the same lattice modularity per
    // round.
    "q_graph_louvain" -> ((s, dir) => {
      val edges = triangleFixtureEdges(s, dir)
      LabelPropagation.refineTrace(lpaLabels(s, dir), edges,
        LouvainMaxRounds)
    }),

    // FULL Louvain with the CONTRACTION phase — the production claim
    // behind the iterated row above (Blondel et al. 2008): on the
    // dumbbell fixture the move phase provably plateaus BELOW the
    // structural optimum (phase 1: moved=0 from the clique labeling —
    // the resolution-limit shape), the contraction phase takes the
    // climb node moves cannot (phase 2: every dumbbell's higher
    // clique merges into its partner in ONE synchronous round), and
    // phase 3 proves the post-contraction fixpoint. The per-phase
    // per-round trace IS the row, every modularity measured on the
    // ORIGINAL graph with flattened labels — round 0 of each phase
    // re-proves the contraction preserved Q (the Blondel invariant,
    // in-row). Oracle = the identical weighted move arithmetic +
    // contraction, unrolled over the fixed 64-node graph.
    "q_graph_louvain_phases" -> ((s, dir) =>
      LabelPropagation.louvainPhases(dumbbellCliqueLabels(s, dir),
        dumbbellEdges(s, dir), LouvainPhaseMaxRounds,
        LouvainPhaseMaxPhases)),

    // Incremental entity resolution — the shape a daily ingest actually
    // runs: match a NEW batch's (dirty) keys against the EXISTING
    // master key list without re-blocking the master side. The batch
    // keys explode their deletion neighborhoods map-side and equi-join
    // the PERSISTED master variant index, so cost scales with the
    // BATCH (the q_dedup_incremental discipline); the exact filter +
    // one bounded per-key window then pick the best master match
    // (min dist, lexicographic tiebreak), and unmatched keys survive
    // the left join as explicit matched=false rows — a silent drop
    // would hide feed corruption. Oracle = the plain all-pairs
    // levenshtein join + the same ROW_NUMBER pick.
    "q_dedup_fuzzy_incremental" -> ((s, dir) =>
      fuzzyMatchKeys(dirtyBatchKeys(s, dir), masterFuzzyIndex(s, dir),
        IncrFuzzyDist)),

    // The SQL-registered native kernel beside the built-in: unrestricted
    // Damerau-Levenshtein counts a transposition as 1 where plain
    // levenshtein needs 2 — visible on name-vs-reversed-name. ASCII
    // input, so Spark's codepoint semantics and the kernel's (and
    // DuckDB's) byte semantics coincide.
    "q_text_fuzzy_distance" -> ((s, dir) => {
      graft.functions.GraftExtensions.install(s)
      t(s, dir, "part").select(col("p_partkey"), col("p_name"))
        .selectExpr("p_partkey",
          "CAST(damerau_levenshtein(p_name, reverse(p_name)) AS BIGINT) AS dl_rev",
          "CAST(levenshtein(p_name, reverse(p_name)) AS BIGINT) AS lev_rev")
    }))

  /** Unrolled integer-lattice PageRank CTE chain (the Lloyd-rows
    * discipline: both engines run the same K iterations; all values are
    * nonnegative BIGINTs, where DuckDB's `//` and Spark's `div` — both
    * truncating toward zero — trivially agree, and the per-dst SUM is
    * order-free).
    */
  /** Unrolled synchronous peel (the pageRankOracle discipline: both
    * engines run the same bounded rounds; degrees are exact BIGINTs so
    * the compare is bit-level). The edge CASE mirrors [[kcoreEdges]]
    * verbatim; rounds past the fixpoint are no-ops, so Spark's
    * early-exit is invisible in the rows.
    */
  /** The k-core fixture's raw residue map + canonical edge CTEs,
    * shared verbatim by the fixed-k and core-number oracles (the one
    * edge rule [[kcoreEdges]] mirrors).
    */
  private val kcoreFixtureCtes: String =
    s"""raw AS (
           SELECT CASE
                    WHEN (doc_id % 500) % 4 <= 1
                      THEN ((doc_id % 500) // 4) % 11
                    WHEN (doc_id % 500) % 4 = 2 THEN
                      CASE WHEN ((doc_id % 500) // 4) % 13 < 12
                           THEN 11 + ((doc_id % 500) // 4) % 13
                           ELSE 0 END
                    ELSE
                      CASE WHEN ((doc_id % 500) // 4) % 12 < 7
                           THEN 24 + ((doc_id % 500) // 4) % 12
                           ELSE 31 END
                  END AS a,
                  CASE
                    WHEN (doc_id % 500) % 4 <= 1
                      THEN (((doc_id % 500) // 4) // 11) % 11
                    WHEN (doc_id % 500) % 4 = 2 THEN
                      CASE WHEN ((doc_id % 500) // 4) % 13 < 12
                           THEN 12 + ((doc_id % 500) // 4) % 13
                           ELSE 11 END
                    ELSE
                      CASE WHEN ((doc_id % 500) // 4) % 12 < 7
                           THEN 24 + (((doc_id % 500) // 4) % 12 + 1) % 7
                           ELSE 25 + ((doc_id % 500) // 4) % 12 END
                  END AS b
           FROM documents),
         e AS MATERIALIZED (
               SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
               FROM raw WHERE a <> b)"""

  private val kcoreOracle: String = {
    // every round CTE is MATERIALIZED: a_{r-1} is referenced twice per
    // round, so default inlining would DOUBLE the expression tree each
    // round — 2^rounds expansion before the optimizer ever runs
    def round(r: Int): String =
      s""",
         ae_$r AS MATERIALIZED (
                   SELECT e.u, e.v FROM e
                   JOIN a_${r - 1} x ON x.node = e.u
                   JOIN a_${r - 1} y ON y.node = e.v),
         a_$r AS MATERIALIZED (
                  SELECT n AS node, CAST(COUNT(*) AS BIGINT) AS deg
                  FROM (SELECT u AS n FROM ae_$r
                        UNION ALL SELECT v AS n FROM ae_$r)
                  GROUP BY n HAVING COUNT(*) >= $KCoreK)"""
    s"""WITH $kcoreFixtureCtes,
         degf AS (SELECT n AS node, CAST(COUNT(*) AS BIGINT) AS deg
                  FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
                  GROUP BY n),
         a_0 AS (SELECT node, deg FROM degf)""" +
      (1 to KCoreMaxRounds).map(round).mkString +
      s"""
         SELECT 'n' || CAST(a.node AS VARCHAR) AS node,
                f.deg AS deg_full, a.deg AS deg_core
         FROM a_$KCoreMaxRounds a JOIN degf f ON f.node = a.node"""
  }

  /** Unrolled peel-LADDER for the full core decomposition: rung k
    * peels to fixpoint FROM THE PREVIOUS RUNG'S CORE ((k+1)-core ⊆
    * k-core, so each rung restarts from a superset of its answer —
    * never from the full graph), with enough unrolled rounds per rung
    * to cover the fixture's cascades (13 for the pendant path inside
    * k=2, ≤2 elsewhere; extra rounds past a fixpoint are no-ops).
    * core(v) = the max rung whose core still contains v.
    */
  /** The ladder's CTE chain, parameterized over the ambient edge CTE
    * `e` (u, v): rung CTEs a_k_r + a final `cores` CTE (node, core).
    * Shared by the core-number row's oracle and the core-gate oracle —
    * one SQL ladder, two fixtures.
    */
  private def coreLadderCtes(maxK: Int, roundsFor: Int => Int): String = {
    def round(k: Int, r: Int): String =
      s""",
         ae_${k}_$r AS MATERIALIZED (
                   SELECT e.u, e.v FROM e
                   JOIN a_${k}_${r - 1} x ON x.node = e.u
                   JOIN a_${k}_${r - 1} y ON y.node = e.v),
         a_${k}_$r AS MATERIALIZED (
                  SELECT n AS node
                  FROM (SELECT u AS n FROM ae_${k}_$r
                        UNION ALL SELECT v AS n FROM ae_${k}_$r)
                  GROUP BY n HAVING COUNT(*) >= $k)"""
    def rung(k: Int): String =
      s""",
         a_${k}_0 AS (SELECT node FROM a_${k - 1}_${roundsFor(k - 1)})""" +
        (1 to roundsFor(k)).map(round(k, _)).mkString
    s""",
         a_1_${roundsFor(1)} AS (
           SELECT n AS node
           FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
           GROUP BY n)""" +
      (2 to maxK).map(rung).mkString +
      s""",
         cores AS (
           SELECT node, CAST(MAX(k) AS BIGINT) AS core
           FROM (""" +
      (1 to maxK).map(k =>
        s"SELECT node, $k AS k FROM a_${k}_${roundsFor(k)}")
        .mkString("\n               UNION ALL ") +
      s""")
           GROUP BY node)"""
  }

  private val coreNumbersOracle: String =
    // maxK 11: the 11-clique's core is 10 and rung 11 proves it empty;
    // 16 rounds inside the k=2 rung cover the 13-round pendant cascade
    s"""WITH $kcoreFixtureCtes""" +
      coreLadderCtes(maxK = 11,
        k => if (k == 2) KCoreMaxRounds else 4) +
      s"""
         SELECT 'n' || CAST(node AS VARCHAR) AS node, core FROM cores"""

  /** Core-gate oracle: the SAME ladder over the ring+clique source
    * graph ([[coreGateEdges]] mirrored), then the same broadcast-shaped
    * left join and threshold. maxK 7: the clique core is 6 and rung 7
    * proves it empty; every rung's cascade is ≤ 2 rounds (the ring
    * peels in one), so 4 rounds per rung is double margin.
    */
  private val coreGateOracle: String =
    s"""WITH p AS (SELECT doc_id % 20 AS a, (doc_id // 20) % 20 AS b
                   FROM documents),
         eraw AS (
           SELECT 'src' || CAST(a AS VARCHAR) AS x,
                  'src' || CAST((a + 1) % 20 AS VARCHAR) AS y
           FROM p
           UNION ALL
           SELECT 'src' || CAST(a AS VARCHAR),
                  'src' || CAST(b AS VARCHAR)
           FROM p WHERE a % 3 = 0 AND b % 3 = 0 AND a <> b),
         e AS MATERIALIZED (
           SELECT DISTINCT LEAST(x, y) AS u, GREATEST(x, y) AS v
           FROM eraw WHERE x <> y)""" +
      coreLadderCtes(maxK = 7, _ => 4) +
      s"""
         SELECT d.doc_id, d.source AS host, c.core,
                c.core IS NOT NULL AS known_host,
                COALESCE(c.core >= $CoreGateMinCore, FALSE) AS kept
         FROM documents d LEFT JOIN cores c ON c.node = d.source"""

  /** Unrolled synchronous LPA round CTEs (the kcoreOracle discipline —
    * MATERIALIZED per round; counts and string ordering only, so the
    * compare is bit-level), shared by the communities row and the
    * modularity measurement. Edge CTE mirrors [[triangleFixtureEdges]].
    */
  private val lpaCtes: String = {
    def round(r: Int): String =
      s""",
         c_$r AS MATERIALIZED (
           SELECT a.node, l.community, COUNT(*) AS cnt
           FROM adj a JOIN l_${r - 1} l ON l.node = a.nbr
           GROUP BY a.node, l.community),
         l_$r AS MATERIALIZED (
           SELECT node, community FROM (
             SELECT node, community,
                    ROW_NUMBER() OVER (PARTITION BY node
                      ORDER BY cnt DESC, community) AS rn
             FROM c_$r) WHERE rn = 1)"""
    s"""WITH p AS (SELECT doc_id % 29 AS a, (doc_id // 29) % 29 AS b
                   FROM documents),
         e AS MATERIALIZED (
           SELECT DISTINCT 'h' || CAST(LEAST(a, b) AS VARCHAR) AS u,
                  'h' || CAST(GREATEST(a, b) AS VARCHAR) AS v
           FROM p WHERE a <> b AND (a + b) % 3 = 0),
         adj AS MATERIALIZED (
           SELECT u AS node, v AS nbr FROM e
           UNION ALL SELECT v AS node, u AS nbr FROM e),
         l_0 AS MATERIALIZED (
           SELECT DISTINCT node, node AS community FROM adj)""" +
      (1 to LpaRounds).map(round).mkString
  }

  private val lpaOracle: String =
    lpaCtes + s"""
         SELECT node, community FROM l_$LpaRounds"""

  /** Newman-Girvan modularity of a labeling on the integer lattice,
    * mirroring LabelPropagation.modularity exactly: num/den are
    * BIGINTs (×4m² clears all denominators), ppm via floor division —
    * DuckDB's // TRUNCATES toward zero like Spark's div (verified), so
    * this side carries the identical negative-remainder correction,
    * and the ×10⁶ runs on HUGEINT mirroring Spark's DECIMAL(38,0). One
    * CTE block per labeling, the two final SELECTs unioned — the A/B
    * the registered row reports.
    */
  private def modularityCtes(tag: String, labCte: String): String =
    s""",
         lab_$tag AS ($labCte),
         intra_$tag AS (
           SELECT lu.community, CAST(COUNT(*) AS BIGINT) AS in_e
           FROM e
           JOIN lab_$tag lu ON lu.node = e.u
           JOIN lab_$tag lv ON lv.node = e.v
           WHERE lu.community = lv.community
           GROUP BY lu.community),
         dsum_$tag AS (
           SELECT l.community, CAST(SUM(d.deg) AS BIGINT) AS dc
           FROM lab_$tag l JOIN degs d ON d.node = l.node
           GROUP BY l.community),
         contrib_$tag AS (
           SELECT ds.community,
                  4 * mm.m * COALESCE(i.in_e, 0) - ds.dc * ds.dc AS num,
                  mm.m AS m
           FROM dsum_$tag ds CROSS JOIN mm
           LEFT JOIN intra_$tag i ON i.community = ds.community)"""

  private def modularitySelect(tag: String, labeling: String): String =
    s"""SELECT '$labeling' AS labeling,
                CAST(COUNT(*) AS BIGINT) AS communities,
                m AS m_edges,
                CAST(SUM(num) AS BIGINT) AS modularity_num,
                4 * m * m AS modularity_den,
                CAST((CAST(SUM(num) AS HUGEINT) * 1000000) // (4 * m * m)
                  - CASE WHEN (CAST(SUM(num) AS HUGEINT) * 1000000)
                              % (4 * m * m) < 0
                         THEN 1 ELSE 0 END AS BIGINT) AS modularity_ppm
         FROM contrib_$tag
         GROUP BY m"""

  private val lpaModularityOracle: String =
    lpaCtes + s""",
         mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
         degs AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
                  FROM adj GROUP BY node)""" +
      modularityCtes("a", s"SELECT node, community FROM l_$LpaRounds") +
      modularityCtes("b",
        """SELECT DISTINCT node,
                  CASE WHEN CAST(substring(node, 2, 10) AS BIGINT) % 3 = 0
                       THEN 'b0' ELSE 'b12' END AS community
           FROM adj""") +
      s"""
         ${modularitySelect("a", "lpa_round4")}
         UNION ALL
         ${modularitySelect("b", "residue_blocks")}"""

  /** One unrolled down-label Louvain move round over l_4 (the exact
    * refineOnce arithmetic: Δ·4m² against the pre-round sums,
    * candidates strictly smaller-labeled, argmax with smallest-c
    * ties, stay unless Δ > 0), then the modularity A/B of before vs
    * after.
    */
  private val lpaRefinedOracle: String =
    lpaCtes + s""",
         mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
         degs AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
                  FROM adj GROUP BY node),
         adjw_l AS (SELECT node, nbr, CAST(1 AS BIGINT) AS w FROM adj)""" +
      wmoveCtes(s"l_$LpaRounds", "adjw_l", "degs", "1") +
      modularityCtes("a", s"SELECT node, community FROM l_$LpaRounds") +
      modularityCtes("c", "SELECT node, community FROM r_1") +
      s"""
         ${modularitySelect("a", "lpa_round4")}
         UNION ALL
         ${modularitySelect("c", "refined_1")}"""

  /** One trace row of the louvain oracle: round + moved (a scalar
    * subquery comparing the round's labeling to its input) + the
    * lattice modularity of `contrib_$tag`.
    */
  private def louvainSelect(tag: String, round: Int,
                            movedSql: String): String =
    s"""SELECT CAST($round AS BIGINT) AS round,
                $movedSql AS moved,
                CAST(COUNT(*) AS BIGINT) AS communities,
                m AS m_edges,
                CAST(SUM(num) AS BIGINT) AS modularity_num,
                4 * m * m AS modularity_den,
                CAST((CAST(SUM(num) AS HUGEINT) * 1000000) // (4 * m * m)
                  - CASE WHEN (CAST(SUM(num) AS HUGEINT) * 1000000)
                              % (4 * m * m) < 0
                         THEN 1 ELSE 0 END AS BIGINT) AS modularity_ppm
         FROM contrib_$tag
         GROUP BY m"""

  /** Iterated-Louvain trace oracle: the fixture's fixpoint is at round
    * [[LouvainFixtureRounds]] (= 2: round 1 moves, round 2 proves no
    * move), so exactly that many move rounds are unrolled and the
    * trace rows 0..2 are emitted with their measured moved counts —
    * the engine's early-stopping refineTrace must produce the same.
    */
  private val louvainOracle: String = {
    val moves = (1 to LouvainFixtureRounds).map { r =>
      wmoveCtes(if (r == 1) s"l_$LpaRounds" else s"r_${r - 1}",
        "adjw_l", "degs", r.toString)
    }.mkString
    val mods = modularityCtes("lv0",
      s"SELECT node, community FROM l_$LpaRounds") +
      (1 to LouvainFixtureRounds).map(r =>
        modularityCtes(s"lv$r", s"SELECT node, community FROM r_$r"))
        .mkString
    def movedSql(r: Int): String =
      if (r == 0) "CAST(0 AS BIGINT)"
      else {
        val prev = if (r == 1) s"l_$LpaRounds" else s"r_${r - 1}"
        s"""(SELECT CAST(COUNT(*) AS BIGINT)
             FROM r_$r n JOIN $prev p ON p.node = n.node
             WHERE n.community <> p.community)"""
      }
    lpaCtes + s""",
         mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
         degs AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
                  FROM adj GROUP BY node),
         adjw_l AS (SELECT node, nbr, CAST(1 AS BIGINT) AS w FROM adj)""" +
      moves + mods + "\n         " +
      (0 to LouvainFixtureRounds).map(r =>
        louvainSelect(s"lv$r", r, movedSql(r)))
        .mkString("\n         UNION ALL\n         ")
  }

  /** THE unrolled down-label move round `inLab` -> `r_$sfx` — one SQL
    * template for every Louvain oracle (q_graph_lpa_refined,
    * q_graph_louvain, q_graph_louvain_phases — the engine's ONE
    * refineOnceOnW body mirrored once, so a gain-arithmetic change
    * cannot silently diverge the three gates): k = Σw over the
    * level's weighted adjacency `adjName` (w = 1 for the original
    * graph), degrees from the level's self-loop-inclusive `degName`;
    * `mm` is the constant total weight — contraction preserves it.
    */
  private def wmoveCtes(inLab: String, adjName: String, degName: String,
                        sfx: String): String =
    s""",
         dsw_$sfx AS (
           SELECT l.community, CAST(SUM(d.deg) AS BIGINT) AS dc
           FROM $inLab l JOIN $degName d ON d.node = l.node
           GROUP BY l.community),
         kvw_$sfx AS (
           SELECT a.node, l.community, CAST(SUM(a.w) AS BIGINT) AS k
           FROM $adjName a JOIN $inLab l ON l.node = a.nbr
           GROUP BY a.node, l.community),
         ownw_$sfx AS (
           SELECT l.node, l.community AS a, d.deg,
                  COALESCE(k.k, 0) AS k_a, ds.dc AS d_a
           FROM $inLab l
           JOIN $degName d ON d.node = l.node
           LEFT JOIN kvw_$sfx k
             ON k.node = l.node AND k.community = l.community
           JOIN dsw_$sfx ds ON ds.community = l.community),
         candw_$sfx AS (
           SELECT o.node, kv.community AS c,
                  4 * mm.m * (kv.k - o.k_a)
                    - 2 * o.deg * (ds.dc - o.d_a + o.deg) AS delta
           FROM ownw_$sfx o
           JOIN kvw_$sfx kv ON kv.node = o.node AND kv.community < o.a
           JOIN dsw_$sfx ds ON ds.community = kv.community
           CROSS JOIN mm),
         pickw_$sfx AS (
           SELECT node, c FROM (
             SELECT node, c, ROW_NUMBER() OVER (
               PARTITION BY node ORDER BY delta DESC, c) AS rn
             FROM candw_$sfx WHERE delta > 0) WHERE rn = 1),
         r_$sfx AS MATERIALIZED (
           SELECT o.node, COALESCE(p.c, o.a) AS community
           FROM ownw_$sfx o LEFT JOIN pickw_$sfx p ON p.node = o.node)"""

  /** One trace row of the phases oracle: (phase, round, moved) + the
    * lattice modularity of `contrib_$tag` (the louvainSelect shape
    * with the phase column).
    */
  private def phaseSelect(tag: String, phase: Int, round: Int,
                          movedSql: String): String =
    s"""SELECT CAST($phase AS BIGINT) AS phase,
                CAST($round AS BIGINT) AS round,
                $movedSql AS moved,
                CAST(COUNT(*) AS BIGINT) AS communities,
                m AS m_edges,
                CAST(SUM(num) AS BIGINT) AS modularity_num,
                4 * m * m AS modularity_den,
                CAST((CAST(SUM(num) AS HUGEINT) * 1000000) // (4 * m * m)
                  - CASE WHEN (CAST(SUM(num) AS HUGEINT) * 1000000)
                              % (4 * m * m) < 0
                         THEN 1 ELSE 0 END AS BIGINT) AS modularity_ppm
         FROM contrib_$tag
         GROUP BY m"""

  private def movedSql(cur: String, prev: String): String =
    s"""(SELECT CAST(COUNT(*) AS BIGINT)
         FROM $cur n JOIN $prev p ON p.node = n.node
         WHERE n.community <> p.community)"""

  /** Full-Louvain phases oracle over the dumbbell fixture: the graph,
    * the weighted move rounds, BOTH contractions and every per-round
    * flattened-modularity measurement computed in SQL — the fixture's
    * known shape (phase 1 plateau, phase 2 one move round, phase 3
    * empty contracted edge set) only fixes how many rounds are
    * UNROLLED, exactly the louvainOracle discipline.
    */
  private val louvainPhasesOracle: String = {
    s"""WITH nodes AS (
           SELECT DISTINCT CAST(doc_id % 64 AS BIGINT) AS n FROM documents),
         e AS MATERIALIZED (
           SELECT a.n AS u, b.n AS v FROM nodes a JOIN nodes b
             ON a.n // 4 = b.n // 4 AND a.n < b.n
           UNION ALL
           SELECT n AS u, n + 1 AS v FROM nodes WHERE n % 8 = 3),
         mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
         adj AS (SELECT u AS node, v AS nbr FROM e
                 UNION ALL SELECT v, u FROM e),
         degs AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
                  FROM adj GROUP BY node),
         adjw1 AS (SELECT node, nbr, CAST(1 AS BIGINT) AS w FROM adj),
         l_p1in AS (SELECT n AS node, (n // 4) * 4 AS community
                    FROM nodes)""" +
      wmoveCtes("l_p1in", "adjw1", "degs", "p1") + s""",
         ce2 AS MATERIALIZED (
           SELECT LEAST(la.community, lb.community) AS u,
                  GREATEST(la.community, lb.community) AS v,
                  CAST(COUNT(*) AS BIGINT) AS w
           FROM e JOIN r_p1 la ON la.node = e.u
           JOIN r_p1 lb ON lb.node = e.v
           WHERE la.community <> lb.community GROUP BY 1, 2),
         adjw2 AS (SELECT u AS node, v AS nbr, w FROM ce2
                   UNION ALL SELECT v, u, w FROM ce2),
         degs2 AS (SELECT l.community AS node,
                          CAST(SUM(d.deg) AS BIGINT) AS deg
                   FROM r_p1 l JOIN degs d ON d.node = l.node
                   GROUP BY l.community),
         l_p2in AS (SELECT DISTINCT community AS node, community
                    FROM r_p1)""" +
      wmoveCtes("l_p2in", "adjw2", "degs2", "p2a") +
      wmoveCtes("r_p2a", "adjw2", "degs2", "p2b") + s""",
         f_p2a AS (SELECT p1.node, p2.community
                   FROM r_p1 p1 JOIN r_p2a p2 ON p2.node = p1.community),
         f_p2b AS (SELECT p1.node, p2.community
                   FROM r_p1 p1 JOIN r_p2b p2 ON p2.node = p1.community),
         ce3 AS MATERIALIZED (
           SELECT LEAST(la.community, lb.community) AS u,
                  GREATEST(la.community, lb.community) AS v,
                  CAST(SUM(c.w) AS BIGINT) AS w
           FROM ce2 c JOIN r_p2b la ON la.node = c.u
           JOIN r_p2b lb ON lb.node = c.v
           WHERE la.community <> lb.community GROUP BY 1, 2),
         adjw3 AS (SELECT u AS node, v AS nbr, w FROM ce3
                   UNION ALL SELECT v, u, w FROM ce3),
         degs3 AS (SELECT l.community AS node,
                          CAST(SUM(d.deg) AS BIGINT) AS deg
                   FROM r_p2b l JOIN degs2 d ON d.node = l.node
                   GROUP BY l.community),
         l_p3in AS (SELECT DISTINCT community AS node, community
                    FROM r_p2b)""" +
      wmoveCtes("l_p3in", "adjw3", "degs3", "p3") + s""",
         f_p3 AS (SELECT f.node, p3.community
                  FROM f_p2b f JOIN r_p3 p3 ON p3.node = f.community)""" +
      modularityCtes("q10", "SELECT node, community FROM l_p1in") +
      modularityCtes("q11", "SELECT node, community FROM r_p1") +
      modularityCtes("q20", "SELECT node, community FROM r_p1") +
      modularityCtes("q21", "SELECT node, community FROM f_p2a") +
      modularityCtes("q22", "SELECT node, community FROM f_p2b") +
      modularityCtes("q30", "SELECT node, community FROM f_p2b") +
      modularityCtes("q31", "SELECT node, community FROM f_p3") +
      "\n         " + Seq(
        phaseSelect("q10", 1, 0, "CAST(0 AS BIGINT)"),
        phaseSelect("q11", 1, 1, movedSql("r_p1", "l_p1in")),
        phaseSelect("q20", 2, 0, "CAST(0 AS BIGINT)"),
        phaseSelect("q21", 2, 1, movedSql("r_p2a", "l_p2in")),
        phaseSelect("q22", 2, 2, movedSql("r_p2b", "r_p2a")),
        phaseSelect("q30", 3, 0, "CAST(0 AS BIGINT)"),
        phaseSelect("q31", 3, 1, movedSql("r_p3", "l_p3in")))
        .mkString("\n         UNION ALL\n         ")
  }

  private val pageRankOracle: String = {
    def iter(k: Int): String =
      s""",
         r_$k AS (
           SELECT d.node,
                  CAST((15 * (1000000000000 // nn.n)) // 100
                       + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
           FROM deg d CROSS JOIN nn
           LEFT JOIN (SELECT e.dst AS node, SUM(r.r // g.deg) AS s
                      FROM edges e
                      JOIN r_${k - 1} r ON r.node = e.src
                      JOIN deg g ON g.node = e.src
                      GROUP BY e.dst) s ON s.node = d.node)"""
    """WITH edges AS (
           SELECT DISTINCT source AS src,
                  'src' || CAST(doc_id % 7 AS VARCHAR) AS dst
           FROM documents),
         deg AS (
           SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
           FROM edges GROUP BY src),
         nn AS (SELECT COUNT(*) AS n FROM deg),
         r_0 AS (
           SELECT d.node, CAST(1000000000000 // nn.n AS BIGINT) AS r
           FROM deg d CROSS JOIN nn)""" +
      (1 to PageRankIters).map(iter).mkString +
      s"""
         SELECT node AS host, r AS rank_scaled FROM r_$PageRankIters"""
  }

  /** Weighted unrolled chain: share = (r·w) // totw on the lattice. */
  private val pageRankWeightedOracle: String = {
    def iter(k: Int): String =
      s""",
         r_$k AS (
           SELECT t.node,
                  CAST((15 * (1000000000000 // nn.n)) // 100
                       + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
           FROM tot t CROSS JOIN nn
           LEFT JOIN (SELECT e.dst AS node,
                             SUM((r.r * e.w) // g.totw) AS s
                      FROM edges e
                      JOIN r_${k - 1} r ON r.node = e.src
                      JOIN tot g ON g.node = e.src
                      GROUP BY e.dst) s ON s.node = t.node)"""
    """WITH edges AS (
           SELECT source AS src,
                  'src' || CAST(doc_id % 7 AS VARCHAR) AS dst,
                  CAST(COUNT(*) AS BIGINT) AS w
           FROM documents GROUP BY 1, 2),
         tot AS (
           SELECT src AS node, CAST(SUM(w) AS BIGINT) AS totw
           FROM edges GROUP BY src),
         nn AS (SELECT COUNT(*) AS n FROM tot),
         r_0 AS (
           SELECT t.node, CAST(1000000000000 // nn.n AS BIGINT) AS r
           FROM tot t CROSS JOIN nn)""" +
      (1 to PageRankIters).map(iter).mkString +
      s"""
         SELECT node AS host, r AS rank_scaled FROM r_$PageRankIters"""
  }

  /** Personalized unrolled chain: teleport and r0 are the seed-masked
    * vector; everything else is the classic recurrence.
    */
  private val pageRankPersonalizedOracle: String = {
    def iter(k: Int): String =
      s""",
         r_$k AS (
           SELECT d.node,
                  CAST(CASE WHEN sd.node IS NOT NULL
                            THEN (15 * (1000000000000 // ns.n)) // 100
                            ELSE 0 END
                       + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
           FROM deg d CROSS JOIN ns
           LEFT JOIN seeds sd ON sd.node = d.node
           LEFT JOIN (SELECT e.dst AS node, SUM(r.r // g.deg) AS s
                      FROM edges e
                      JOIN r_${k - 1} r ON r.node = e.src
                      JOIN deg g ON g.node = e.src
                      GROUP BY e.dst) s ON s.node = d.node)"""
    """WITH edges AS (
           SELECT DISTINCT source AS src,
                  'src' || CAST(doc_id % 7 AS VARCHAR) AS dst
           FROM documents),
         deg AS (
           SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
           FROM edges GROUP BY src),
         seeds AS (
           SELECT node FROM deg WHERE node IN ('src0', 'src1', 'src2')),
         ns AS (SELECT COUNT(*) AS n FROM seeds),
         r_0 AS (
           SELECT d.node,
                  CAST(CASE WHEN s.node IS NOT NULL
                            THEN 1000000000000 // ns.n ELSE 0 END
                       AS BIGINT) AS r
           FROM deg d CROSS JOIN ns
           LEFT JOIN seeds s ON s.node = d.node)""" +
      (1 to PageRankIters).map(iter).mkString +
      s"""
         SELECT node AS host, r AS rank_scaled FROM r_$PageRankIters"""
  }

  /** Dangling-redistribution unrolled chain: nodes = src ∪ dst, per
    * iteration the dangling-rank sum dm is folded into every node's
    * share term as dm // n before damping (the exact recurrence of
    * PageRank.runDanglingRedistributed — all nonnegative BIGINTs,
    * where DuckDB's `//` and Spark's `div`, both truncating, agree).
    */
  private val pageRankDanglingOracle: String = {
    def iter(k: Int): String =
      s""",
         dang_$k AS (
           SELECT CAST(COALESCE(SUM(r.r), 0) AS BIGINT) AS dm
           FROM r_${k - 1} r LEFT JOIN deg d ON d.node = r.node
           WHERE d.node IS NULL),
         r_$k AS (
           SELECT no.node,
                  CAST((15 * (1000000000000 // nn.n)) // 100
                       + (85 * (COALESCE(s.s, 0) + dg.dm // nn.n)) // 100
                    AS BIGINT) AS r
           FROM nodes no CROSS JOIN nn CROSS JOIN dang_$k dg
           LEFT JOIN (SELECT e.dst AS node, SUM(r.r // g.deg) AS s
                      FROM edges e
                      JOIN r_${k - 1} r ON r.node = e.src
                      JOIN deg g ON g.node = e.src
                      GROUP BY e.dst) s ON s.node = no.node)"""
    """WITH edges AS (
           SELECT DISTINCT source AS src,
                  'snk' || CAST(doc_id % 3 AS VARCHAR) AS dst
           FROM documents),
         deg AS (
           SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
           FROM edges GROUP BY src),
         nodes AS (
           SELECT src AS node FROM edges
           UNION SELECT dst AS node FROM edges),
         nn AS (SELECT COUNT(*) AS n FROM nodes),
         r_0 AS (
           SELECT node, CAST(1000000000000 // nn.n AS BIGINT) AS r
           FROM nodes CROSS JOIN nn)""" +
      (1 to PageRankIters).map(iter).mkString +
      s"""
         SELECT node AS host, r AS rank_scaled FROM r_$PageRankIters"""
  }

  /** Unrolled HITS chain (SQL mirror of operators/Hits.run): per
    * iteration the authority sums over in-hubs, the hub sums over
    * out-authorities, each rescaled by the integer power-iteration
    * normalization x // (max // 1000 + 1) — positive BIGINTs, scalar
    * subselect divisor identical on both engines.
    */
  private val hitsOracle: String = {
    def iter(k: Int): String =
      s""",
         araw_$k AS (
           SELECT n.node, CAST(COALESCE(x.s, 0) AS BIGINT) AS s
           FROM gnodes n LEFT JOIN (
             SELECT e.dst AS node, SUM(h.s) AS s
             FROM edges e JOIN h_${k - 1} h ON h.node = e.src
             GROUP BY e.dst) x ON x.node = n.node),
         a_$k AS (
           SELECT node, CAST(s // ((SELECT MAX(s) FROM araw_$k) // 1000 + 1)
             AS BIGINT) AS s
           FROM araw_$k),
         hraw_$k AS (
           SELECT n.node, CAST(COALESCE(x.s, 0) AS BIGINT) AS s
           FROM gnodes n LEFT JOIN (
             SELECT e.src AS node, SUM(a.s) AS s
             FROM edges e JOIN a_$k a ON a.node = e.dst
             GROUP BY e.src) x ON x.node = n.node),
         h_$k AS (
           SELECT node, CAST(s // ((SELECT MAX(s) FROM hraw_$k) // 1000 + 1)
             AS BIGINT) AS s
           FROM hraw_$k)"""
    """WITH edges AS (
           SELECT DISTINCT source AS src,
                  'snk' || CAST(doc_id % 3 AS VARCHAR) AS dst
           FROM documents),
         gnodes AS (
           SELECT src AS node FROM edges
           UNION SELECT dst AS node FROM edges),
         h_0 AS (SELECT node, CAST(1000 AS BIGINT) AS s FROM gnodes)""" +
      (1 to HitsIters).map(iter).mkString +
      s"""
         SELECT n.node AS host, h.s AS hub_scaled, a.s AS auth_scaled
         FROM gnodes n
         JOIN h_$HitsIters h ON h.node = n.node
         JOIN a_$HitsIters a ON a.node = n.node"""
  }

  private val fuzzyPairsCte =
    s"""WITH w AS (SELECT DISTINCT p_name FROM part),
         pairs AS (
           SELECT a.p_name AS name_a, b.p_name AS name_b,
                  levenshtein(a.p_name, b.p_name) AS dist
           FROM w a JOIN w b ON a.p_name < b.p_name
           WHERE levenshtein(a.p_name, b.p_name) <= $FuzzyDist)"""

  val oracleSql: Map[String, String] = Map(
    // oracle = the plain all-pairs filter: the deletion blocking is a
    // Spark-side candidate generator only, so losslessness is exactly
    // what the hash compare certifies
    "q_dedup_fuzzy_join" -> (fuzzyPairsCte +
      """
         SELECT name_a, name_b, CAST(dist AS BIGINT) AS dist FROM pairs"""),

    "q_dedup_fuzzy_cluster" ->
      (fuzzyPairsCte.replace("WITH w AS", "WITH RECURSIVE w AS") +
        """,
         edges AS (SELECT name_a AS src, name_b AS dst FROM pairs
                   UNION ALL SELECT name_b AS src, name_a AS dst FROM pairs),
         reach AS (
           SELECT p_name AS node, p_name AS lbl FROM w
           UNION
           SELECT e.src AS node, r.lbl AS lbl
           FROM edges e JOIN reach r ON e.dst = r.node)
         SELECT node AS p_name, MIN(lbl) AS component,
                node = MIN(lbl) AS keep
         FROM reach GROUP BY node"""),

    "q_dedup_fuzzy_canonical" ->
      (fuzzyPairsCte.replace("WITH w AS", "WITH RECURSIVE w AS") +
        """,
         edges AS (SELECT name_a AS src, name_b AS dst FROM pairs
                   UNION ALL SELECT name_b AS src, name_a AS dst FROM pairs),
         reach AS (
           SELECT p_name AS node, p_name AS lbl FROM w
           UNION
           SELECT e.src AS node, r.lbl AS lbl
           FROM edges e JOIN reach r ON e.dst = r.node),
         comp AS (
           SELECT node AS p_name, MIN(lbl) AS canonical_name
           FROM reach GROUP BY node)
         SELECT p.p_partkey, p.p_name, c.canonical_name
         FROM part p JOIN comp c ON c.p_name = p.p_name"""),

    // oracle = the plain u<v<w three-way self-join over the same
    // canonical edge set: the Spark side's degree-ordered orientation
    // is an enumeration strategy only and must be invisible in the rows
    "q_graph_triangles" ->
      """WITH p AS (SELECT doc_id % 29 AS a, (doc_id // 29) % 29 AS b
                    FROM documents),
         e AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
               FROM p WHERE a <> b AND (a + b) % 3 = 0),
         tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
                 FROM e e1 JOIN e e2 ON e2.u = e1.v
                           JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
         pn AS (SELECT x AS n FROM tri
                UNION ALL SELECT y AS n FROM tri
                UNION ALL SELECT z AS n FROM tri),
         tc AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS tri_cnt
                FROM pn GROUP BY n),
         deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS deg
                 FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
                 GROUP BY n)
         SELECT 'h' || CAST(d.n AS VARCHAR) AS node, d.deg,
                COALESCE(t.tri_cnt, 0) AS tri_cnt,
                CAST(CASE WHEN d.deg >= 2
                     THEN (2 * COALESCE(t.tri_cnt, 0) * 1000000)
                          // (d.deg * (d.deg - 1))
                     ELSE 0 END AS BIGINT) AS lcc_ppm
         FROM deg d LEFT JOIN tc t ON t.n = d.n""",

    "q_graph_kcore" -> kcoreOracle,
    "q_graph_core_numbers" -> coreNumbersOracle,
    "q_graph_core_gate" -> coreGateOracle,
    "q_graph_lpa_modularity" -> lpaModularityOracle,
    "q_graph_lpa_refined" -> lpaRefinedOracle,
    "q_graph_louvain" -> louvainOracle,
    "q_graph_louvain_phases" -> louvainPhasesOracle,

    "q_graph_lpa" -> lpaOracle,

    // the plain u<v<w triangle count over the SOURCE graph + the gate
    // join — the Spark side's memoized artifact and degree orientation
    // must both be invisible in the rows
    "q_graph_linkfarm_gate" ->
      s"""WITH p AS (SELECT doc_id % 20 AS a, (doc_id // 20) % 20 AS b
                     FROM documents),
         e AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
               FROM p WHERE a <> b AND (a + b) % 3 = 0),
         tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
                 FROM e e1 JOIN e e2 ON e2.u = e1.v
                           JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
         pn AS (SELECT x AS n FROM tri
                UNION ALL SELECT y AS n FROM tri
                UNION ALL SELECT z AS n FROM tri),
         tc AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS tri_cnt
                FROM pn GROUP BY n),
         dg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS deg
                FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
                GROUP BY n),
         cnts AS (
           SELECT 'src' || CAST(d.n AS VARCHAR) AS source, d.deg,
                  CAST(CASE WHEN d.deg >= 2
                       THEN (2 * COALESCE(t.tri_cnt, 0) * 1000000)
                            // (d.deg * (d.deg - 1))
                       ELSE 0 END AS BIGINT) AS lcc_ppm
           FROM dg d LEFT JOIN tc t ON t.n = d.n)
         SELECT doc.doc_id, doc.source AS host, c.deg, c.lcc_ppm,
                c.lcc_ppm IS NOT NULL AS known_host,
                COALESCE(c.deg >= $LinkFarmMinDeg
                         AND c.lcc_ppm >= $LinkFarmMinLccPpm, FALSE)
                  AS flagged
         FROM documents doc LEFT JOIN cnts c ON c.source = doc.source""",

    "q_graph_pagerank" -> pageRankOracle,
    "q_graph_pagerank_weighted" -> pageRankWeightedOracle,
    "q_graph_pagerank_personalized" -> pageRankPersonalizedOracle,
    "q_graph_pagerank_dangling" -> pageRankDanglingOracle,
    "q_graph_hits" -> hitsOracle,

    // the rank chain + one document join; keep mirrors the Spark
    // left-join + coalesce shape (all hosts are known on this fixture,
    // which the known_host column itself certifies through the hash)
    "q_graph_host_gate" -> (pageRankOracle
      .replace(s"""
         SELECT node AS host, r AS rank_scaled FROM r_$PageRankIters""",
        s"""
         SELECT d.doc_id, d.source AS host, r.r AS host_rank,
                r.r IS NOT NULL AS known_host,
                COALESCE(r.r > $HostRankKeep, FALSE) AS keep
         FROM documents d LEFT JOIN r_$PageRankIters r
           ON r.node = d.source""")),

    // oracle = the plain all-pairs threshold join over the same two
    // distinct key frames + the identical ROW_NUMBER best pick — the
    // Spark side's variant-index blocking must be invisible in the rows
    "q_dedup_fuzzy_incremental" ->
      s"""WITH master AS (
           SELECT DISTINCT p_name AS name_master FROM part
           WHERE p_partkey % 10 <> 0),
         batch AS (
           SELECT DISTINCT substring(p_name, 2) AS name_new FROM part
           WHERE p_partkey % 10 = 0),
         cand AS (
           SELECT b.name_new, m.name_master,
                  levenshtein(b.name_new, m.name_master) AS dist
           FROM batch b JOIN master m
             ON levenshtein(b.name_new, m.name_master) <= $IncrFuzzyDist),
         best AS (
           SELECT name_new, name_master, CAST(dist AS BIGINT) AS dist
           FROM (SELECT name_new, name_master, dist,
                        ROW_NUMBER() OVER (PARTITION BY name_new
                          ORDER BY dist, name_master) AS rn
                 FROM cand) WHERE rn = 1)
         SELECT b.name_new, best.name_master AS matched_master, best.dist,
                best.name_master IS NOT NULL AS matched
         FROM batch b LEFT JOIN best ON best.name_new = b.name_new""",

    "q_text_fuzzy_distance" ->
      """SELECT p_partkey,
                CAST(damerau_levenshtein(p_name, reverse(p_name)) AS BIGINT)
                  AS dl_rev,
                CAST(levenshtein(p_name, reverse(p_name)) AS BIGINT)
                  AS lev_rev
         FROM part""")
}
