package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the properties PLANS.md documents are
  * asserted here so a code change that silently reintroduces a shuffle,
  * loses pushdown, or drops a group-limit rewrite fails the build
  * instead of surfacing as a 100 TB incident. String checks run against
  * the formatted physical plan (pre-execution, AQE initial plan).
  */
class PlanRegressionSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(FormattedMode)
  }

  // Formatted-mode node headers: "(9) Exchange" is a shuffle exchange;
  // broadcast exchanges print as "(n) BroadcastExchange" and don't match.
  private def shuffles(p: String): Int =
    """\(\d+\) Exchange\b""".r.findAllIn(p).length

  test("q_scan_pruned pushes filters and prunes columns at the scan") {
    val p = plan("q_scan_pruned")
    assert(p.contains("PushedFilters"), "no pushed filters block")
    assert(p.contains("GreaterThan(l_quantity,45.0)"), "quantity filter not pushed")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "date filter not pushed")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(read.split(",").length <= 4, s"scan reads too many columns: $read")
  }

  test("q_dedup_simhash is map-only (no shuffle at all)") {
    assert(shuffles(plan("q_dedup_simhash")) === 0)
  }

  test("q_text_fuzzy_distance is map-only (no shuffle at all)") {
    assert(shuffles(plan("q_text_fuzzy_distance")) === 0)
  }

  test("q_dedup_fuzzy_join: blocking join + guard aggs, bounded shuffles") {
    // per side: one count-distinct guard agg on the variant hash (2
    // static exchanges each under partial/final split) + the candidate
    // distinct; the __vh equi-joins broadcast at test SFs and
    // hash-partition on the already-exchanged 8-byte key at scale —
    // never more than the 6 static exchanges measured at registration
    assert(shuffles(plan("q_dedup_fuzzy_join")) <= 6)
  }

  test("q_dedup_fuzzy_incremental probes the persisted index, bounded shuffles") {
    val p = plan("q_dedup_fuzzy_incremental")
    // the master side must come from the memoized (persisted) variant
    // index — an InMemoryTableScan leaf — not a re-blocked parquet scan
    assert(p.contains("InMemoryTableScan"),
      "master variant index not served from the persisted memo")
    // probe explode is map-side; candidate distinct + the bounded
    // per-key window + the joins account for the static exchanges.
    // The bound is the WORST-case pick (every equi-join demoted to
    // shuffle): broadcast-vs-shuffle choices flip with the memo's
    // materialization state (suite order decides what this test sees),
    // so only the all-shuffle ceiling is deterministic
    assert(shuffles(p) <= 6)
  }

  test("q_graph_pagerank's returned frame reads the checkpointed fixpoint") {
    // the iteration loop materializes per round via localCheckpoint
    // (flat lineage — the scale contract), so the registered frame's
    // own plan is a zero-exchange scan over the final rank frame
    assert(shuffles(plan("q_graph_pagerank")) === 0)
  }

  test("r16 iterative graph rows read checkpointed fixpoints") {
    // dangling-redistribution PageRank: the loop materializes per round
    // (localCheckpoint), so the registered frame is a zero-exchange read
    assert(shuffles(plan("q_graph_pagerank_dangling")) === 0)
    // mutual-kNN clusters: the kNN candidates + reciprocal filter feed
    // the EAGER star-contraction; the visible frame re-attaches the
    // converged labels onto the node spine — label/spine-sized (|V|)
    // exchanges only, never candidate- or corpus-sized
    assert(shuffles(plan("q_dedup_knn_mutual")) <= 4,
      plan("q_dedup_knn_mutual").take(2000))
    // HITS: both score frames are checkpointed; the visible plan only
    // re-attaches hub and auth onto the node spine — |V|-sized joins,
    // never an edge- or corpus-sized exchange
    assert(shuffles(plan("q_graph_hits")) <= 6, plan("q_graph_hits"))
  }

  test("r17 graph rows: triangles checkpointed; kcore reads the fixpoint") {
    // Triangles.localCounts returns an eager localCheckpoint (the
    // orientation + wedge join already ran, skew-bounded by the
    // degree order), so the registered frame is a zero-exchange scan
    assert(shuffles(plan("q_graph_triangles")) === 0)
    // KCore.peel ditto: the peel loop materialized per round
    assert(shuffles(plan("q_graph_kcore")) === 0)
  }

  test("q_events_gapfill: bounded grid, broadcast bounds, one event shuffle") {
    // allowed exchanges: the (type, hour) aggregate over the events
    // (the ONLY event-sized shuffle), the distinct-type aggregate, and
    // the grid-sized exchanges for the left join + forward-fill window
    // (|types| x |hours| rows); the 1-row bounds frame must broadcast
    val p = plan("q_events_gapfill")
    assert(shuffles(p) <= 6, p.take(2000))
    assert(p.contains("BroadcastExchange"),
      "the 1-row hour-bounds frame must broadcast into the grid build")
  }

  test("q_sim_ann_sq: memoized coded corpus, broadcast probes, one rank pass") {
    // the SQ8 coding (stats aggregate + re-assembly shuffle) is a
    // memoized eager checkpoint, so the visible plan is the search
    // only: the probe sample ships as a broadcast and the sole
    // exchanges are the per-query rank window's — never corpus-keyed
    val p = plan("q_sim_ann_sq")
    assert(shuffles(p) <= 2, p.take(2000))
    assert(p.contains("BroadcastExchange"), "probe sample must broadcast")
  }

  test("q_sim_knn_graph: bounded candidate shuffles, broadcast centroids") {
    // allowed exchanges: the all-vector assignment aggregate, the probe
    // rank window, the candidate join, the two rerank vector joins and
    // the final per-doc rank window — every one keyed on vec/doc ids
    // (candidate-proportional), none corpus-squared; the centroid side
    // must ship as a broadcast
    val p = plan("q_sim_knn_graph")
    assert(shuffles(p) <= 9, p.take(2000))
    assert(p.contains("BroadcastExchange"), "centroids must broadcast")
  }

  test("q_dedup_semantic_incremental probes persisted artifacts, batch-scaled") {
    // corpus training/assignment are memoized eager checkpoints, so the
    // visible plan is the BATCH probe only: the broadcast-centroid
    // crossJoin, the probe-rank window, the candidate joins and the
    // best-pick aggregate — all batch- or candidate-keyed exchanges,
    // never a corpus re-train
    val p = plan("q_dedup_semantic_incremental")
    assert(shuffles(p) <= 8, p.take(2000))
    assert(p.contains("BroadcastExchange"), "centroids must broadcast")
  }

  test("q_pack_bestfit pays no single-partition pass over the docs") {
    // the only global window walks the <= B-row class table (bounded
    // by construction); doc-stream windows partition by (class, shard)
    // and by bin; offset tables come back as broadcasts
    val p = plan("q_pack_bestfit")
    assert(shuffles(p) <= 7, p.take(2000))
    assert(p.contains("BroadcastExchange"), "offset joins must broadcast")
  }

  test("q_text_winnow is map-only (no shuffle at all)") {
    assert(shuffles(plan("q_text_winnow")) === 0)
  }

  test("q_dedup_minhash_lsh shuffles only band group-by + pair distinct") {
    // bucketed LshBandJoin (r13 bounded form): the band-key group-by
    // exchange feeds TWO consumers (pair enumeration + the saturated-
    // bucket list) — identical subtrees, so AQE reuses one shuffle at
    // runtime even though the static plan prints both — plus the
    // cross-band pair distinct and the (unhinted) hot-star join's two
    // static sides, which AQE erases at runtime on any healthy corpus
    // via empty-relation propagation (no bucket saturates at test SFs,
    // AdaptiveExec-asserted below by the <= bound staying tight after
    // execution elsewhere): <= 5 static exchanges, and the one
    // corpus-side band scan is shared.
    val p = plan("q_dedup_minhash_lsh")
    assert(shuffles(p) <= 5, p.take(1500))
  }

  test("q_dedup_ngram_jaccard needs at most two shuffles") {
    assert(shuffles(plan("q_dedup_ngram_jaccard")) <= 2)
  }

  test("q_text_source_overlap is join-free: one fingerprint-scale shuffle") {
    // r12 ran distinct + a fingerprint self-join (three fingerprint-set
    // shuffles, 49.6x at 10x data). The r13 plan is groupBy(fp) +
    // in-codegen pair explode: NO join node anywhere. Exchanges: the
    // fingerprint group-by rides an EXPLICIT-count repartition(fp) (r20:
    // AQE's byte-sized coalescing folded the CPU-dense orderedPairs
    // explode onto one task — the explicit count pins the parallelism
    // without adding an exchange, since the group-by reuses it), the
    // tiny sources^2 pair-count group-by, plus — at THIS test's tiny
    // SF only — the size-gated read spread (Tables.spreadBySize; dead
    // branch at production sizes).
    val p = plan("q_text_source_overlap")
    assert(!p.contains("Join"), "source-overlap reintroduced a join")
    assert(shuffles(p) === 3, p.take(1200))
  }

  test("q_events_sessionize pays exactly one shuffle of the event table") {
    assert(shuffles(plan("q_events_sessionize")) === 1)
  }

  test("top-k windows rewrite to WindowGroupLimit (no global sort)") {
    assert(plan("q_window_topk_per_group").contains("WindowGroupLimit"))
    assert(plan("q_sim_cosine_topk").contains("WindowGroupLimit"))
  }

  test("dimension enrich joins broadcast the dimension side") {
    val p = plan("q_join_enrich")
    assert(p.contains("BroadcastHashJoin"), "dim join not broadcast")
    assert(shuffles(p) === 0, "dim enrich should not shuffle the fact side")
  }

  test("group-bys keep the partial/final aggregate pair") {
    val p = plan("q_agg_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "partial aggregation (map-side combine) missing")
  }

  test("q_split_train_test and q_text_repetition are map-only") {
    assert(shuffles(plan("q_split_train_test")) === 0)
    assert(shuffles(plan("q_text_repetition")) === 0)
  }

  test("q_pack_sequences pays no single-partition pass over the docs") {
    // allowed shuffles: group-by for shard totals, the tiny offsets
    // window (#shards rows), and the per-shard doc window; the offsets
    // table must come back as a broadcast, never a shuffled join
    val p = plan("q_pack_sequences")
    assert(shuffles(p) <= 3, p)
    assert(p.contains("BroadcastExchange"), "offsets join must broadcast")
  }

  test("dim surrogate keys never ride a single-partition pass over the dim") {
    import org.apache.spark.sql.functions._
    // a 200k-row synthetic dim in the silver shapes dimCustomers takes
    val n = 200000L
    val cust = spark.range(n).select(
      (col("id") + 10000).as("cst_id"),
      concat(lit("AW"), col("id")).as("cst_key"),
      lit("f").as("cst_firstname"), lit("l").as("cst_lastname"),
      lit("Unknown").as("cst_gndr"), lit("Single").as("cst_marital_status"),
      current_date().as("cst_create_date"), lit("B1").as("dwh_batch_id"))
    val ca = spark.range(0).select(col("id").cast("string").as("cid"),
      lit("M").as("gen"), current_date().as("bdate"),
      lit("B1").as("dwh_batch_id"))
    val la = spark.range(0).select(col("id").cast("string").as("cid"),
      lit("US").as("cntry"), lit("B1").as("dwh_batch_id"))
    val dim = graft.pipeline.GoldIntegration.dimCustomers(cust, ca, la)
    val p = dim.queryExecution.explainString(FormattedMode)
    // the dim-row ROW_NUMBER window must be partitioned by the key
    // bucket (shuffled by hashpartitioning, not gathered to 1), and the
    // offsets come back as a broadcast; the only single-partition stage
    // is the tiny bucket-count window
    assert(p.contains("hashpartitioning(__sk_bucket"), p.take(2000))
    assert(p.contains("BroadcastExchange"), "offsets must broadcast")
    assert("Exchange SinglePartition".r.findAllIn(p).length <= 1,
      "more than the bucket-count single-partition stage:\n" + p.take(2000))

    // and the two-phase keys are exactly the global ROW_NUMBER contract:
    // a contiguous 1..n sequence that increases with the order key
    val sample = dim.select(col("customer_key"), col("customer_id"))
      .orderBy(col("customer_id")).limit(5).collect()
    assert(sample.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(dim.agg(count(lit(1)), min(col("customer_key")),
      max(col("customer_key"))).head() match {
      case r => r.getLong(0) === n && r.getLong(1) === 1L && r.getLong(2) === n
    })
  }

  test("q_agg_approx_distinct stays split — no Expand through the HLL") {
    // The mixed distinct+HLL single aggregate plans an Expand that
    // duplicates every row through the imperative HLL update (measured
    // 2x slower); the split-and-join form must not regress back.
    val p = plan("q_agg_approx_distinct")
    assert(!p.contains("Expand"), "mixed distinct+HLL aggregate reintroduced")
  }

  test("q_join_asof fills via one window pass, never a join explosion") {
    val p = plan("q_join_asof")
    // two shuffles total: the quote-dedup aggregate + the key-partitioned
    // fill window; the as-of itself must not plan as any JOIN node
    assert(shuffles(p) <= 2, p.take(2000))
    assert(!p.contains("Join"), "as-of degenerated to a join:\n" + p.take(2000))
    assert(p.contains("Window"), "fill window missing")
  }

  test("q_join_asof_epoch spreads the fill over (key, epoch) partitions") {
    val p = plan("q_join_asof_epoch")
    // the local fill must shuffle on (user_id, __epoch) — the hot-key
    // spread — and the carry/local recombination must be an equi join
    assert(p.contains("hashpartitioning(user_id#") && p.contains("__epoch"),
      p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q_join_range_binned joins equi on (key, bin) with range residual") {
    val p = plan("q_join_range_binned")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join degenerated to nested-loop:\n" + p.take(2000))
    // the bin key must be part of the join keys (equi side), visible as
    // the explode-generated candidate bin column
    assert(p.contains("__cbin"), "candidate-bin equi key missing")
  }

  test("q_text_decontaminate_bloom prefilters map-side (no bench broadcast of rows)") {
    val p = plan("q_text_decontaminate_bloom")
    assert(p.contains("might_contain"), "bloom prefilter missing from plan")
  }
}
