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

  test("q_text_winnow is map-only (no shuffle at all)") {
    assert(shuffles(plan("q_text_winnow")) === 0)
  }

  test("q_dedup_minhash_lsh shuffles only for the candidate distinct") {
    assert(shuffles(plan("q_dedup_minhash_lsh")) <= 1)
  }

  test("q_dedup_ngram_jaccard needs at most two shuffles") {
    assert(shuffles(plan("q_dedup_ngram_jaccard")) <= 2)
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

  test("q_agg_approx_distinct stays split — no Expand through the HLL") {
    // The mixed distinct+HLL single aggregate plans an Expand that
    // duplicates every row through the imperative HLL update (measured
    // 2x slower); the split-and-join form must not regress back.
    val p = plan("q_agg_approx_distinct")
    assert(!p.contains("Expand"), "mixed distinct+HLL aggregate reintroduced")
  }
}
