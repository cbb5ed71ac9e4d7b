package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Internal-consistency and non-vacuity checks for the self-retrieval
  * evaluation: the derived metrics must agree with the rank they were
  * derived from, and the fixture must exercise both tails (instant
  * hits and deep misses) so the metric isn't trivially saturated.
  */
class RetrievalEvalSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.01"
  private lazy val out =
    SparkEntry.queries("q_text_retrieval_eval")(spark, dir).cache()

  test("derived metrics agree with the rank") {
    val bad = out.where(col("rank_of_relevant").isNotNull &&
      (col("hit_at_10") =!= (col("rank_of_relevant") <= 10) ||
        col("rr_micro") =!=
          floor(lit(1000000L) / col("rank_of_relevant")).cast("long")))
    assert(bad.count() === 0L)
    // a query with no rank (source doc under 5 tokens → empty term set)
    // must read as a miss, not a null metric
    val nullBad = out.where(col("rank_of_relevant").isNull &&
      (col("rr_micro") =!= 0L || col("hit_at_10") =!= false))
    assert(nullBad.count() === 0L)
  }

  test("fixture exercises both tails (non-vacuous metric)") {
    assert(out.where(col("rank_of_relevant") === 1L).count() > 0L,
      "no rank-1 self-retrieval — scoring is broken or fixture trivial")
    assert(out.where(col("rank_of_relevant") > 10L).count() > 0L,
      "every query hits @10 — metric saturated, fixture too easy")
  }

  test("every query doc gets a verdict row") {
    // the md5 gate selects ~10% of 500 docs; the output must cover
    // exactly that set, misses included
    val n = out.count()
    assert(n > 30L && n < 80L, s"query-set size $n outside expected band")
  }

  test("shipAuto: broadcast under the budget, shuffle join above it") {
    // the query-side frames (qterms, dfT, rel) scale with the query set
    // (10% of the corpus) — an unconditional broadcast() hint would
    // override the session threshold and stall the driver at 100x data.
    // shipAuto must keep the broadcast plan under the default budget
    // (the shape the PLANS.md pin expects) and fall back to shuffle
    // joins when the estimate exceeds it; rows must be identical.
    val small = "/root/testdata/sf0.001"
    def physPlan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.get(1)),
        r.getLong(2), r.getBoolean(3))).toSet

    // default 10 MB budget: every equi-join side fits -> broadcast hash
    val hinted = SparkEntry.queries("q_text_retrieval_eval")(spark, small)
    assert(physPlan(hinted).contains("BroadcastHashJoin"),
      "under the budget the query-side frames should broadcast")
    val expected = rows(hinted)

    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // below any frame's estimate: ALL equi-joins must demote (the
      // 1-row corpus stats crossJoin legitimately stays a broadcast
      // nested-loop — it is aggregate-reduced, not corpus-scaling)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
      val demoted = SparkEntry.queries("q_text_retrieval_eval")(spark, small)
      assert(!physPlan(demoted).contains("BroadcastHashJoin"),
        "shipAuto kept a broadcast hint past the budget")
      assert(rows(demoted) === expected, "fallback changed the metrics")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
