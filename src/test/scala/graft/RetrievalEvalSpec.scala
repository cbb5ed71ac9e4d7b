package graft

import graft.queries.TextQueries
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

  test("every query doc gets a verdict row, and the sample size is fixed") {
    // the protocol takes the 256 smallest-hash docs as queries; the
    // output must cover exactly that set, misses included. A fixed |Q|
    // (never a %-of-corpus set) is what keeps the row linear in the
    // corpus — this assertion pins it.
    assert(out.count() === TextQueries.RetrievalQuerySample.toLong)
  }

  test("query-side frames broadcast (bounded by the fixed sample)") {
    // with |Q| pinned at 256, every query-side frame (qids, qterms,
    // dfT, rel) is bounded by |Q| x the 8-token slice regardless of
    // corpus size, so the plan must broadcast them — a shuffle join on
    // a few-KB frame would add corpus-sized exchanges for nothing
    val df = SparkEntry.queries("q_text_retrieval_eval")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"),
      "query-side frames should broadcast-join the corpus")
  }
}
