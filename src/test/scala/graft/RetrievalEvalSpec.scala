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
}
