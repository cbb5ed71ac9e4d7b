package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of hard-negative mining: the per-probe budget,
  * score agreement with the exact top-k baseline it filters, and a
  * fixture where the near-dup exclusion demonstrably bites (the oracle
  * hash-match covers value equality; these are the properties a reader
  * should be able to rely on without re-deriving the query).
  */
class HardNegativesSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.01"
  private lazy val out =
    SparkEntry.queries("q_sim_hard_negatives")(spark, dir).cache()
  // the exact brute-force baseline the miner filters (rnk <= 10)
  private lazy val topk =
    SparkEntry.queries("q_sim_cosine_topk")(spark, dir).cache()

  test("exactly five dense-ranked negatives per probe") {
    val per = out.groupBy("q_id")
      .agg(count(lit(1)).as("n"), max("rnk").as("mx"),
        countDistinct("rnk").as("d"))
    assert(per.where(col("n") =!= 5 || col("mx") =!= 5 || col("d") =!= 5)
      .count() === 0L)
    assert(out.where(col("q_id") % 50 =!= 0).count() === 0L,
      "a non-probe q_id appeared")
  }

  test("cosines agree with the exact top-k baseline on shared pairs") {
    val mism = out.join(
        topk.select(col("q_id"), col("vec_id"), col("cosine").as("tc")),
        Seq("q_id", "vec_id"))
      .where(col("cosine") =!= col("tc"))
    assert(mism.count() === 0L,
      "hard-negative cosine drifted from the shared exact baseline")
  }

  test("the near-dup exclusion bites, and only on high-cosine pairs") {
    // pairs in the unfiltered exact top-5 but absent from the mined
    // negatives were excluded as near-dups; the exclusion predicate is
    // (LSH candidate AND cosine >= 0.25), so every excluded pair must
    // carry cosine >= 0.25 — and on this fixture at least one exists
    // (probes with a near-duplicate inside their raw top-5).
    val excluded = topk.where(col("rnk") <= 5)
      .join(out.select(col("q_id"), col("vec_id"), lit(1).as("__hn")),
        Seq("q_id", "vec_id"), "left")
      .where(col("__hn").isNull)
    assert(excluded.count() > 0L,
      "exclusion vacuous — no near-dup cracked any probe's raw top-5")
    assert(excluded.where(col("cosine") < 0.25).count() === 0L,
      "a pair below the near-dup cosine floor was excluded")
  }
}
