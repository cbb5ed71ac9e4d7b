package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the SemDeDup-style semantic dedup: the
  * greedy min-id keep rule, cluster-local dropping, and a fixture that
  * exercises both verdicts (the oracle hash-match covers value
  * equality; these are the properties a reader should be able to rely
  * on without re-deriving the query).
  */
class SemanticDedupSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.01"
  private lazy val out =
    SparkEntry.queries("q_dedup_semantic")(spark, dir).cache()

  test("both verdicts present and drop rate below half") {
    val n = out.count()
    val dropped = out.where(!col("keep")).count()
    assert(dropped > 0L, "no drops — epsilon vacuously small")
    assert(dropped * 2 < n, s"$dropped of $n dropped — epsilon too hot")
  }

  test("the smallest id of every cluster is always kept") {
    // greedy min-id representative: nothing precedes the cluster
    // minimum, so it can never be dropped
    val minPerCluster = out.groupBy("cent_id")
      .agg(min(col("vec_id")).as("vec_id"))
    val bad = out.join(minPerCluster, Seq("cent_id", "vec_id"))
      .where(!col("keep"))
    assert(bad.count() === 0L)
  }

  test("every vector gets exactly one cluster and one verdict") {
    assert(out.count() === out.select("vec_id").distinct().count())
    assert(out.where(col("cent_id").isNull || col("keep").isNull)
      .count() === 0L)
  }

  test("giant-cluster guard: red on a seeded giant cluster, green under cap") {
    import spark.implicits._
    // one healthy cluster of 3 + one degenerate cluster of 10 vectors
    val assign = ((0L until 3L).map(i => (i, 1L)) ++
      (100L until 110L).map(i => (i, 2L))).toDF("vec_id", "cent_id")
    val ex = intercept[IllegalStateException] {
      graft.queries.SimQueries.requireBoundedClusters(assign, cap = 5L)
    }
    assert(ex.getMessage.contains("cluster 2"), ex.getMessage)
    assert(ex.getMessage.contains("10 vectors"), ex.getMessage)
    // the same frame passes untouched once clusters fit the cap
    val ok = graft.queries.SimQueries.requireBoundedClusters(assign, cap = 10L)
    assert(ok.count() === 13L)
  }

  test("the registered query passes the default guard on the fixture") {
    // the fixture's trained clusters sit far below SemanticMaxCluster;
    // a regression that collapses assignment into one cluster would
    // turn this (and the oracle row) red loudly instead of quadratic
    assert(out.count() > 0L)
  }

  test("probe-count eval: monotone in nprobe, bounded by exact truth") {
    // the A/B row's structural invariants, independent of the oracle's
    // value equality: widening the probe window can only FIND MORE
    // (minrk semantics), and the probe path exact-confirms so it can
    // never exceed the brute-force truth; a vacuous fixture (no true
    // near-dups) would make every recall meaningless
    val rows = SparkEntry.queries("q_dedup_semantic_incr_probe_eval")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 3L, 5L))
    val nTrue = rows.head._2
    assert(nTrue > 0L, "fixture has no true near-dups — vacuous eval")
    assert(rows.forall(_._2 == nTrue), "truth must not vary with nprobe")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3, s"found count fell when widening: $a -> $b") }
    rows.foreach { case (_, t, f, rec) =>
      assert(f <= t, "probe path found a dup truth doesn't know")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(rec === f.toDouble / t)
    }
  }
}
