package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Min-label propagation: the transitive-closure dedup the greedy
  * keep-first policy cannot express (a~b~c merges even when a~c was
  * never a candidate pair), plus convergence on cycles and isolated
  * nodes keeping their own label.
  */
class ConnectedComponentsSpec extends AnyFunSuite with SparkTestBase {

  private def components(nodeIds: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val nodes = nodeIds.toDF("node")
    val edges = pairs.toDF("src", "dst")
      .unionAll(pairs.map(_.swap).toDF("src", "dst"))
    ConnectedComponents.minLabel(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain merges transitively past pairwise candidates") {
    // 1-2, 2-3, 3-4: keep-first on pairs alone would give 3 the label 2.
    val got = components(Seq(1L, 2L, 3L, 4L, 9L), Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 9L))
  }

  test("cycle converges and two components stay separate") {
    val got = components(Seq(1L, 2L, 3L, 5L, 6L),
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (5L, 6L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("empty candidate graph: every node is its own component") {
    // the common production case — a clean corpus with zero near-dup
    // candidate pairs must not crash or drop nodes
    val got = components(Seq(1L, 2L, 3L), Seq.empty)
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  private def starComponents(nodeIds: Seq[Long], pairs: Seq[(Long, Long)],
                             maxIters: Int = 30): Map[Long, Long] = {
    import spark.implicits._
    val nodes = nodeIds.toDF("node")
    val edges = pairs.toDF("src", "dst")
      .unionAll(pairs.map(_.swap).toDF("src", "dst"))
    ConnectedComponents.largeSmallStar(nodes, edges, maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("large-star/small-star: diameter-120 chain that min-label's cap rejects") {
    // a 121-node path needs ~120 min-label rounds — the default cap (50)
    // must reject it loudly...
    val nodes = (0L to 120L)
    val pairs = (0L until 120L).map(i => (i, i + 1))
    import spark.implicits._
    val edges = pairs.toDF("src", "dst")
      .unionAll(pairs.map(_.swap).toDF("src", "dst"))
    val e = intercept[IllegalStateException] {
      ConnectedComponents.minLabel(nodes.toDF("node"), edges).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // ...while star contraction converges in O(log n) rounds: 15 rounds
    // is far above log2(121)≈7 with slack, and far below the diameter
    val got = starComponents(nodes, pairs, maxIters = 15)
    assert(got === nodes.map(_ -> 0L).toMap)
  }

  test("large-star/small-star matches min-label on mixed graphs") {
    // cliques, chains, a cycle, isolated nodes, and non-minimal ids
    val nodeIds = Seq(1L, 2L, 3L, 4L, 9L, 5L, 6L, 42L, 17L, 8L, 30L, 31L, 32L)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 5L),
      (42L, 17L), (17L, 8L), (30L, 31L), (31L, 32L), (32L, 30L))
    assert(starComponents(nodeIds, pairs) === components(nodeIds, pairs))
  }

  test("large-star/small-star: empty graph and self-loops") {
    assert(starComponents(Seq(1L, 2L, 3L), Seq.empty)
      === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(starComponents(Seq(1L, 2L), Seq((1L, 1L), (2L, 2L), (1L, 2L)))
      === Map(1L -> 1L, 2L -> 1L))
  }

  test("hitting the round cap fails loudly instead of returning wrong labels") {
    // Path 0-1-...-5 with 2 rounds: labels move at most 2 hops of
    // minimum, so convergence is impossible — must throw, not emit
    // intermediate components.
    val nodes = (0L to 5L)
    val pairs = (0L until 5L).map(i => (i, i + 1))
    import spark.implicits._
    val edges = pairs.toDF("src", "dst")
      .unionAll(pairs.map(_.swap).toDF("src", "dst"))
    val e = intercept[IllegalStateException] {
      ConnectedComponents.minLabel(nodes.toDF("node"), edges, maxIters = 2)
        .collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
