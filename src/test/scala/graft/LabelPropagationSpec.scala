package graft

import graft.operators.LabelPropagation
import org.scalatest.funsuite.AnyFunSuite

/** Synchronous LPA against an in-memory twin of the pinned update rule
  * (most frequent neighbor label, ties to the smallest, simultaneous
  * update), plus the community-vs-component distinction that justifies
  * the operator and the guard contracts.
  */
class LabelPropagationSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def reference(edges: Seq[(String, String)],
                        rounds: Int): Map[String, String] = {
    val simple = edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap).distinct
    val adj = simple.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = adj.map { case (n, nbrs) =>
        val votes = nbrs.groupBy(labels).view.mapValues(_.size)
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  private def run(edges: Seq[(String, String)],
                  rounds: Int): Map[String, String] =
    LabelPropagation.run(spark, edges.toDF("src", "dst"), rounds)
      .as[(String, String)].collect().toMap

  test("matches the twin round by round on two cliques with a bridge") {
    // two 4-cliques joined by one bridge edge: ONE component, TWO
    // communities — the signal components cannot give
    def clique(ns: Seq[String]) =
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = clique(Seq("a1", "a2", "a3", "a4")) ++
      clique(Seq("b1", "b2", "b3", "b4")) :+ ("a4", "b1")
    for (r <- Seq(1, 2, 4)) {
      assert(run(edges, r) === reference(edges, r), s"rounds=$r")
    }
    val got = run(edges, 4)
    assert(got.values.toSet.size === 2, "two communities, one component")
    assert(Seq("a1", "a2", "a3", "a4").map(got).toSet.size === 1,
      "the a-clique agrees on one label")
    assert(Seq("b2", "b3", "b4").map(got).toSet.size === 1,
      "the b-clique agrees on one label")
  }

  test("matches the twin on a pseudo-random graph") {
    val edges = (0 until 180).map { i =>
      (s"n${i * 13 % 21}", s"n${(i * i + 7) % 21}")
    }.filter(e => e._1 != e._2)
    for (r <- Seq(1, 3)) {
      assert(run(edges, r) === reference(edges, r), s"rounds=$r")
    }
  }

  test("empty and null-endpoint feeds fail loudly") {
    val e1 = intercept[IllegalArgumentException] {
      LabelPropagation.run(spark,
        Seq.empty[(String, String)].toDF("src", "dst"), 2)
    }
    assert(e1.getMessage.contains("empty"))
    val withNull = Seq(("a", "b")).toDF("src", "dst")
      .unionAll(Seq(("a", null: String)).toDF("src", "dst"))
    val e2 = intercept[IllegalArgumentException] {
      LabelPropagation.run(spark, withNull, 2)
    }
    assert(e2.getMessage.contains("NULL"))
  }

  test("registered fixture resolves the three residue communities") {
    val out = graft.queries.GraphQueries
      .queries("q_graph_lpa")(spark, "/root/testdata/sf0.001")
      .as[(String, String)].collect()
    val sizes = out.groupBy(_._2).view.mapValues(_.length).values.toSeq
    assert(sizes.sorted === Seq(9, 10, 10),
      s"expected the residue-class communities, got $sizes")
  }
}
