package graft

import graft.operators.Triangles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Triangle counting against an in-memory brute-force twin, plus the
  * input-tolerance and guard contracts. The brute force enumerates all
  * u<v<w vertex triples of the canonical simple graph — the same shape
  * the DuckDB oracle uses — so the degree-ordered orientation must be
  * invisible in the rows.
  */
class TrianglesSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def reference(edges: Seq[(String, String)])
  : Map[String, (Long, Long, Long)] = {
    val simple = edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap).distinct
    val adj = simple.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    val tris = for {
      u <- nodes; v <- nodes if u < v && adj(u)(v)
      w <- nodes if v < w && adj(u)(w) && adj(v)(w)
    } yield (u, v, w)
    nodes.map { n =>
      val deg = adj(n).size.toLong
      val t = tris.count(x => x._1 == n || x._2 == n || x._3 == n).toLong
      val lcc = if (deg >= 2) 2L * t * 1000000L / (deg * (deg - 1)) else 0L
      n -> ((deg, t, lcc))
    }.toMap
  }

  private def run(edges: Seq[(String, String)])
  : Map[String, (Long, Long, Long)] =
    Triangles.localCounts(spark, edges.toDF("src", "dst"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("matches the brute-force twin on a mixed-shape graph") {
    // a 4-clique (4 triangles), a pendant (deg 1, lcc 0), a square
    // (deg 2 each, 0 triangles), and a bridge joining the shapes
    val clique = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b
    } yield (a, b)
    val edges = clique ++ Seq(("d", "p"),
      ("w", "x"), ("x", "y"), ("y", "z"), ("z", "w"), ("a", "w"))
    assert(run(edges) === reference(edges))
    val got = run(edges)
    assert(got("b") === ((3L, 3L, 1000000L)), "clique-interior node")
    assert(got("p") === ((1L, 0L, 0L)), "pendant")
    assert(got("x") === ((2L, 0L, 0L)), "square node: wedges, no closure")
  }

  test("direction, multi-edges and self-loops are canonicalized away") {
    val base = Seq(("a", "b"), ("b", "c"), ("a", "c"))
    val noisy = base ++ base.map(_.swap) ++ base ++ Seq(("a", "a"))
    assert(run(noisy) === run(base))
  }

  test("matches the twin on a pseudo-random graph") {
    val edges = (0 until 200).map { i =>
      (s"n${i * 7 % 23}", s"n${(i * i + 3) % 23}")
    }.filter(e => e._1 != e._2)
    assert(run(edges) === reference(edges))
  }

  test("empty and null-endpoint feeds fail loudly") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    val e1 = intercept[IllegalArgumentException] {
      Triangles.localCounts(spark, empty)
    }
    assert(e1.getMessage.contains("empty"))
    val withNull = Seq(("a", "b")).toDF("src", "dst")
      .unionAll(Seq(("a", null: String)).toDF("src", "dst"))
    val e2 = intercept[IllegalArgumentException] {
      Triangles.localCounts(spark, withNull)
    }
    assert(e2.getMessage.contains("NULL"))
  }

  test("registered fixture row is non-vacuous at sf0.001") {
    val out = graft.queries.GraphQueries
      .queries("q_graph_triangles")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long)].collect()
    assert(out.map(_._3).sum / 3 > 0, "fixture graph must have triangles")
    assert(out.exists(_._4 === 0L) && out.exists(_._4 > 0L),
      "fixture must separate triangle-free nodes from embedded ones")
  }
}
