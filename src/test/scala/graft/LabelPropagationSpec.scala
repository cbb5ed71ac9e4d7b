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
    // modularity is a MEASUREMENT consumers threshold on — it carries
    // the same guards: a NULL endpoint silently dropped by the
    // self-loop predicate would deflate m and skew the reported ppm
    val lab = Seq(("a", "a"), ("b", "a")).toDF("node", "community")
    val e3 = intercept[IllegalArgumentException] {
      LabelPropagation.modularity(lab,
        Seq.empty[(String, String)].toDF("src", "dst")).collect()
    }
    assert(e3.getMessage.contains("empty"))
    val e4 = intercept[IllegalArgumentException] {
      LabelPropagation.modularity(lab, withNull).collect()
    }
    assert(e4.getMessage.contains("NULL"))
  }

  test("registered fixture resolves the three residue communities") {
    val out = graft.queries.GraphQueries
      .queries("q_graph_lpa")(spark, "/root/testdata/sf0.001")
      .as[(String, String)].collect()
    val sizes = out.groupBy(_._2).view.mapValues(_.length).values.toSeq
    assert(sizes.sorted === Seq(9, 10, 10),
      s"expected the residue-class communities, got $sizes")
  }

  /** Modularity twin straight off Newman-Girvan on the lattice:
    * Q·4m² = Σ_c (4·m·in_c − d_c²).
    */
  private def referenceModularity(edges: Seq[(String, String)],
                                  labels: Map[String, String])
  : (Long, Long, Long) = {
    val simple = edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap).distinct
    val m = simple.size.toLong
    val deg = simple.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val byC = labels.groupBy(_._2).view.mapValues(_.keySet).toMap
    val num = byC.valuesIterator.map { members =>
      val in = simple.count(e => members(e._1) && members(e._2)).toLong
      val dc = members.toSeq.map(deg).sum
      4L * m * in - dc * dc
    }.sum
    (num, 4L * m * m, byC.size.toLong)
  }

  test("modularity matches the twin and separates good from bad labelings") {
    def clique(ns: Seq[String]) =
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = clique(Seq("a1", "a2", "a3", "a4")) ++
      clique(Seq("b1", "b2", "b3", "b4")) :+ ("a4", "b1")
    val labels = run(edges, 4)
    val (num, den, nc) = referenceModularity(edges, labels)
    val got = LabelPropagation.modularity(
        LabelPropagation.run(spark, edges.toDF("src", "dst"), 4),
        edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length === 1)
    val (gc, gm, gnum, gden, gppm) = got.head
    assert((gnum, gden, gc) === ((num, den, nc)))
    assert(gm === edges.size.toLong)
    assert(gppm === Math.floorDiv(num * 1000000L, den),
      "ppm must be FLOOR division on the lattice")
    // the two-clique labeling is high-quality; the pathological
    // one-node-one-community labeling must score NEGATIVE — the
    // measurement separates them (floor-division sign handling included)
    val trivial = labels.keys.toSeq.toDF("node")
      .selectExpr("node", "node AS community")
    val bad = LabelPropagation.modularity(trivial, edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(bad._3 < 0L && bad._5 < 0L)
    val (bnum, bden, _) =
      referenceModularity(edges, labels.keys.map(n => n -> n).toMap)
    assert(bad._3 === bnum)
    assert(bad._5 === Math.floorDiv(bnum * 1000000L, bden))
    assert(gppm > bad._5)
  }

  /** refineOnce twin straight off the move rule: Δ·4m² against the
    * pre-round sums, candidates strictly below the own label, argmax
    * with smallest-c ties, stay unless Δ > 0.
    */
  private def referenceRefine(edges: Seq[(String, String)],
                              labels: Map[String, String])
  : Map[String, String] = {
    val simple = edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap).distinct
    val m = simple.size.toLong
    val adj = simple.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val dsum = labels.groupBy(_._2).view
      .mapValues(_.keys.map(deg).sum).toMap
    adj.keys.map { v =>
      val a = labels(v)
      val kv = adj(v).groupBy(labels).view.mapValues(_.size.toLong).toMap
      val kA = kv.getOrElse(a, 0L)
      val best = kv.keys.filter(_ < a).toSeq
        .map(c => (4L * m * (kv(c) - kA)
          - 2L * deg(v) * (dsum(c) - dsum(a) + deg(v)), c))
        .filter(_._1 > 0L)
        .sortBy { case (d, c) => (-d, c) }
        .headOption
      v -> best.map(_._2).getOrElse(a)
    }.toMap
  }

  test("refineOnce matches the twin and only ever moves down-label") {
    def clique(ns: Seq[String]) =
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val bridge = clique(Seq("a1", "a2", "a3", "a4")) ++
      clique(Seq("b1", "b2", "b3", "b4")) :+ ("a4", "b1")
    val rand = (0 until 180).map { i =>
      (s"n${i * 13 % 21}", s"n${(i * i + 7) % 21}")
    }.filter(e => e._1 != e._2)
    for (edges <- Seq(bridge, rand); rounds <- Seq(1, 4)) {
      val labels = run(edges, rounds)
      val got = LabelPropagation.refineOnce(
          LabelPropagation.run(spark, edges.toDF("src", "dst"), rounds),
          edges.toDF("src", "dst"))
        .as[(String, String)].collect().toMap
      assert(got === referenceRefine(edges, labels),
        s"edges=${edges.take(2)}... rounds=$rounds")
      got.foreach { case (n, c) =>
        assert(c <= labels(n), s"$n moved UP-label — oscillation risk")
      }
    }
  }

  test("one refine round recovers the fixture's structural partition") {
    val rows = graft.queries.GraphQueries
      .queries("q_graph_lpa_refined")(spark, "/root/testdata/sf0.001")
      .select("labeling", "communities", "modularity_num")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val ab = graft.queries.GraphQueries
      .queries("q_graph_lpa_modularity")(spark, "/root/testdata/sf0.001")
      .select("labeling", "modularity_num")
      .as[(String, Long)].collect().toMap
    assert(rows("refined_1")._2 > rows("lpa_round4")._2,
      "the move round must measurably improve modularity here")
    assert(rows("refined_1") === ((2L, ab("residue_blocks"))),
      "one round should recover exactly the merged-block truth the " +
        "A/B row names as the target")
  }

  test("iterated Louvain: fixpoint proven in-trace, modularity never drops") {
    val trace = graft.queries.GraphQueries
      .queries("q_graph_louvain")(spark, "/root/testdata/sf0.001")
      .select("round", "moved", "modularity_ppm")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // the trace ends at a PROVEN fixpoint: the last round moved nobody
    assert(trace.last._2 === 0L, "last trace row must prove moved = 0")
    assert(trace.init.tail.forall(_._2 > 0L),
      "interior rounds must each have moved someone (early stop)")
    // measured monotone non-decreasing modularity ON THIS FIXTURE —
    // measured, not assumed: synchronous simultaneous moves interact,
    // which is exactly why the row carries the per-round numbers
    trace.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3,
        s"modularity dropped ${a._3} -> ${b._3} at round ${b._1}")
    }
    // and the fixpoint is the structural optimum the A/B row names
    val ab = graft.queries.GraphQueries
      .queries("q_graph_lpa_modularity")(spark, "/root/testdata/sf0.001")
      .select("labeling", "modularity_ppm")
      .as[(String, Long)].collect().toMap
    assert(trace.last._3 === ab("residue_blocks"))

    // the loud cap: the fixture needs 2 rounds (1 move round + the
    // proving round) — capped at 1 it must REFUSE rather than publish
    // an unproven labeling as refined
    val e = intercept[IllegalArgumentException] {
      LabelPropagation.refineTrace(
        graft.queries.GraphQueries.queries("q_graph_lpa")(
          spark, "/root/testdata/sf0.001"),
        graft.queries.GraphQueries.triangleFixtureEdges(
          spark, "/root/testdata/sf0.001"),
        maxRounds = 1)
    }
    assert(e.getMessage.contains("fixpoint"))
  }

  test("registered modularity A/B: structural blocks beat round-4 LPA") {
    val rows = graft.queries.GraphQueries
      .queries("q_graph_lpa_modularity")(spark, "/root/testdata/sf0.001")
      .select("labeling", "modularity_ppm")
      .as[(String, Long)].collect().toMap
    assert(rows.keySet === Set("lpa_round4", "residue_blocks"))
    assert(rows("lpa_round4") > 0L, "LPA's labeling is better than random")
    assert(rows("residue_blocks") > rows("lpa_round4"),
      "the merged-block truth must dominate — the gap IS the measurement")
  }
}
