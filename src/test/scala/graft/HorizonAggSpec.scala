package graft

import graft.operators.HorizonAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the two-grid bounded-horizon window aggregate:
  *
  *  - boundary torture: rows planted exactly ON and AROUND every grid
  *    boundary (kC, kC±1, kC-H, kC+H, ties) match a brute-force local
  *    recompute — the cover-and-choose algebra has no off-by-one;
  *  - the registered window form (q_join_range_window) equals the
  *    pair-join form (q_join_range_binned) row-for-row at sf0.01;
  *  - the plan materializes no join of the event stream against itself
  *    (the whole point: aggregate pushdown without the pair stream).
  */
class HorizonAggSpec extends AnyFunSuite with SparkTestBase {

  test("boundary torture matches a brute-force recompute") {
    import spark.implicits._
    val h = 100L // horizon; cells are [0,200), [200,400) / B offset 100
    // every alignment class around the first few boundaries of BOTH
    // grids, ties included, two keys to prove key isolation
    val times = Seq(0L, 1L, 99L, 100L, 101L, 150L, 199L, 200L, 201L,
      250L, 299L, 300L, 301L, 399L, 400L, 401L, 450L, 450L, 550L, 599L)
    val rows = for {
      k <- Seq("x", "y"); (t, i) <- times.zipWithIndex
    } yield (k, t, i.toLong + (if (k == "x") 0L else 1000L))
    val df = rows.toDF("k", "t", "v")
    val got = HorizonAgg.forward(df, Seq("k"), "t", h,
      Seq("n" -> count(lit(1)), "sv" -> sum(col("v"))))
      .select(col("k"), col("t"), col("v"), col("n").cast("long"),
        coalesce(col("sv"), lit(0L)).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got.size === rows.size)
    rows.foreach { case (k, t, v) =>
      val in = rows.filter { case (k2, t2, _) =>
        k2 == k && t2 > t && t2 <= t + h }
      assert(got((k, t, v)) === (in.size.toLong, in.map(_._3).sum),
        s"mismatch at ($k, $t)")
    }
  }

  test("NULL keys and NULL times quarantine like the join predicate") {
    import spark.implicits._
    val h = 100L
    // two NULL-key rows within h of each other: the join predicate
    // k = k never matches through NULL, so they must NOT see each other
    // (window partitionBy alone would group them); a NULL-time row must
    // yield a NULL aggregate, not crash the in-plan cover assert
    val rows: Seq[(Option[String], Option[Long], Long)] = Seq(
      (Some("x"), Some(10L), 1L), (Some("x"), Some(50L), 2L),
      (None, Some(20L), 3L), (None, Some(30L), 4L),
      (Some("x"), None, 5L), (Some("y"), Some(10L), 6L))
    val got = HorizonAgg.forward(rows.toDF("k", "t", "v"), Seq("k"), "t", h,
      Seq("n" -> count(lit(1))))
      .select(col("v"), col("n"))
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 0L, 3L -> -1L, 4L -> -1L,
      5L -> -1L, 6L -> 0L))
  }

  test("window form equals the pair-join form row-for-row") {
    val dir = "/root/testdata/sf0.01"
    def canon(name: String) =
      SparkEntry.queries(name)(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
    val win = canon("q_join_range_window")
    val join = canon("q_join_range_binned")
    assert(win.size === join.size)
    assert(win === join)
    assert(win.values.exists(_._1 > 0L), "no matches anywhere — vacuous")
  }

  test("backward boundary torture matches a brute-force recompute") {
    import spark.implicits._
    val h = 100L // trailing cells are width 202, offset 101
    // alignment classes around both trailing grids' boundaries —
    // including t < h (negative clamp truncation), exact multiples of
    // h+1 (the combined boundary lattice) and ties
    val times = Seq(0L, 1L, 50L, 100L, 101L, 102L, 150L, 201L, 202L,
      203L, 252L, 302L, 303L, 303L, 403L, 404L, 500L, 505L, 606L)
    val rows = for {
      k <- Seq("x", "y"); (t, i) <- times.zipWithIndex
    } yield (k, t, i.toLong + (if (k == "x") 0L else 1000L))
    val df = rows.toDF("k", "t", "v")
    val got = HorizonAgg.backward(df, Seq("k"), "t", h,
      Seq("n" -> count(lit(1)), "sv" -> sum(col("v"))))
      .select(col("k"), col("t"), col("v"), col("n").cast("long"),
        coalesce(col("sv"), lit(0L)).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got.size === rows.size)
    rows.foreach { case (k, t, v) =>
      val in = rows.filter { case (k2, t2, _) =>
        k2 == k && t2 >= t - h && t2 <= t }
      assert(got((k, t, v)) === (in.size.toLong, in.map(_._3).sum),
        s"mismatch at ($k, $t)")
    }
  }

  test("scalable trailing form equals the whole-key-window form") {
    val dir = "/root/testdata/sf0.01"
    def canon(name: String) =
      SparkEntry.queries(name)(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
    val scalable = canon("q_window_trailing_scalable")
    val window = canon("q_window_trailing_range")
    assert(scalable.size === window.size)
    assert(scalable === window)
    // non-vacuous: some customer must have a multi-order trailing frame
    assert(scalable.values.map(_._2).toSeq.distinct.length > 1)
  }

  test("window form plans no self-join of the event stream") {
    val plan = SparkEntry.queries("q_join_range_window")(
      spark, "/root/testdata/sf0.01").queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("sortmergejoin") &&
      !plan.toLowerCase.contains("broadcasthashjoin") &&
      !plan.toLowerCase.contains("shuffledhashjoin"),
      "aggregate-pushdown form must not materialize pairs:\n" + plan)
  }
}
