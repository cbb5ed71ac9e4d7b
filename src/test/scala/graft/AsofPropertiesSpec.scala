package graft

import graft.operators.AsofJoin
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Model-based property test for both as-of variants: seeded random
  * probes/quotes over deliberately SMALL key/time domains (many
  * (key, time) collisions → the tie rules fire constantly) including
  * negative times (→ the epoched floor must be a true floor, where
  * truncate-toward-zero would mis-bin). Every output row is compared
  * against a pure-Scala brute-force model, and the epoched variant must
  * agree at several epoch widths — including width 1 (every row its own
  * epoch: pure carry path) and a width larger than the whole domain
  * (single epoch: pure local path).
  */
class AsofPropertiesSpec extends AnyFunSuite with SparkTestBase {

  private val rnd = new Random(7)

  test("backward and epoched match the brute-force model on ties-heavy data") {
    import spark.implicits._
    val probes = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(8).toLong, (rnd.nextInt(60) - 20).toLong))
    val quotes = (1 to 300).map(i =>
      (rnd.nextInt(8).toLong, (rnd.nextInt(60) - 20).toLong,
        1000L + i, rnd.nextInt(100).toDouble))
    val p = probes.toDF("p_id", "k", "p_ts")
    val q = quotes.toDF("k", "q_ts", "q_id", "q_val")

    // pure-Scala model: latest (q_ts, q_id) quote at or before the probe
    val want = probes.map { case (pid, k, pts) =>
      val cand = quotes.filter(x => x._1 == k && x._2 <= pts)
      pid -> (if (cand.isEmpty) None
              else Some(cand.maxBy(x => (x._2, x._3))._3))
    }.toMap

    def run(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
      df.select("p_id", "q_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap

    assert(run(AsofJoin.backward(p, q, "k", "p_ts", "q_ts", "q_id")) === want)
    for (width <- Seq(1L, 7L, 10L, 1000L)) {
      assert(run(AsofJoin.backwardEpoched(
        p, q, "k", "p_ts", "q_ts", "q_id", width)) === want, s"width $width")
    }

    // forward: earliest quote at or after; max q_id among min-ts ties
    val wantFwd = probes.map { case (pid, k, pts) =>
      val cand = quotes.filter(x => x._1 == k && x._2 >= pts)
      pid -> (if (cand.isEmpty) None
              else {
                val minTs = cand.map(_._2).min
                Some(cand.filter(_._2 == minTs).map(_._3).max)
              })
    }.toMap
    assert(run(AsofJoin.forward(p, q, "k", "p_ts", "q_ts", "q_id")) === wantFwd)
    assert(wantFwd.values.exists(_.isEmpty) && wantFwd.values.exists(_.nonEmpty))
    // the domains really collide: some tie groups and some no-match probes
    assert(want.values.exists(_.isEmpty) && want.values.exists(_.nonEmpty))
    assert(quotes.groupBy(x => (x._1, x._2)).exists(_._2.size > 1),
      "no (key, ts) quote collisions — tie rules untested")
  }
}
