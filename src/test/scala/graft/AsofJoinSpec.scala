package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the backward as-of join: inclusive equal-timestamp
  * match, deterministic tie-break, left rows with no prior quote, quotes
  * whose payload FIELDS are null (must still match), and equivalence to
  * the brute-force per-probe maximum on real event data.
  */
class AsofJoinSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def probes =
    Seq((1L, "a", 0L), (2L, "a", 5L), (3L, "a", 7L), (4L, "b", 9L))
      .toDF("p_id", "k", "p_ts")

  // key a: quotes at t=1, and TWO quotes tied at t=5; key c: never probed
  private def quotes =
    Seq(("a", 1L, 10L, "v1"), ("a", 5L, 11L, "v2"), ("a", 5L, 12L, "v3"),
        ("c", 2L, 13L, "v4"))
      .toDF("k", "q_ts", "q_id", "q_val")

  test("backward as-of: inclusive bound, max-tieBreak tie, left semantics") {
    val out = AsofJoin.backward(probes, quotes,
        key = "k", probeTime = "p_ts", quoteTime = "q_ts", tieBreak = "q_id")
      .orderBy("p_id")
      .select("p_id", "q_ts", "q_id", "q_val")
      .collect()
    assert(out.toSeq === Seq(
      Row(1L, null, null, null),       // probe before any quote
      Row(2L, 5L, 12L, "v3"),          // equal ts included; id 12 beats 11
      Row(3L, 5L, 12L, "v3"),          // carried forward past the tie
      Row(4L, null, null, null)))      // key with no quotes at all
  }

  test("a present quote with null payload fields still matches") {
    val q = Seq(("a", 1L, 10L, Option.empty[String]), ("a", 3L, 11L, Some("x")))
      .toDF("k", "q_ts", "q_id", "q_val")
    val p = Seq((1L, "a", 2L), (2L, "a", 4L)).toDF("p_id", "k", "p_ts")
    val out = AsofJoin.backward(p, q, "k", "p_ts", "q_ts", "q_id")
      .orderBy("p_id").select("p_id", "q_id", "q_val").collect()
    // probe 1 matches quote 10 (whose q_val is null) — the null FIELD must
    // come through, not fall back to "no quote"
    assert(out.toSeq === Seq(Row(1L, 10L, null), Row(2L, 11L, "x")))
  }

  test("matches brute-force per-probe maximum on events testdata") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.where($"event_type" === "click")
      .select($"event_id".as("p_id"), $"user_id".as("k"), $"ts".as("p_ts"))
    val q = ev.where($"event_type" === "purchase")
      .select($"user_id".as("k"), $"ts".as("q_ts"), $"event_id".as("q_id"))
    val got = AsofJoin.backward(p, q, "k", "p_ts", "q_ts", "q_id")
      .select("p_id", "q_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    // brute force: per probe, the max (q_ts, q_id) among quotes <= p_ts.
    // Compare on full microseconds (Timestamp.getTime is millis-only and
    // would order sub-millisecond neighbors differently than the operator).
    def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val qs = q.collect()
      .map(r => (r.getLong(0), micros(r.getTimestamp(1)), r.getLong(2)))
    val want = p.collect().map { r =>
      val (pid, k, pts) = (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2)))
      val cand = qs.filter(x => x._1 == k && x._2 <= pts)
      pid -> (if (cand.isEmpty) None
              else Some(cand.maxBy(x => (x._2, x._3))._3))
    }.toMap
    assert(got === want)
    assert(want.values.exists(_.nonEmpty), "vacuous: no probe matched")
    assert(want.values.exists(_.isEmpty), "vacuous: every probe matched")
  }

  test("null timestamps never match: SQL ASOF semantics in all variants") {
    // a null-ts quote must match NOTHING (not sort first and leak its
    // payload to quote-less probes); a null-ts probe must get null
    // payload in BOTH directions (desc default NULLS LAST would hand it
    // the earliest quote in forward)
    val p = Seq((1L, "a", Option(5L)), (2L, "a", Option.empty[Long]))
      .toDF("p_id", "k", "p_ts")
    val q = Seq(("a", Option.empty[Long], 10L, "leak"),
        ("a", Option(3L), 11L, "real"))
      .toDF("k", "q_ts", "q_id", "q_val")
    def got(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("p_id").select("p_id", "q_val").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(got(AsofJoin.backward(p, q, "k", "p_ts", "q_ts", "q_id")) ===
      Seq((1L, Some("real")), (2L, None)))
    assert(got(AsofJoin.backwardEpoched(p, q, "k", "p_ts", "q_ts", "q_id", 10L)) ===
      Seq((1L, Some("real")), (2L, None)))
    // forward: probe 1 (t=5) has no quote at or after it; the null-ts
    // quote must not be treated as "after everything"
    assert(got(AsofJoin.forward(p, q, "k", "p_ts", "q_ts", "q_id")) ===
      Seq((1L, None), (2L, None)))
  }

  test("epoched variant carries the fill across empty epochs") {
    // quote in epoch 0 (t=5, width 10); probes in epochs 3 and 0;
    // epochs 1-2 contain no rows at all — the carry must jump them
    val p = Seq((1L, "a", 7L), (2L, "a", 35L), (3L, "b", 35L))
      .toDF("p_id", "k", "p_ts")
    val q = Seq(("a", 5L, 10L, "v1")).toDF("k", "q_ts", "q_id", "q_val")
    val out = AsofJoin.backwardEpoched(p, q, "k", "p_ts", "q_ts", "q_id",
        epochMicros = 10L)
      .orderBy("p_id").select("p_id", "q_id", "q_val").collect()
    assert(out.toSeq === Seq(
      Row(1L, 10L, "v1"),   // same-epoch local fill
      Row(2L, 10L, "v1"),   // carried across empty epochs 1-2
      Row(3L, null, null))) // other key untouched
  }

  test("epoched variant equals the plain backward join on events testdata") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.where($"event_type" === "click")
      .select($"event_id".as("p_id"), $"user_id".as("k"), $"ts".as("p_ts"))
    val q = ev.where($"event_type" === "purchase")
      .select($"user_id".as("k"), $"ts".as("q_ts"), $"event_id".as("q_id"),
        $"value".as("q_val"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("p_id", "q_id", "q_val").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    val plain = rows(AsofJoin.backward(p, q, "k", "p_ts", "q_ts", "q_id"))
    // epoch widths both above and below typical inter-event gaps, so
    // same-epoch, adjacent-epoch and skipped-epoch carries all occur
    for (width <- Seq(3600L * 1000000L, 6L * 3600 * 1000000L)) {
      val epoched = rows(AsofJoin.backwardEpoched(
        p, q, "k", "p_ts", "q_ts", "q_id", width))
      assert(epoched === plain, s"epoch width $width")
    }
    assert(plain.exists(_._2.nonEmpty) && plain.exists(_._2.isEmpty))
  }
}
