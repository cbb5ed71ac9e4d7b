package graft

import graft.operators.RangeBinJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The banded range join must return EXACTLY the naive non-equi join's
  * pairs (the bin pre-filter is lossless: a partner in (t, t+h] always
  * shares or follows the probe's h-wide bin), including window-boundary
  * rows and left rows with no partner.
  */
class RangeBinJoinSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val H = 3600L * 1000000L // 1 hour in micros

  test("boundary semantics: (t, t+h] exclusive start, inclusive end") {
    // probe at 10:00:00; partners at 10:00:00 (excluded), 11:00:00
    // (included, == t+h exactly), 11:00:00.000001 (excluded), and one in
    // the NEXT hour bin at 10:59:59 (included — crosses the bin edge)
    val l = Seq((1L, "k", "2024-01-01 10:00:00"))
      .toDF("l_id", "k", "s").select($"l_id", $"k", $"s".cast("timestamp").as("l_ts"))
    val r = Seq(
        (10L, "2024-01-01 10:00:00"), (11L, "2024-01-01 11:00:00"),
        (12L, "2024-01-01 11:00:00.000001"), (13L, "2024-01-01 10:59:59"),
        (14L, "2024-01-01 09:30:00"))
      .toDF("r_id", "rs")
      .select($"r_id", lit("k").as("rk"), $"rs".cast("timestamp").as("r_ts"))
    val got = RangeBinJoin.leftRangeJoin(l, r, "k", "rk", "l_ts", "r_ts", H)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.get(1))).toSet
    assert(got === Set((1L, 11L), (1L, 13L)))
  }

  test("left row with no in-range partner survives with nulls") {
    val l = Seq((1L, "k", "2024-01-01 10:00:00"), (2L, "z", "2024-01-01 10:00:00"))
      .toDF("l_id", "k", "s").select($"l_id", $"k", $"s".cast("timestamp").as("l_ts"))
    val r = Seq((10L, "k", "2024-01-01 10:30:00"))
      .toDF("r_id", "rk", "rs")
      .select($"r_id", $"rk", $"rs".cast("timestamp").as("r_ts"))
    val got = RangeBinJoin.leftRangeJoin(l, r, "k", "rk", "l_ts", "r_ts", H)
      .select("l_id", "r_id").orderBy("l_id").collect()
    assert(got.toSeq === Seq(Row(1L, 10L), Row(2L, null)))
  }

  test("binned pairs equal naive non-equi pairs on events testdata") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val l = ev.select($"event_id".as("l_id"), $"event_type".as("k"), $"ts".as("l_ts"))
    val r = ev.select($"event_id".as("r_id"), $"event_type".as("rk"), $"ts".as("r_ts"))
    val binned = RangeBinJoin.leftRangeJoin(l, r, "k", "rk", "l_ts", "r_ts", H)
      .where($"r_id".isNotNull)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val naive = l.join(r,
        l("k") === r("rk") && r("r_ts") > l("l_ts")
          && unix_micros(r("r_ts")) <= unix_micros(l("l_ts")) + H)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(binned === naive)
    assert(naive.nonEmpty, "vacuous: no in-range pairs in testdata")
    // left semantics preserved: every event appears at least once
    val n = RangeBinJoin.leftRangeJoin(l, r, "k", "rk", "l_ts", "r_ts", H)
      .select("l_id").distinct().count()
    assert(n === ev.count())
  }
}
