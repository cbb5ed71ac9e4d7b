package graft

import scala.util.Random

import graft.operators.IntervalOverlapJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IntervalOverlapJoin against the naive overlap join it accelerates:
  * pair-for-pair equivalence on randomized intervals that deliberately
  * hit bin boundaries, exactly-maxLen lengths, zero-length points, and
  * pre-epoch (negative-micros) starts; NULL bounds drop like the bare
  * SQL predicate; over-long intervals abort LOUDLY (silent match loss
  * is the operator's documented worst failure mode).
  */
class IntervalOverlapJoinSpec extends AnyFunSuite with SparkTestBase {

  private val L = 1000000L // 1s bin width/length bound, in micros

  /** (id, key, startMicros, len) → frame with timestamp bounds. */
  private def frame(rows: Seq[(Long, Long, Long, Long)],
                    prefix: String): DataFrame = {
    import spark.implicits._
    rows.toDF(s"${prefix}id", s"${prefix}key", s"${prefix}s0", s"${prefix}len")
      .select(col(s"${prefix}id"), col(s"${prefix}key"),
        timestamp_micros(col(s"${prefix}s0")).as(s"${prefix}start"),
        timestamp_micros(col(s"${prefix}s0") + col(s"${prefix}len"))
          .as(s"${prefix}end"))
  }

  private def randRows(seed: Int, n: Int): Seq[(Long, Long, Long, Long)] = {
    val rnd = new Random(seed)
    Seq.tabulate(n) { i =>
      val start = rnd.nextInt(41).toLong * (L / 4) - 5 * L // pre-epoch too
      val len = rnd.nextInt(5) match {
        case 0 => 0L          // zero-length point interval
        case 1 => L           // exactly the bound
        case _ => rnd.nextLong(L + 1)
      }
      (i.toLong, rnd.nextInt(3).toLong, start, len)
    }
  }

  test("pair-for-pair equal to the naive overlap join (boundaries, pre-epoch)") {
    val a = frame(randRows(1, 120), "a")
    val b = frame(randRows(2, 120), "b")
    val got = IntervalOverlapJoin.overlapJoin(a, b,
      "akey", "bkey", "astart", "aend", "bstart", "bend", L)
      .select(col("aid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = a.join(b, col("akey") === col("bkey") &&
        col("astart") <= col("bend") && col("bstart") <= col("aend"))
      .select(col("aid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(want.nonEmpty, "fixture produced no overlaps — test is vacuous")
    assert(got === want)
    // each true pair met exactly once (no dedup pass exists to hide dups)
    assert(got.distinct.sizeIs == got.size)
  }

  test("NULL bounds drop like the bare SQL predicate; over-long aborts loudly") {
    import spark.implicits._
    val a = Seq((1L, 1L, Some(0L), Some(L)), (2L, 1L, None, Some(L)))
      .toDF("aid", "akey", "as0", "ae0")
      .select(col("aid"), col("akey"),
        timestamp_micros(col("as0")).as("astart"),
        timestamp_micros(col("ae0")).as("aend"))
    val b = frame(Seq((10L, 1L, 0L, L)), "b")
    val got = IntervalOverlapJoin.overlapJoin(a, b,
      "akey", "bkey", "astart", "aend", "bstart", "bend", L)
      .select(col("aid")).as[Long].collect().toSeq
    assert(got === Seq(1L), "null-bound row must drop, not crash or match")

    val tooLong = frame(Seq((1L, 1L, 0L, 2 * L)), "a")
    val ex = intercept[Exception] {
      IntervalOverlapJoin.overlapJoin(tooLong, b,
        "akey", "bkey", "astart", "aend", "bstart", "bend", L)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("maxLen")),
      s"expected the loud length-bound error, got: ${messages(ex).take(3)}")
  }
}
