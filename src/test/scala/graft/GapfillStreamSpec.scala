package graft

import graft.streaming.StreamingJobs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** The gap-fill streaming face: micro-batches land PARTIAL hourly
  * cells idempotently; the read view merges partials and applies the
  * ONE shared fill builder. Pins the three contracts the sink's
  * docstring claims: stream ≡ batch bit-for-bit, arrival-permutation
  * invariance (an hour SPLIT across micro-batches merges exactly), and
  * replay safety across a checkpoint restart.
  */
object GapfillStreamSpec {
  // top-level (not suite-inner) so Spark can build its encoder without
  // an outer-scope capture
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)
}

class GapfillStreamSpec extends AnyFunSuite with SparkTestBase {

  import GapfillStreamSpec.Ev

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // hour 10 of `click` is SPLIT across the two waves (events 1 and 2),
  // wave 2 arrives with EARLIER timestamps than wave 1's last event —
  // the partial-merge and out-of-order paths are both real; hours
  // 12-13 have no events at all (the fill path), and `view` starts
  // late (the leading-NULL path)
  private val wave1 = Seq(
    Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.25),
    Ev(3, ts("2024-01-01 14:30:00"), 1, "click", 4.50),
    Ev(5, ts("2024-01-01 14:45:00"), 2, "view", 16.00))
  private val wave2 = Seq(
    Ev(2, ts("2024-01-01 10:10:00"), 1, "click", 2.75),
    Ev(4, ts("2024-01-01 11:20:00"), 2, "click", 8.00))
  private val all = wave1 ++ wave2

  private def batchExpectation(rows: Seq[Ev]) = {
    import spark.implicits._
    graft.queries.EventQueries.gapfillOf(
      graft.queries.EventQueries.hourlyCents(rows.toDF()))
      .as[(String, Long, Option[Long], Boolean)].collect().toSet
  }

  private def viewRows(wh: String) = {
    import spark.implicits._
    StreamingJobs.gapfillView(spark, wh)
      .as[(String, Long, Option[Long], Boolean)].collect().toSet
  }

  test("split-hour micro-batches merge to the batch result exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_gapfill").toString
    val wh = s"$root/wh"
    val cp = s"$root/cp"
    val ms = MemoryStream[Ev]
    val q = StreamingJobs.gapfillCellSink(ms.toDF(), wh, cp)
    try {
      ms.addData(wave1); q.processAllAvailable()
      // prefix consistency: the view over wave 1 alone must equal the
      // batch gap-fill of wave 1 alone
      assert(viewRows(wh) === batchExpectation(wave1))
      ms.addData(wave2); q.processAllAvailable()
    } finally q.stop()
    assert(viewRows(wh) === batchExpectation(all))
    // the split hour really did land as two partials that merged
    val partials = spark.read.parquet(s"$wh/silver/events_hourly_cells")
      .where(org.apache.spark.sql.functions.col("event_type") === "click")
      .groupBy("hour_id").count()
      .as[(Long, Long)].collect().toMap
    val splitHour = wave1.head.ts.getTime / 3600000L // 2024-01-01T10
    assert(partials(splitHour) === 2L,
      "hour 10 must have landed as one partial cell per micro-batch")
    // fill semantics are really exercised: gap hours + a leading NULL
    val rows = viewRows(wh)
    assert(rows.exists(r => r._4 && r._3.isDefined), "carried fill")
    assert(rows.exists(r => r._4 && r._3.isEmpty), "leading NULL")
  }

  test("the read view refuses a missing cell table with a prescription") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_gapfill_nf").toString
    val e = intercept[IllegalArgumentException] {
      StreamingJobs.gapfillView(spark, wh)
    }
    assert(e.getMessage.contains("gapfillCellSink"), e.getMessage)
  }

  test("checkpoint restart lands only new data; no double counting") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_gapfill_rs").toString
    val wh = s"$root/wh"
    val cp = s"$root/cp"
    val ms = MemoryStream[Ev]
    val q1 = StreamingJobs.gapfillCellSink(ms.toDF(), wh, cp)
    try { ms.addData(wave1); q1.processAllAvailable() } finally q1.stop()
    val q2 = StreamingJobs.gapfillCellSink(ms.toDF(), wh, cp)
    try { ms.addData(wave2); q2.processAllAvailable() } finally q2.stop()
    assert(viewRows(wh) === batchExpectation(all),
      "a restarted stream must extend, not re-count, the landed cells")
  }
}
