package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Banded (binned) range join: pair every left row with the right rows
  * sharing its key whose time falls in the half-open window
  * `(leftTime, leftTime + horizon]`. LEFT OUTER semantics — a left row
  * with no in-range partner survives with null right columns.
  *
  * Spark plans a bare `l.key = r.key AND r.ts BETWEEN ...` join as an
  * equi join on the key alone, so every pair of rows sharing a key meets
  * in the residual filter — quadratic per key when keys are coarse (an
  * event_type column with five values at 100 TB is five astronomically
  * hot keys). The standard fix is bucketing time by the horizon:
  *
  *   - both sides compute `bin = floor(time / horizon)`;
  *   - a right row at bin b can only match left rows at bins b-1 or b
  *     (because 0 < r.ts - l.ts <= horizon), so the right side is
  *     exploded into exactly those two candidate bins;
  *   - the join becomes EQUI on (key, bin) with the exact range check as
  *     a residual — candidate pairs are bounded by per-(key, bin)
  *     density instead of per-key row count.
  *
  * The bin is exactly one horizon wide, so each true pair meets on
  * precisely ONE candidate bin — no dedup pass is needed afterwards.
  * Cost: one shuffle of each side on (key, bin); the 2x explode touches
  * only the right side's join columns. Bin arithmetic is done on
  * Decimal so `floor` is a true floor (Long `div` truncates toward zero,
  * which would mis-bin pre-epoch timestamps; Double division can slip an
  * ulp at exact bin boundaries).
  *
  * Flash-crowd caveat: a single (key, bin) holding n rows concentrates
  * its n^2 candidate pairs on one reducer once both sides are too big
  * to broadcast. Measured at 20k x 20k rows in one bin (PLANS.md): one
  * reducer 4.06 s vs 0.73 s for the same volume spread out; AQE
  * skew-join with deployment-sized thresholds
  * (spark.sql.adaptive.skewJoin.*) splits the left-outer SMJ's stream
  * side to 1.50 s — matching an intrusive 32-way bin-salting rewrite —
  * so the mitigation of record is configuration, not operator surgery.
  */
object RangeBinJoin {

  /** @param left      probe side; all columns preserved, one output row
    *                  minimum per input row
    * @param right     match side; column names must be disjoint from
    *                  `left`'s (alias first)
    * @param leftKey   equi key on `left`
    * @param rightKey  equi key on `right`
    * @param leftTime  timestamp column on `left` (window start, exclusive)
    * @param rightTime timestamp column on `right`
    * @param horizonMicros window width in microseconds (also the bin size)
    */
  def leftRangeJoin(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    leftTime: String, rightTime: String,
                    horizonMicros: Long): DataFrame = {
    require(horizonMicros > 0, s"horizon must be positive: $horizonMicros")
    val overlap = left.columns.toSeq.intersect(right.columns.toSeq)
    require(overlap.isEmpty,
      s"left/right columns must be disjoint; overlap: ${overlap.mkString(", ")}")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"'__'-prefixed column names are reserved by RangeBinJoin: ${reserved.mkString(", ")}")

    def bin(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c).cast(DecimalType(20, 0)) / lit(horizonMicros))
        .cast(LongType)

    val l = left.withColumn("__lbin", bin(col(leftTime)))
    val r = right
      .withColumn("__rbin", bin(col(rightTime)))
      .withColumn("__cbin", explode(array(col("__rbin") - 1, col("__rbin"))))
      .drop("__rbin")

    val cond = l(leftKey) === r(rightKey) &&
      l("__lbin") === r("__cbin") &&
      unix_micros(r(rightTime)) > unix_micros(l(leftTime)) &&
      unix_micros(r(rightTime)) <= unix_micros(l(leftTime)) + horizonMicros

    l.join(r, cond, "left").drop("__lbin", "__cbin")
  }
}
