package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Interval-overlap join with bounded interval lengths: inner-join
  * pairs sharing a key whose closed ranges [leftStart, leftEnd] and
  * [rightStart, rightEnd] overlap (`lStart <= rEnd AND rStart <= lEnd`)
  * — the both-sides-ranged sibling of [[RangeBinJoin]] (point in
  * window). Overlapping-session detection, ad-slot × visit windows,
  * shift × incident ranges all take this shape.
  *
  * A bare `key equi + overlap residual` join is quadratic per key once
  * keys are coarse. With BOTH interval lengths bounded by
  * `maxLenMicros` = L (validated IN-PLAN — see below), bin width L
  * localizes the pairing: a right interval overlapping a left one must
  * have its START in `[lStart - L, lEnd]` (rStart >= lStart - lenR >=
  * lStart - L, and rStart <= lEnd), so its start bin lies in
  * `[floor(lStart/L) - 1, floor(lEnd/L)]` — at most 3 bins when
  * lenL <= L. The LEFT side explodes to exactly that bin range; the
  * RIGHT side lands in its ONE start bin — every true pair meets on
  * precisely one (key, bin), so no post-join dedup pass is needed.
  * Cost: one (key, bin) shuffle per side plus the <=3x left fan-out.
  *
  * The length bound is enforced DISTRIBUTED with `assert_true` inside
  * the plan — an over-long interval would silently LOSE matches (its
  * partner's start bin falls outside the explode range), which is the
  * worst failure mode; the job failing loudly is the contract.
  */
object IntervalOverlapJoin {

  /** @param left       side exploded to candidate bins; all columns kept
    * @param right      side landing in its single start bin; column
    *                   names must be disjoint from `left`'s (alias first)
    * @param leftKey    equi key on `left`
    * @param rightKey   equi key on `right`
    * @param leftStart  timestamp column: left interval start (closed)
    * @param leftEnd    timestamp column: left interval end (closed)
    * @param rightStart timestamp column: right interval start (closed)
    * @param rightEnd   timestamp column: right interval end (closed)
    * @param maxLenMicros bound on BOTH sides' interval lengths; also
    *                   the bin width
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftStart: String, leftEnd: String,
                  rightStart: String, rightEnd: String,
                  maxLenMicros: Long): DataFrame = {
    require(maxLenMicros > 0, s"maxLen must be positive: $maxLenMicros")
    val overlapCols = left.columns.toSeq.intersect(right.columns.toSeq)
    require(overlapCols.isEmpty,
      s"left/right columns must be disjoint; overlap: ${overlapCols.mkString(", ")}")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      "'__'-prefixed column names are reserved by IntervalOverlapJoin: " +
        reserved.mkString(", "))

    // true floor on Decimal: Long `div` truncates toward zero and would
    // mis-bin pre-epoch starts (the RangeBinJoin discipline)
    def bin(c: Column) =
      floor(unix_micros(c).cast(DecimalType(20, 0)) / lit(maxLenMicros))
        .cast(LongType)
    def checkLen(side: String, s: Column, e: Column) =
      assert_true(unix_micros(e) - unix_micros(s) <= maxLenMicros &&
        unix_micros(e) >= unix_micros(s),
        lit(s"IntervalOverlapJoin: $side interval longer than maxLen " +
          s"($maxLenMicros us) or negative — matches would be silently " +
          "lost; widen maxLen or pre-split intervals"))

    // A NULL bound can never satisfy the overlap predicate, so a bare
    // SQL overlap join simply drops such rows — mirror that (inner
    // semantics) instead of letting the null reach assert_true, whose
    // null condition would ABORT the job with a misleading over-long
    // message. The guard itself rides a WHERE (assert_true yields null
    // on success → coalesce true) — a dropped helper column would be
    // pruned out of the plan and the check would never run.
    val l = left
      .where(col(leftStart).isNotNull && col(leftEnd).isNotNull)
      .where(coalesce(checkLen("left", col(leftStart), col(leftEnd)),
        lit(true)))
      .withColumn("__cbin", explode(sequence(
        bin(col(leftStart)) - 1, bin(col(leftEnd)))))
    val r = right
      .where(col(rightStart).isNotNull && col(rightEnd).isNotNull)
      .where(coalesce(checkLen("right", col(rightStart), col(rightEnd)),
        lit(true)))
      .withColumn("__rbin", bin(col(rightStart)))

    val cond = l(leftKey) === r(rightKey) &&
      l("__cbin") === r("__rbin") &&
      unix_micros(l(leftStart)) <= unix_micros(r(rightEnd)) &&
      unix_micros(r(rightStart)) <= unix_micros(l(leftEnd))

    l.join(r, cond, "inner").drop("__cbin", "__rbin")
  }
}
