package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact bounded-horizon aggregation per row — forward `(t, t+H]` or
  * trailing `[t-H, t]` — WITHOUT materializing a candidate-pair stream
  * (forward) or a whole-key window partition (trailing).
  *
  * A range-bin join (operators/RangeBinJoin) produces the PAIRS; when
  * the consumer is a per-left-row aggregate, the pair stream is pure
  * overhead, and it grows with per-key density SQUARED (measured on
  * the events fixture: 10x rows in the same 30-day span -> 100x
  * pairs). A plain `Window.partitionBy(key)` RANGE frame avoids the
  * pairs but lands a hot key's entire history on ONE task. This
  * operator gets both properties — linear in rows, density- and
  * skew-independent — by evaluating a RANGE-frame window inside
  * (key, cell) partitions over TWO tumbling grids, offset from each
  * other by half a cell:
  *
  *   - The two grids' boundaries alternate exactly half-a-cell apart,
  *     and the cell width is chosen so the aggregation interval can
  *     contain a boundary of at most ONE grid — the other grid's cell
  *     fully contains the interval and its window frame supplies the
  *     exact answer.
  *   - The containing grid is chosen per row by integer algebra, and
  *     the cover invariant is asserted IN-PLAN so a violation fails
  *     loudly, never returns a silently-truncated aggregate.
  *   - Forward `(t, t+H]` is half-open with span H → cells of width
  *     2H offset H. Trailing `[t-H, t]` is CLOSED (it includes the
  *     current row and its ties) with span H+1 integer points → cells
  *     of width 2(H+1) offset H+1 (combined boundaries are the
  *     multiples of H+1, alternating between grids; an interval
  *     containing at most one multiple of H+1 crosses at most one
  *     grid).
  *
  * Cost: two (key, cell) shuffles of the input — linear in rows,
  * INDEPENDENT of key density. No window partition ever exceeds one
  * key's rows in a two-cell time slice, so a hot key at 100 TB
  * spreads across its time cells instead of landing on one task (the
  * same argument as AsofJoin.backwardEpoched).
  *
  * NULL handling matches join-predicate semantics (`b.k = a.k AND
  * b.t > a.t ...` never matches through a NULL): a row with a NULL
  * key or NULL time stays in the output with NULL aggregate columns
  * (coalesce downstream for count-like zeros) and contributes to NO
  * other row's frame — window partitionBy would otherwise group NULL
  * keys together like GROUP BY and invent matches the join form does
  * not have. Such rows are quarantined into a sentinel cell (-1 is
  * unreachable for valid rows: cells are non-negative).
  *
  * Frame semantics: forward `rangeBetween(1, H)` excludes ties at the
  * probe's own instant — identical to `b.t > a.t AND b.t <= a.t + H`;
  * trailing `rangeBetween(-H, 0)` includes the row and its ties —
  * identical to `RANGE BETWEEN H PRECEDING AND CURRENT ROW`.
  * `timeMicros` must be a simple non-negative integral column name
  * (`div` truncates toward zero, so negative times would mis-cell;
  * any integral axis works — epoch micros and epoch days alike).
  */
object HorizonAgg {

  /** Forward horizon: per row, `aggs` over same-key rows in (t, t+H].
    *
    * @param aggs (outputName, aggregateExpression) pairs; each
    *   aggregate is evaluated over the horizon frame (count/sum/min/
    *   max/avg — anything `.over`-able). Output columns keep the
    *   aggregate's natural type; cast/coalesce downstream.
    */
  def forward(df: DataFrame, keys: Seq[String], timeMicros: String,
              horizonMicros: Long,
              aggs: Seq[(String, Column)]): DataFrame = {
    require(horizonMicros > 0, s"horizon must be positive: $horizonMicros")
    val h = horizonMicros
    twoGridAgg(df, keys, timeMicros, aggs, cellWidth = 2 * h,
      offsetB = h, frameLo = 1L, frameHi = h,
      condAShifts = (0L, h), condBShifts = (h, 2 * h))
  }

  /** Trailing horizon: per row, `aggs` over same-key rows in [t-H, t]
    * — the `RANGE BETWEEN H PRECEDING AND CURRENT ROW` frame without
    * a whole-key partition. For t < H the truncating div maps the
    * negative clamp into cell 0, which is exactly the cell holding
    * the existing rows of [0, t].
    */
  def backward(df: DataFrame, keys: Seq[String], timeMicros: String,
               horizonMicros: Long,
               aggs: Seq[(String, Column)]): DataFrame = {
    require(horizonMicros > 0, s"horizon must be positive: $horizonMicros")
    val h = horizonMicros
    twoGridAgg(df, keys, timeMicros, aggs, cellWidth = 2 * (h + 1),
      offsetB = h + 1, frameLo = -h, frameHi = 0L,
      condAShifts = (-h, 0L), condBShifts = (1L, h + 1))
  }

  /** The shared two-grid core. condX compares the cell of
    * `t + shift._1` against the cell of `t + shift._2` — "the
    * interval's two ends share an X cell".
    */
  private def twoGridAgg(df: DataFrame, keys: Seq[String],
                         timeMicros: String, aggs: Seq[(String, Column)],
                         cellWidth: Long, offsetB: Long,
                         frameLo: Long, frameHi: Long,
                         condAShifts: (Long, Long),
                         condBShifts: (Long, Long)): DataFrame = {
    require(cellWidth > 0, s"cell width must be positive: $cellWidth")
    require(keys.nonEmpty, "at least one key column required")
    require(timeMicros.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"timeMicros must be a simple column name: $timeMicros")
    val reserved = df.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"__-prefixed columns are reserved: ${reserved.mkString(", ")}")
    val valid = keys.map(col(_).isNotNull).reduce(_ && _) &&
      col(timeMicros).isNotNull
    def cellExpr(shift: Long): Column =
      expr(s"($timeMicros + ${shift}L) div ${cellWidth}L")
    def cell(shift: Long): Column =
      when(valid, cellExpr(shift)).otherwise(lit(-1L))
    def cond(shifts: (Long, Long)): Column =
      cellExpr(shifts._1) === cellExpr(shifts._2)
    val condA = cond(condAShifts)
    val condB = cond(condBShifts)
    def win(cellName: String) = Window
      .partitionBy(keys.map(col) :+ col(cellName): _*)
      .orderBy(col(timeMicros)).rangeBetween(frameLo, frameHi)
    val base = df.withColumn("__cellA", cell(0))
      .withColumn("__cellB", cell(offsetB))
    val withAggs = aggs.foldLeft(base) { case (d, (name, a)) =>
      d.withColumn(s"__${name}_a", a.over(win("__cellA")))
        .withColumn(s"__${name}_b", a.over(win("__cellB")))
    }
    val guarded = withAggs.where(coalesce(assert_true(!valid ||
      condA || condB,
      lit("HorizonAgg: neither grid cell contains the aggregation " +
        "window — the two-grid cover invariant is broken " +
        "(negative time?)")),
      lit(true)))
    val out = aggs.foldLeft(guarded) { case (d, (name, _)) =>
      d.withColumn(name,
        when(!valid, lit(null))
          .when(condA, col(s"__${name}_a")).otherwise(col(s"__${name}_b")))
    }
    out.drop(aggs.flatMap { case (n, _) => Seq(s"__${n}_a", s"__${n}_b") }
      ++ Seq("__cellA", "__cellB"): _*)
  }
}
