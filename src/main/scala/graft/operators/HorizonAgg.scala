package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact bounded-horizon FORWARD aggregation: for every input row, an
  * aggregate over the rows with the same key and time strictly inside
  * `(t, t + horizon]` — WITHOUT materializing the candidate-pair
  * stream.
  *
  * A range-bin join (operators/RangeBinJoin) produces the PAIRS; when
  * the consumer is a per-left-row aggregate, the pair stream is pure
  * overhead, and it grows with per-key density SQUARED (measured on
  * the events fixture: 10x rows in the same 30-day span -> 100x
  * pairs). This operator instead evaluates a RANGE-frame window inside
  * (key, cell) partitions over TWO tumbling grids of width
  * `2*horizon`, offset from each other by `horizon`:
  *
  *   - grid A cells: `t div 2H`; grid B cells: `(t + H) div 2H`.
  *   - The two grids' boundaries alternate exactly H apart, so an
  *     interval of length H can contain a boundary of at most ONE
  *     grid — the other grid's cell fully contains `(t, t+H]` and its
  *     window frame supplies the exact answer.
  *   - The containing grid is chosen per row by integer algebra
  *     (`t div 2H == (t+H) div 2H` picks A), and the cover invariant
  *     is asserted IN-PLAN so a violation fails loudly, never returns
  *     a silently-truncated aggregate.
  *
  * Cost: two (key, cell) shuffles of the input — linear in rows,
  * INDEPENDENT of key density. No window partition ever exceeds one
  * key's rows in a `2*horizon` time slice, so a hot key at 100 TB
  * spreads across its time cells instead of landing on one task (the
  * same argument as AsofJoin.backwardEpoched).
  *
  * Semantics notes: the frame `rangeBetween(1, H)` excludes ties at
  * the probe's own instant — identical to the join predicate
  * `b.t > a.t AND b.t <= a.t + H`. `timeMicros` must be a simple
  * non-negative integral column name (`div` truncates toward zero, so
  * negative times would mis-cell; epoch-micros of real timestamps are
  * safely non-negative).
  */
object HorizonAgg {

  /** @param aggs (outputName, aggregateExpression) pairs; each
    *   aggregate is evaluated over the horizon frame (count/sum/min/
    *   max/avg — anything `.over`-able). Output columns keep the
    *   aggregate's natural type; cast/coalesce downstream.
    *
    * NULL handling matches the join-predicate semantics (`b.k = a.k
    * AND b.t > a.t AND b.t <= a.t + H` never matches through a NULL):
    * a row with a NULL key or NULL time stays in the output with NULL
    * aggregate columns (coalesce downstream for count-like zeros) and
    * contributes to NO other row's frame — window partitionBy would
    * otherwise group NULL keys together like GROUP BY and invent
    * matches the join form does not have. Such rows are quarantined
    * into a sentinel cell (-1 is unreachable for valid rows: cells are
    * non-negative) so they cannot pollute a valid partition.
    */
  def forward(df: DataFrame, keys: Seq[String], timeMicros: String,
              horizonMicros: Long,
              aggs: Seq[(String, Column)]): DataFrame = {
    require(horizonMicros > 0, s"horizon must be positive: $horizonMicros")
    require(keys.nonEmpty, "at least one key column required")
    require(timeMicros.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"timeMicros must be a simple column name: $timeMicros")
    val reserved = df.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"__-prefixed columns are reserved: ${reserved.mkString(", ")}")
    val h = horizonMicros
    val c = 2 * h
    val valid = keys.map(col(_).isNotNull).reduce(_ && _) &&
      col(timeMicros).isNotNull
    def cell(shift: Long) =
      when(valid, expr(s"($timeMicros + ${shift}L) div ${c}L"))
        .otherwise(lit(-1L))
    val cellA = cell(0)
    val cellB = cell(h)
    // the cover invariant, stated on the cells themselves: grid A
    // contains (t, t+H] iff t and t+H share an A cell; grid B iff the
    // H-shifted pair shares a B cell (cell(2h) is cellB of t+H)
    val condA = cellA === cellB
    val condB = cellB === cell(2 * h)
    def win(cellName: String) = Window
      .partitionBy(keys.map(col) :+ col(cellName): _*)
      .orderBy(col(timeMicros)).rangeBetween(1L, h)
    val base = df.withColumn("__cellA", cellA).withColumn("__cellB", cellB)
    val withAggs = aggs.foldLeft(base) { case (d, (name, a)) =>
      d.withColumn(s"__${name}_a", a.over(win("__cellA")))
        .withColumn(s"__${name}_b", a.over(win("__cellB")))
    }
    val guarded = withAggs.where(coalesce(assert_true(!valid ||
      condA || condB,
      lit("HorizonAgg: neither grid cell contains the horizon window — " +
        "the two-grid cover invariant is broken (negative time?)")),
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
