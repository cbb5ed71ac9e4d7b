package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StructType, TimestampType}

/** Backward as-of join (the time-series "latest quote at or before each
  * probe"): for every probe row, attach the payload of the most recent
  * quote row with the same key and `quoteTime <= probeTime`; probes with
  * no prior quote keep null payload (left semantics).
  *
  * Spark has no ASOF JOIN operator. The naive encodings are both
  * scale-killers: a non-equi theta join degenerates to a per-key cross
  * product, and a correlated "max ts <= probe ts" subquery re-scans the
  * quote side per probe. The scalable plan is the classic union trick:
  *
  *   1. tag probes (1) and quotes (0) and UNION them into one frame;
  *   2. one shuffle, partitioned by key, sorted by
  *      (time, tag, tieBreak) — quotes sort BEFORE probes at equal
  *      timestamps, giving the "at or before" inclusive bound;
  *   3. running `last(payload, ignoreNulls)` over rows
  *      [unboundedPreceding, currentRow] carries each quote's payload
  *      forward to every later probe of the same key;
  *   4. keep only probe rows.
  *
  * Cost: ONE shuffle of |probes| + |quotes| rows on the join key and a
  * sort within partitions — the same price as a sort-merge join, with no
  * pair explosion regardless of how many quotes precede a probe. All
  * operators (window + last) are codegen'd; nothing touches the driver.
  *
  * Scale notes: in [[backward]] a window partition holds ALL rows of one
  * key, so a pathologically hot key serializes into one task (same
  * property as any PARTITION BY). [[backwardEpoched]] removes that bound
  * by splitting time into fixed epochs — see its doc. Quote payload is
  * carried as ONE struct column, so a quote whose payload FIELDS are null
  * still matches (`last(ignoreNulls)` skips only absent quotes, never a
  * present quote with null fields).
  *
  * Ties: among quotes sharing (key, time), the one with the LARGEST
  * `tieBreak` wins — ascending sort + running `last` keeps the final row
  * of the tie group. Pass a row-unique column to make the pick
  * deterministic (the oracle mirrors this with MAX_BY).
  */
object AsofJoin {

  private final case class Tagged(unioned: DataFrame,
                                  probeCols: Seq[String],
                                  payloadCols: Seq[String])

  /** Union probes and quotes into one frame carrying `__t` (sort time),
    * `__probe` (0 = quote, 1 = probe), `__tie` (quote tie-break, null on
    * probes) and `__payload` (struct of all quote columns but the key,
    * null on probes), plus the probe columns (null on quotes).
    */
  private def tagUnion(probes: DataFrame, quotes: DataFrame,
                       key: String, probeTime: String, quoteTime: String,
                       tieBreak: String): Tagged = {
    val probeCols = probes.columns.toSeq
    val payloadCols = quotes.columns.toSeq.filterNot(_ == key)
    require(probeCols.intersect(payloadCols).isEmpty,
      s"probe/quote columns must be disjoint apart from '$key'; " +
        s"overlap: ${probeCols.intersect(payloadCols).mkString(", ")}")
    val reserved = (probeCols ++ payloadCols).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"'__'-prefixed column names are reserved by AsofJoin: ${reserved.mkString(", ")}")

    val payloadType = StructType(quotes.schema.fields.filterNot(_.name == key))
    val tieType = quotes.schema(tieBreak).dataType

    val taggedProbes = probes
      .withColumn("__t", col(probeTime))
      .withColumn("__probe", lit(1))
      .withColumn("__tie", lit(null).cast(tieType))
      .withColumn("__payload", lit(null).cast(payloadType))

    // SQL ASOF semantics: a NULL-timestamped quote never matches.
    // Unfiltered it would sort FIRST (asc NULLS FIRST) and the running
    // last() would hand its payload to every probe with no real prior
    // quote; in the epoched variant its null epoch slot would leak into
    // the carry. (A NULL-timestamped PROBE needs no filter: it sorts
    // before every quote and correctly gets null payload.)
    val taggedQuotes = quotes
      .where(col(quoteTime).isNotNull)
      .withColumn("__t", col(quoteTime))
      .withColumn("__probe", lit(0))
      .withColumn("__tie", col(tieBreak))
      .withColumn("__payload", struct(payloadCols.map(col): _*))
      .select(Seq(col(key), col("__t"), col("__probe"), col("__tie"),
        col("__payload")) ++
        probeCols.filterNot(_ == key).map(c =>
          lit(null).cast(probes.schema(c).dataType).as(c)): _*)

    Tagged(taggedProbes.unionByName(taggedQuotes), probeCols, payloadCols)
  }

  /** The shared event-time sort: quotes before probes at equal
    * timestamps (inclusive bound), max tieBreak last among tied quotes.
    * Backward walks time ascending (running `last` = latest quote <=
    * probe); forward walks it DESCENDING, so the same running `last`
    * lands on the EARLIEST quote >= probe.
    */
  private def eventOrder(ascending: Boolean) = {
    // NULLS FIRST in BOTH directions: a null-timestamped probe must see
    // an empty frame (null payload), not sort after the quotes
    val t = if (ascending) col("__t").asc_nulls_first
            else col("__t").desc_nulls_first
    Seq(t, col("__probe").asc, col("__tie").asc_nulls_first)
  }

  private def finish(filled: DataFrame, probeCols: Seq[String],
                     payloadCols: Seq[String]): DataFrame =
    filled.where(col("__probe") === 1)
      .select(probeCols.map(col) ++
        payloadCols.map(c => col("__m").getField(c).as(c)): _*)

  /** @param probes     left side; all its columns are preserved
    * @param quotes     right side; all its columns except `key` come back
    *                   as the matched payload (null when no quote at or
    *                   before the probe)
    * @param key        equi-join key column, same name on both sides; all
    *                   other column names must be disjoint (alias first)
    * @param probeTime  event-time column on `probes`
    * @param quoteTime  event-time column on `quotes` (distinct name)
    * @param tieBreak   quote column breaking equal-timestamp ties (max wins)
    */
  def backward(probes: DataFrame, quotes: DataFrame,
               key: String, probeTime: String, quoteTime: String,
               tieBreak: String): DataFrame =
    directional(probes, quotes, key, probeTime, quoteTime, tieBreak,
      ascending = true)

  /** Forward as-of: attach the EARLIEST quote with `quoteTime >=
    * probeTime` (the "next event after" / time-to-conversion shape).
    * Same plan and tie rule as [[backward]], walking time descending.
    */
  def forward(probes: DataFrame, quotes: DataFrame,
              key: String, probeTime: String, quoteTime: String,
              tieBreak: String): DataFrame =
    directional(probes, quotes, key, probeTime, quoteTime, tieBreak,
      ascending = false)

  private def directional(probes: DataFrame, quotes: DataFrame,
                          key: String, probeTime: String, quoteTime: String,
                          tieBreak: String, ascending: Boolean): DataFrame = {
    val tg = tagUnion(probes, quotes, key, probeTime, quoteTime, tieBreak)
    val carry = Window.partitionBy(col(key))
      .orderBy(eventOrder(ascending): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    finish(
      tg.unioned.withColumn("__m",
        last(col("__payload"), ignoreNulls = true).over(carry)),
      tg.probeCols, tg.payloadCols)
  }

  /** [[backward]] for HOT keys: identical result, but no window ever
    * holds a whole key. Time is split into `epochMicros`-wide epochs and
    * the fill becomes two phases (the same shape as the two-phase
    * scalable row number):
    *
    *   1. LOCAL fill: the running-`last` window partitioned by
    *      (key, epoch) — a hot key now spreads over as many tasks as it
    *      spans epochs;
    *   2. CARRY: per (key, epoch), the epoch's FINAL quote payload
    *      (`max_by` aggregate — also (key, epoch)-partitioned), then a
    *      running `last` over the tiny one-row-per-(key, epoch) slot
    *      table, shifted one epoch back (frame up to -1), propagating
    *      across quote-less epochs. That window partitions by key over
    *      #epochs rows — bounded by timespan/epochWidth, not row count;
    *   3. final payload = coalesce(local, carried) joined back on
    *      (key, epoch) — equi join, broadcastable (slot-table-sized).
    *
    * Pick `epochMicros` so a single (key, epoch) slice fits a task
    * comfortably (e.g. a day for billions-of-rows-per-key streams).
    * Works on TIMESTAMP or integral time columns.
    */
  def backwardEpoched(probes: DataFrame, quotes: DataFrame,
                      key: String, probeTime: String, quoteTime: String,
                      tieBreak: String, epochMicros: Long): DataFrame = {
    require(epochMicros > 0, s"epoch width must be positive: $epochMicros")
    val tg = tagUnion(probes, quotes, key, probeTime, quoteTime, tieBreak)
    val tNum = tg.unioned.schema("__t").dataType match {
      case TimestampType => unix_micros(col("__t"))
      case _ => col("__t").cast(LongType)
    }
    // decimal floor: true floor for pre-epoch times, no double ulp slip
    val u = tg.unioned.withColumn("__epoch",
      floor(tNum.cast(DecimalType(20, 0)) / lit(epochMicros)).cast(LongType))

    val wLocal = Window.partitionBy(col(key), col("__epoch"))
      .orderBy(eventOrder(ascending = true): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.withColumn("__local",
      last(col("__payload"), ignoreNulls = true).over(wLocal))

    // one row per (key, epoch) seen in the data; __elast = that epoch's
    // final quote payload (null where the epoch has no quote)
    val epochLast = u.where(col("__probe") === 0)
      .groupBy(col(key), col("__epoch"))
      .agg(max_by(col("__payload"), struct(col("__t"), col("__tie")))
        .as("__elast"))
    val slots = u.select(col(key), col("__epoch")).distinct()
      .join(epochLast, Seq(key, "__epoch"), "left")
    val wCarry = Window.partitionBy(col(key)).orderBy(col("__epoch"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = slots
      .withColumn("__carried", last(col("__elast"), ignoreNulls = true).over(wCarry))
      .select(col(key), col("__epoch"), col("__carried"))

    finish(
      local.join(carried, Seq(key, "__epoch"), "left")
        .withColumn("__m", coalesce(col("__local"), col("__carried"))),
      tg.probeCols, tg.payloadCols)
  }
}
