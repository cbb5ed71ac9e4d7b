package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
  * Scale notes: a window partition holds ALL rows of one key, so a
  * pathologically hot key serializes into one task (same property as any
  * PARTITION BY — if keys are few and huge, pre-split time into coarse
  * epochs and stitch the per-epoch boundary state). Quote payload is
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
               tieBreak: String): DataFrame = {
    val probeCols = probes.columns.toSeq
    val payloadCols = quotes.columns.toSeq.filterNot(_ == key)
    require(probeCols.intersect(payloadCols).isEmpty,
      s"probe/quote columns must be disjoint apart from '$key'; " +
        s"overlap: ${probeCols.intersect(payloadCols).mkString(", ")}")

    val payloadType = StructType(quotes.schema.fields.filterNot(_.name == key))
    val tieType = quotes.schema(tieBreak).dataType

    val taggedProbes = probes
      .withColumn("__t", col(probeTime))
      .withColumn("__probe", lit(1))
      .withColumn("__tie", lit(null).cast(tieType))
      .withColumn("__payload", lit(null).cast(payloadType))

    val taggedQuotes = quotes
      .withColumn("__t", col(quoteTime))
      .withColumn("__probe", lit(0))
      .withColumn("__tie", col(tieBreak))
      .withColumn("__payload", struct(payloadCols.map(col): _*))
      .select(Seq(col(key), col("__t"), col("__probe"), col("__tie"),
        col("__payload")) ++
        probeCols.filterNot(_ == key).map(c =>
          lit(null).cast(probes.schema(c).dataType).as(c)): _*)

    val carry = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__probe").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedProbes.unionByName(taggedQuotes)
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(carry))
      .where(col("__probe") === 1)
      .select(probeCols.map(col) ++
        payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }
}
