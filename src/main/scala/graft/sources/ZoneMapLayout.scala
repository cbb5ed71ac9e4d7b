package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.Column

/** Multi-dimensional data layout + file-level zone-map pruning.
  *
  * A 100 TB table sorted on one key prunes scans on THAT key only; a
  * predicate on any other column touches every file. Interleaving the
  * bits of several keys into one Morton/Z-value (Morton 1966 — the
  * clustering trick behind Delta/Iceberg `ZORDER BY`) and range-
  * partitioning on it gives every indexed column locality, so a file
  * covers a small hyper-rectangle of the key space and a selective
  * predicate on ANY indexed column intersects few files.
  *
  * The zone map is the manifest face of the same idea: one tiny table of
  * per-file min/max for the indexed columns, written next to the data
  * (`_zonemap/`, underscore-prefixed so data scans ignore it, like
  * _SUCCESS). [[prunedRead]] resolves a conjunctive range predicate
  * against the zone map FIRST — a driver-side metadata operation bounded
  * by file count, exactly what Iceberg/Delta manifests mechanize — and
  * hands Spark only the intersecting files, then re-applies the exact
  * predicate as the residual. Parquet row-group stats give a similar
  * skip per file at read time, but only AFTER listing and opening every
  * footer; at millions of files the listing itself is the bottleneck,
  * which is what a persisted zone map removes.
  *
  * The reference has no layout plane at all (its engine scans whole
  * tables; pruning is DB-internal) — this is a scale extension, not a
  * ported operator.
  */
object ZoneMapLayout {

  /** Bit-interleave of pre-scaled non-negative values (each in
    * [0, 2^bits)): bit j of input i lands at position j*n + i. Plain
    * shift/mask Catalyst expressions — codegen-friendly, no UDF.
    */
  private def interleave(scaled: Seq[Column], bits: Int): Column = {
    val n = scaled.size
    val terms = for {
      j <- 0 until bits
      i <- 0 until n
    } yield shiftleft(shiftright(scaled(i), j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Scale a long column from [lo, hi] onto the [0, 2^bits) lattice.
    * Double arithmetic (IEEE-deterministic) with an explicit clamp; a
    * null input yields a null z-value, which range-partitions into the
    * null bucket and never matches a range predicate — conservative on
    * both the write and prune sides.
    */
  private def scaleTo(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    val levels = (1L << bits).toDouble
    val range = math.max(1L, hi - lo + 1).toDouble
    least(lit((1L << bits) - 1),
      floor((c.cast(DoubleType) - lit(lo.toDouble)) * (levels / range))
        .cast(LongType))
  }

  /** Write `df` clustered by the Z-value of `zCols` (integral-typed)
    * into ~`nFiles` range partitions, and persist a `_zonemap/` manifest
    * of per-file min/max for `statsCols`. Two passes over the batch:
    * the clustered write, then one scan of the written files to collect
    * stats (the portable stand-in for harvesting parquet footer stats at
    * commit time, which is what a production writer would do — same
    * one-extra-pass rationale as Orchestrator.compactBatches).
    */
  def writeZordered(df: DataFrame, path: String, zCols: Seq[String],
                    statsCols: Seq[String], nFiles: Int,
                    bits: Int = 16): Unit = {
    require(zCols.nonEmpty && bits * zCols.size <= 62,
      s"bit budget exceeded: $bits bits x ${zCols.size} cols")
    val mmAggs = zCols.flatMap(c => Seq(
      min(col(c)).cast(LongType).as(s"lo_$c"),
      max(col(c)).cast(LongType).as(s"hi_$c")))
    val mm = df.agg(mmAggs.head, mmAggs.tail: _*).head()
    val z = interleave(zCols.zipWithIndex.map { case (c, i) =>
      scaleTo(col(c).cast(LongType),
        mm.getLong(2 * i), mm.getLong(2 * i + 1), bits)
    }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
    val spark = df.sparkSession
    val statAggs = statsCols.flatMap(c => Seq(
      min(col(c)).cast(LongType).as(s"lo_$c"),
      max(col(c)).cast(LongType).as(s"hi_$c")))
    // The manifest is itself a distributed parquet TABLE (no
    // coalesce(1)): at millions of data files it is GBs of min/max rows,
    // and both its write here and the prune-side filter read scale out.
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(statAggs.head, statAggs.tail: _*)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/_zonemap")
  }

  /** Read `path` under a conjunctive range predicate, skipping every
    * file whose zone-map box does not intersect it. Returns the residual-
    * filtered frame plus (filesKept, filesTotal) as the skip evidence.
    *
    * The prune is a DISTRIBUTED filter over the manifest table; only the
    * SURVIVING file list is materialized on the driver — the same
    * planning-time contract as Iceberg/Delta, where the driver holds the
    * pruned scan-task list, never the full manifest. Driver memory is
    * bounded TWICE: by predicate selectivity (a selective box at 100 TB
    * keeps thousands of files) and, for the degenerate case where
    * (almost) nothing prunes, by `maxDriverFiles` — past it the explicit
    * file list buys nothing over a directory scan, so the read falls
    * back to the plain path scan (+ the same residual filter; identical
    * rows) and reports (filesTotal, filesTotal): no skip happened, and
    * the driver never holds a corpus-scale file list.
    */
  /** Incremental zone-map maintenance for APPEND-ONLY tables — the
    * min/max twin of [[BloomIndexLayout.refreshIndex]]: stats are
    * computed only for data files the manifest does not name yet and
    * appended, so per-batch cost is the new files' bytes, never a
    * table rescan. Appended batches are not z-clustered against the
    * existing layout (their boxes may span wider ranges and prune
    * less — correctness is unaffected; re-cluster with writeZordered
    * when skip rates degrade). File identity is the part-file
    * basename; a manifest naming a vanished file (overwrite or
    * compaction without a rebuild) fails loudly. Returns
    * (filesAdded, filesTotal).
    */
  def refreshIndex(spark: SparkSession, path: String,
                   statsCols: Seq[String]): (Int, Int) = {
    import spark.implicits._
    val idx = s"$path/_zonemap"
    val allFiles = CompactedLayout.inputFiles(spark, path)
    // ONE manifest read serves the missing/stale computation and the
    // schema guard: appending rows with a DIFFERENT stats-column set
    // would leave the old columns NULL on the new rows; prunedRead's
    // intersects predicate evaluates NULL there, the count treats the
    // file as non-intersecting, and matching rows silently vanish from
    // pruned reads.
    val haveFiles: Array[String] =
      ManifestRefresh.readManifest(spark, idx) match {
        case None => Array.empty
        case Some(m) =>
          val have = m.columns.toSet
          val want = Set("file") ++
            statsCols.flatMap(c => Seq(s"lo_$c", s"hi_$c"))
          require(have == want,
            s"zone-map manifest at $idx has columns ${have.toSeq.sorted}, " +
              s"refresh requested ${want.toSeq.sorted} — rebuild with " +
              "writeZordered to change the stats columns")
          m.select(col("file")).as[String].collect()
      }
    val missing = ManifestRefresh.missingOrStale(allFiles, haveFiles,
      idx, rebuildWith = "writeZordered")
    val total = allFiles.length
    if (missing.nonEmpty) {
      val statAggs = statsCols.flatMap(c => Seq(
        min(col(c)).cast(LongType).as(s"lo_$c"),
        max(col(c)).cast(LongType).as(s"hi_$c")))
      spark.read.parquet(missing.toIndexedSeq: _*)
        .groupBy(input_file_name().as("file"))
        .agg(statAggs.head, statAggs.tail: _*)
        .write.mode(SaveMode.Append).parquet(idx)
    }
    (missing.length, total)
  }

  def prunedRead(spark: SparkSession, path: String,
                 box: Seq[(String, Long, Long)],
                 maxDriverFiles: Int = 100000): (DataFrame, Int, Int) = {
    val zm = spark.read.parquet(s"$path/_zonemap")
    val intersects = box.map { case (c, lo, hi) =>
      col(s"lo_$c") <= hi && col(s"hi_$c") >= lo
    }.reduce(_ && _)
    // Pass 1: counts only — O(1) aggregation buffers at any manifest
    // size. Pass 2 collects the survivor list ONLY when it fits the
    // driver budget, so the collect_list buffer is bounded by
    // maxDriverFiles names by construction (a single-pass
    // collect_list would buffer EVERY survivor in one executor's
    // aggregate before any cap applied). The manifest is a small
    // metadata table, so the second scan is planning-time noise.
    val cnt = zm.agg(
      count(lit(1)).as("total"),
      count(when(intersects, lit(1))).as("n_kept")).head()
    val total = cnt.getLong(0)
    val nKept = cnt.getLong(1)
    val residual = box.map { case (c, lo, hi) =>
      col(c).between(lo, hi)
    }.reduce(_ && _)
    if (nKept > maxDriverFiles) {
      // degenerate prune: survivors at listing scale — plain scan
      (CompactedLayout.read(spark, path).where(residual),
        total.toInt, total.toInt)
    } else if (nKept == 0) {
      (CompactedLayout.read(spark, path).limit(0).where(residual),
        0, total.toInt)
    } else {
      val files = zm.where(intersects)
        .agg(collect_list(col("file"))).head().getSeq[String](0).toArray
      // basePath keeps directory-inferred partition columns in the
      // schema when reading an explicit leaf-file list (partitioned
      // tables would otherwise return a narrower frame than the
      // fallback's whole-table read)
      (spark.read.option("basePath", path)
        .parquet(files.toIndexedSeq: _*).where(residual),
        files.length, total.toInt)
    }
  }
}
