package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom-filter manifest for POINT-lookup file skipping — the
  * complement of [[ZoneMapLayout]]'s min/max boxes.
  *
  * A min/max zone map prunes only predicates correlated with the
  * layout: a table laid out by date answers "orderkey = 4242" by
  * opening every file, because each file's orderkey [min, max] spans
  * essentially the whole domain (verified on the fixture: all 8
  * date-ranged files cover ~[0, n)). A per-file Bloom filter of the
  * lookup key has no such correlation requirement — a point probe
  * keeps only the files whose filter MIGHT contain the key (expected
  * files-kept ≈ hits + fpp x filesTotal), regardless of layout. This
  * is the Iceberg/Delta/Parquet `bloom_filter` column-index idea
  * lifted to the manifest plane, where it prunes BEFORE listing or
  * footer-reading any file.
  *
  * No false negatives (BloomFilter's contract), so pruned-read ≡
  * plain-scan-and-filter exactly; false positives cost only an extra
  * file read that the residual predicate then empties. Same
  * driver-budget discipline as [[ZoneMapLayout.prunedRead]]: the
  * manifest is filtered DISTRIBUTED (the membership test runs in the
  * manifest scan, deserializing each file's filter once per manifest
  * row), counts are checked first, and only a bounded survivor list is
  * ever collected.
  *
  * The reference has no layout/index plane (its engine delegates
  * storage to Postgres b-trees); this is a scale extension.
  */
object BloomIndexLayout {

  /** Typed aggregate building one BloomFilter per group (per file).
    * BloomFilter is Serializable and mergeable (`mergeInPlace`), so
    * partial aggregation composes; the finished buffer serializes to
    * the manifest as bytes.
    */
  private class BloomAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[Long, BloomFilter, Array[Byte]] {
    def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    def reduce(b: BloomFilter, a: Long): BloomFilter = { b.putLong(a); b }
    def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
      { a.mergeInPlace(b); a }
    def finish(r: BloomFilter): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      r.writeTo(out)
      out.toByteArray
    }
    def bufferEncoder: Encoder[BloomFilter] =
      Encoders.javaSerialization[BloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Write `df` range-laid-out by `layoutCol` into ~`nFiles` files and
    * persist a `_bloomidx/` manifest: one (file, filter-bytes) row per
    * data file, filter over `keyCol` (integral). Like the zone map,
    * two passes: the clustered write, then one scan building the
    * per-file filters (the stand-in for harvesting them at commit
    * time). The manifest write itself is distributed — at millions of
    * files it is a table, not a driver artifact.
    */
  def writeBloomIndexed(df: DataFrame, path: String, keyCol: String,
                        layoutCol: String, nFiles: Int,
                        expectedItemsPerFile: Long = 1 << 20,
                        fpp: Double = 0.01): Unit = {
    df.repartitionByRange(nFiles, col(layoutCol))
      .sortWithinPartitions(layoutCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new BloomAgg(expectedItemsPerFile, fpp).toColumn
    spark.read.parquet(path)
      .select(input_file_name().as("file"),
        col(keyCol).cast("long").as("key"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("bloom"))
      .toDF("file", "bloom")
      .withColumn("key_col", lit(keyCol)) // provenance for refresh guard
      .write.mode(SaveMode.Overwrite).parquet(s"$path/_bloomidx")
  }

  /** Incremental manifest maintenance for APPEND-ONLY tables (the
    * warehouse's append-by-batch layer): build Bloom filters ONLY for
    * data files not yet in the manifest and append their rows —
    * per-batch cost is O(new files' bytes), never a table rescan.
    * Returns (filesAdded, filesTotal).
    *
    * File identity is the unique part-file basename, so the
    * input_file_name() rendering in manifest rows and the listing's
    * URI form cannot drift. The file LISTS touch the driver — the same
    * metadata plane Spark's own FileIndex already holds for any scan
    * of this table, so this adds no new driver-memory class.
    *
    * Loud guard instead of silent wrongness: if the manifest names a
    * file the table no longer has (the table was OVERWRITTEN, not
    * appended), pruned reads could route probes to vanished files, so
    * this fails with a rebuild instruction rather than appending on
    * top of a stale manifest.
    */
  def refreshIndex(spark: SparkSession, path: String, keyCol: String,
                   expectedItemsPerFile: Long = 1 << 20,
                   fpp: Double = 0.01): (Int, Int) = {
    import spark.implicits._
    val idx = s"$path/_bloomidx"
    val allFiles = CompactedLayout.inputFiles(spark, path)
    // ONE manifest read + collect serves both the missing/stale
    // computation and the key-provenance guard (a filter built over a
    // DIFFERENT key column would make point lookups on the original
    // key falsely skip files). Legacy manifests without the key_col
    // column read it as null under mergeSchema; null rows predate the
    // provenance and are exempt from the guard.
    val entries: Array[(String, Option[String])] =
      ManifestRefresh.readManifest(spark, idx) match {
        case None => Array.empty
        case Some(m) if m.columns.contains("key_col") =>
          m.select(col("file"), col("key_col"))
            .as[(String, Option[String])].collect()
        case Some(m) =>
          m.select(col("file")).as[String].collect().map(f => (f, None))
      }
    val badKeys = entries.flatMap(_._2).filter(_ != keyCol).distinct
    require(badKeys.isEmpty,
      s"bloom manifest at $idx was built over key " +
        s"'${badKeys.mkString(",")}', refresh requested '$keyCol' — " +
        "rebuild with writeBloomIndexed to change the key")
    val missing = ManifestRefresh.missingOrStale(allFiles, entries.map(_._1),
      idx, rebuildWith = "writeBloomIndexed")
    val total = allFiles.length
    if (missing.nonEmpty) {
      val agg = new BloomAgg(expectedItemsPerFile, fpp).toColumn
      spark.read.parquet(missing.toIndexedSeq: _*)
        .select(input_file_name().as("file"),
          col(keyCol).cast("long").as("key"))
        .as[(String, Long)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg.name("bloom"))
        .toDF("file", "bloom")
        .withColumn("key_col", lit(keyCol))
        .write.mode(SaveMode.Append).parquet(idx)
    }
    (missing.length, total)
  }

  /** Partition-scoped manifest refresh — the composition of Bloom file
    * skipping with the warehouse's S8 idempotency contract (dynamic
    * partition overwrite): the manifest rows for table partition
    * `partitionCol=value` live under their own manifest partition
    * `_bloomidx/pid=value`, so re-running a batch refreshes exactly
    * that manifest partition the same way the batch re-run overwrites
    * exactly its data partition — every other partition's manifest
    * rows are untouched, and a rerun is idempotent by construction
    * (no stale-file guard needed: the overwrite replaces the rows that
    * could go stale). [[prunedRead]] reads the manifest tree whole and
    * ignores the inferred pid column. One scheme per table: a flat
    * [[writeBloomIndexed]] rebuild replaces the whole `_bloomidx/`
    * directory, partitioned tables maintain it per-partition with
    * this. Returns the number of files indexed in the partition.
    */
  def refreshPartition(spark: SparkSession, path: String,
                       partitionCol: String, value: String, keyCol: String,
                       expectedItemsPerFile: Long = 1 << 20,
                       fpp: Double = 0.01): Int = {
    import spark.implicits._
    // The data path is composed by hand while partitionBy Hive-escapes
    // special characters in partition values — a value needing escaping
    // would read a nonexistent path (or write an unescaped pid dir), so
    // restrict to the escape-free charset and fail loudly otherwise.
    require(value.matches("[A-Za-z0-9_.\\-]+"),
      s"partition value '$value' needs Hive escaping — only " +
        "[A-Za-z0-9_.-] values are supported by refreshPartition")
    // Key provenance must hold across the WHOLE manifest, not just this
    // partition: prunedRead probes every partition's filters with one
    // key, so partitions indexed over different keys would silently
    // drop matching rows. One read; legacy null key_col rows exempt.
    ManifestRefresh.readManifest(spark, s"$path/_bloomidx").foreach { m =>
      if (m.columns.contains("key_col")) {
        val others = m.select(col("key_col")).where(
          col("key_col").isNotNull && col("key_col") =!= keyCol)
          .distinct().as[String].collect()
        require(others.isEmpty,
          s"bloom manifest at $path/_bloomidx has partitions built over " +
            s"key '${others.mkString(",")}', refresh requested '$keyCol' — " +
            "one lookup key per table")
      }
    }
    // the LIVE partition path: the loose dir unless a compaction
    // pointer has committed a generation ([[CompactedLayout]]) — a
    // post-compaction refresh must index the live files, not the
    // parked ones
    val partPath = CompactedLayout.livePartitionPath(
      s"$path/$partitionCol=$value")
    val agg = new BloomAgg(expectedItemsPerFile, fpp).toColumn
    val rows = spark.read.parquet(partPath)
      .select(input_file_name().as("file"),
        col(keyCol).cast("long").as("key"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("bloom"))
      .toDF("file", "bloom")
      .withColumn("key_col", lit(keyCol))
    val idxPart = s"$path/_bloomidx/pid=$value"
    rows.write.mode(SaveMode.Overwrite).parquet(idxPart)
    // count from the written manifest partition — re-counting `rows`
    // would build every Bloom filter a second time
    spark.read.parquet(idxPart).count().toInt
  }

  /** Point-lookup read: `keyCol IN (probes)`, skipping every file whose
    * Bloom filter rules out ALL probe keys. Returns the residual-
    * filtered frame plus (filesKept, filesTotal). Mirrors
    * [[ZoneMapLayout.prunedRead]]'s budget contract: membership tests
    * run distributed over the manifest table; past `maxDriverFiles`
    * survivors the explicit list buys nothing over a directory scan,
    * so the read falls back to the plain path scan (identical rows).
    */
  def prunedRead(spark: SparkSession, path: String, keyCol: String,
                 probes: Seq[Long],
                 maxDriverFiles: Int = 100000): (DataFrame, Int, Int) = {
    import spark.implicits._
    val probeArr = probes.toArray
    val manifest: Dataset[(String, Array[Byte])] =
      spark.read.parquet(s"$path/_bloomidx")
        .select(col("file"), col("bloom")).as[(String, Array[Byte])]
    // Deserializing a file's Bloom filter is the whole cost of the
    // probe (the serialized blob is ~MB-scale at production nExpected),
    // so the membership verdicts are computed in ONE distributed pass
    // and persisted as a tiny (file, keep) projection; the count
    // aggregate and the budget-gated survivor collect below re-scan
    // only that boolean table, never the blobs. Same two-phase budget
    // discipline as [[ZoneMapLayout.prunedRead]]: O(1) count buffers
    // first, the collect_list only once nKept is known to fit the
    // driver budget.
    val flags = manifest.map { case (f, bytes) =>
      val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
      (f, probeArr.exists(bf.mightContainLong))
    }.toDF("file", "keep")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cnt = flags.agg(
        count(lit(1)).as("total"),
        count(when(col("keep"), lit(1))).as("n_kept")).head()
      val total = cnt.getLong(0)
      val nKept = cnt.getLong(1)
      val residual = col(keyCol).isin(probes: _*)
      if (nKept > maxDriverFiles) {
        (CompactedLayout.read(spark, path).where(residual),
          total.toInt, total.toInt)
      } else if (nKept == 0) {
        (CompactedLayout.read(spark, path).limit(0).where(residual),
          0, total.toInt)
      } else {
        val files = flags.where(col("keep"))
          .agg(collect_list(col("file"))).head().getSeq[String](0).toArray
        // basePath keeps directory-inferred partition columns in the
        // schema when reading an explicit leaf-file list (partitioned
        // tables would otherwise return a narrower frame than the
        // fallback's whole-table read)
        (spark.read.option("basePath", path)
          .parquet(files.toIndexedSeq: _*).where(residual),
          files.length, total.toInt)
      }
    } finally flags.unpersist(false)
  }
}
