package graft.sources

import graft.run.WarehouseFs
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pointer-committed compaction layout — small-file compaction that is
  * atomic on EVERY store, object stores included, by never renaming a
  * directory. The generation-pointer discipline the ANN index plane
  * committed through ([[graft.run.Orchestrator]]'s `rebuildAnnIndex`),
  * applied per PARTITION:
  *
  *  - a never-compacted partition's files sit loose in its partition
  *    dir (generation 0 — the layout every writer produces);
  *  - compaction STAGES the rewritten files into a hidden generation
  *    dir `<part>/.cgen/g<N>/` (invisible to any reader — Spark's file
  *    listing skips dot-dirs) and COMMITS by atomically publishing the
  *    tiny pointer file `<part>/_compact_gen` = N
  *    ([[WarehouseFs.publishAtomic]] — atomic-replace on rename stores
  *    AND object stores). A reader resolves old or new, never absent
  *    or torn, and a crash mid-staging leaves the live layout
  *    untouched;
  *  - the previous layout (loose files or the prior generation dir) is
  *    PARKED as the in-flight-reader grace window and garbage-collected
  *    later through the vacuum plane (`vacuumCompacted`), mirroring the
  *    ANN plane's previous-generation retention;
  *  - a RE-LAND of the partition (S8 dynamic partition overwrite)
  *    deletes the whole partition directory — pointer, generations and
  *    all (verified behavior of Spark's dynamic-overwrite commit) — so
  *    a replayed batch reverts cleanly to loose generation-0 files.
  *
  * Read routing: tables that have ever been compacted carry a
  * root-level marker (`_compact_layout`, published BEFORE the first
  * pointer), so [[read]] costs never-compacted tables exactly ONE
  * existence probe and then plans the plain directory scan — byte-for-
  * byte the pre-compaction plan. Compacted tables are read as one
  * parquet relation over the per-partition LIVE paths with
  * `basePath=root`: directory-inferred partition columns and native
  * PartitionFilters pruning survive the explicit path list (Spark's
  * partition parser skips the non-kv `.cgen/gNNNNNN` levels — verified
  * on 4.1.2), so `WHERE dwh_batch_id = ...` still prunes at planning.
  *
  * External readers: a plain `spark.read.parquet(root)` sees the
  * parked loose files — content-identical until the grace window is
  * GC'd (compaction is content-preserving), EMPTY for that partition
  * after. The warehouse contract already routes every reader through
  * the resolver (`Orchestrator.Run.readTable` and the index planes);
  * `vacuumCompacted`'s doc restates it.
  *
  * 100 TB notes: resolution is one root listing + one pointer probe
  * per partition — the same metadata-plane order as Spark's own file
  * listing for any scan of the table; nothing is per-file and nothing
  * touches data bytes. The pointer files are O(bytes) each.
  */
object CompactedLayout {

  /** Root marker: published once, before the table's first pointer —
    * readers that see no marker take the plain-scan fast path.
    */
  def markerPath(root: String): String = s"$root/_compact_layout"

  /** The per-partition commit pointer. Content: the live generation's
    * DIR NAME under `.cgen/` (e.g. `g000002-3fa9c1d0`) — name, not
    * number, because staging dirs are UNIQUELY named: two compactors
    * racing on an advisory-lock store then stage into DIFFERENT dirs
    * and the loser's abort can never have clobbered the winner's
    * committed bytes (the Iceberg unique-data-file discipline).
    */
  def pointerPath(partDir: String): String = s"$partDir/_compact_gen"

  /** The compactor/GC mutual-exclusion lock for the whole table —
    * real on local/HDFS/conditional-create stores
    * ([[WarehouseFs.createExclusive]]), advisory elsewhere, where the
    * unique staging names + pre-commit re-checks are the backstop.
    */
  def lockPath(root: String): String = s"$root/_compact_lock"

  /** A FRESH uniquely-named staging dir name for generation `g`. */
  def genDirName(g: Long): String =
    f"g$g%06d-" + java.util.UUID.randomUUID().toString.take(8)

  /** Generation number encoded in a gen dir name ("g000002-x" → 2). */
  def genNumber(name: String): Long = {
    val ds = name.drop(1).takeWhile(_.isDigit)
    if (ds.isEmpty) 0L else ds.toLong
  }

  /** The live generation's dir NAME, if a pointer has committed one. */
  def liveGenName(partDir: String): Option[String] =
    if (WarehouseFs.exists(pointerPath(partDir)))
      Some(WarehouseFs.readString(pointerPath(partDir)).trim)
    else None

  /** Live generation NUMBER of a partition: 0 = loose (no pointer). */
  def liveGen(partDir: String): Long =
    liveGenName(partDir).map(genNumber).getOrElse(0L)

  /** The directory whose parquet files ARE the partition right now. */
  def livePartitionPath(partDir: String): String =
    liveGenName(partDir) match {
      case Some(n) => s"$partDir/.cgen/$n"
      case None => partDir
    }

  def isCompacted(root: String): Boolean =
    WarehouseFs.exists(markerPath(root))

  /** Publish the root marker if absent — called BEFORE the first
    * pointer commit so no reader can hold a pointer-blind plan while a
    * pointer exists. Idempotent (publishAtomic replaces like content).
    */
  def ensureMarker(root: String): Unit = {
    // benign publish race: concurrent compactors (two compactors on an
    // advisory-lock store; the compactBatches pool publishes ONCE on
    // the dispatching thread, but cross-JVM racers remain) can both
    // pass the !isCompacted check, and on a ChecksumFs the loser's
    // rename can throw mid-overwrite — in a window where the winner's
    // overwrite has deleted-but-not-yet-renamed the marker, so a
    // single post-hoc isCompacted probe can read ABSENT while both
    // publishers are about to land it (seen once under the r20 bench:
    // "._compact_layout.crc already exists" escaped the old one-shot
    // guard). The marker's content is the constant "1", so the loser
    // just needs the marker to EXIST: re-check-and-retry a bounded
    // number of times; only a marker still absent after the retries is
    // a real store failure.
    // The attempts bound guards the SUCCESS path too: a store that acks
    // publishAtomic without landing the marker must surface as a loud
    // failure, not an infinite re-publish spin.
    var attempts = 0
    while (!isCompacted(root)) {
      attempts += 1
      if (attempts > 3)
        throw new IllegalStateException(
          s"ensureMarker: marker still absent after ${attempts - 1} " +
            s"publish attempts at ${markerPath(root)} — the store is " +
            "acking publishAtomic without landing the marker")
      try WarehouseFs.publishAtomic(markerPath(root), "1")
      catch {
        case _: Throwable if attempts < 3 => () // racing publisher; re-probe
        case e: Throwable if isCompacted(root) => ()
      }
    }
  }

  /** The table's `key=value` partition directories (the resolver's
    * unit of routing). Hidden/metadata dirs (`_bloomidx`, `.cgen`
    * at root — there is none, but be safe) are not partitions.
    */
  def partitionDirs(root: String): Seq[String] =
    WarehouseFs.list(root)
      .filter(d => d.isDirectory && {
        val n = d.getPath.getName
        n.contains("=") && !n.startsWith("_") && !n.startsWith(".")
      })
      .map(_.getPath.toString)
      .sorted

  /** The resolver read — THE way to read a possibly-compacted table.
    * Never-compacted tables (no marker) cost one existence probe and
    * plan the identical plain scan; compacted tables read the
    * per-partition live paths as ONE relation with basePath-inferred
    * partition columns (native pruning intact).
    */
  def read(spark: SparkSession, root: String,
           mergeSchema: Boolean = false): DataFrame = {
    def reader = {
      val r = spark.read
      if (mergeSchema) r.option("mergeSchema", "true") else r
    }
    if (!isCompacted(root)) reader.parquet(root)
    else {
      val parts = partitionDirs(root)
      if (parts.isEmpty) reader.parquet(root)
      else reader.option("basePath", root)
        .parquet(parts.map(livePartitionPath): _*)
    }
  }

  /** Resolver-aware file inventory (the `inputFiles` every manifest
    * refresh compares against) — live files only, parked files never.
    */
  def inputFiles(spark: SparkSession, root: String): Array[String] =
    read(spark, root).inputFiles
}
