package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared listing/staleness core of the incremental manifest refreshes
  * ([[BloomIndexLayout.refreshIndex]], [[ZoneMapLayout.refreshIndex]],
  * [[BloomIndexLayout.refreshPartition]] callers).
  *
  * File identity is the unique part-file BASENAME, so the
  * `input_file_name()` rendering stored in manifest rows and the
  * listing's URI form cannot drift. The file lists touch the driver —
  * the same metadata plane Spark's own FileIndex already holds for any
  * scan of the table, so this adds no new driver-memory class.
  */
private[graft] object ManifestRefresh {

  private[graft] def base(p: String): String =
    p.substring(p.lastIndexOf('/') + 1)

  /** True iff the manifest directory exists. */
  private[graft] def indexExists(spark: SparkSession, idx: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(idx)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** The manifest as a DataFrame, or None when it is ABSENT or exists
    * but holds no readable parquet data (a crashed manifest write that
    * left only _temporary/_SUCCESS — no rows exist to duplicate, so
    * treating it as absent self-heals). Any OTHER read failure
    * (corrupt footer on real data, FS blip) PROPAGATES: swallowing it
    * would rebuild every filter and append on top of the existing
    * rows, and the duplicated (file, ...) entries would make pruned
    * reads scan survivors twice — silently wrong results. mergeSchema
    * keeps column presence deterministic across manifest files written
    * before/after a schema addition (e.g. key_col provenance).
    */
  private[graft] def readManifest(spark: SparkSession,
                                  idx: String): Option[DataFrame] =
    if (!indexExists(spark, idx)) None
    else try Some(spark.read.option("mergeSchema", "true").parquet(idx))
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.toLowerCase.contains("unable to infer") =>
        None
    }

  /** Files of `allFiles` missing from the manifest's `haveFiles`,
    * compared by basename. Loud on STALE manifest entries (the table
    * was overwritten or compacted, not appended): pruned reads would
    * otherwise route probes at vanished files.
    */
  private[graft] def missingOrStale(allFiles: Array[String],
                                    haveFiles: Iterable[String],
                                    idx: String,
                                    rebuildWith: String): Array[String] = {
    val allBase = allFiles.map(base).toSet
    val haveBase = haveFiles.map(base).toSet
    val stale = haveBase.diff(allBase)
    if (stale.nonEmpty) throw new IllegalStateException(
      s"manifest at $idx names ${stale.size} file(s) the table no longer " +
        s"has (table overwritten, not appended) — rebuild with $rebuildWith " +
        "instead of refreshIndex")
    allFiles.filterNot(f => haveBase(base(f)))
  }
}
