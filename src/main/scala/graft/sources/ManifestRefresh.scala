package graft.sources

import org.apache.spark.sql.SparkSession

/** Shared listing/staleness core of the incremental manifest refreshes
  * ([[BloomIndexLayout.refreshIndex]], [[ZoneMapLayout.refreshIndex]]).
  *
  * File identity is the unique part-file BASENAME, so the
  * `input_file_name()` rendering stored in manifest rows and the
  * listing's URI form cannot drift. The file lists touch the driver —
  * the same metadata plane Spark's own FileIndex already holds for any
  * scan of the table, so this adds no new driver-memory class.
  */
private[sources] object ManifestRefresh {

  private[sources] def base(p: String): String =
    p.substring(p.lastIndexOf('/') + 1)

  /** True iff the manifest directory exists. Deliberately NOT a
    * catch-all around the read: a manifest that exists but fails to
    * read (corrupt footer, FS blip) must PROPAGATE — treating it as
    * absent would rebuild every filter and append on top of the
    * existing rows, and the duplicated (file, ...) rows would make
    * pruned reads scan survivors twice (silently wrong results).
    */
  private[sources] def indexExists(spark: SparkSession, idx: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(idx)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** (filesMissingFromManifest, filesTotal) for the append-only table
    * at `path` against its manifest at `path/idxSubdir`. Loud on stale
    * manifest entries (the table was overwritten or compacted, not
    * appended): pruned reads would otherwise route probes at vanished
    * files.
    */
  private[sources] def missingFiles(spark: SparkSession, path: String,
                                    idxSubdir: String,
                                    rebuildWith: String): (Array[String], Int) = {
    import spark.implicits._
    val idx = s"$path/$idxSubdir"
    val allFiles = spark.read.parquet(path).inputFiles
    val allBase = allFiles.map(base).toSet
    val haveBase: Set[String] =
      if (!indexExists(spark, idx)) Set.empty
      else spark.read.parquet(idx)
        .select(org.apache.spark.sql.functions.col("file")).as[String]
        .collect().map(base).toSet
    val stale = haveBase.diff(allBase)
    if (stale.nonEmpty) throw new IllegalStateException(
      s"manifest at $idx names ${stale.size} file(s) the table no longer " +
        s"has (table overwritten, not appended) — rebuild with $rebuildWith " +
        "instead of refreshIndex")
    (allFiles.filterNot(f => haveBase(base(f))), allFiles.length)
  }
}
