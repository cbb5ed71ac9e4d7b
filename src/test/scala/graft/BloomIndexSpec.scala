package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.BloomIndexLayout

/** BloomIndexLayout contracts:
  *  - no false negatives: the pruned read returns EXACTLY the plain
  *    filtered scan's rows, for present and absent probe keys alike;
  *  - the skip is real where a min/max zone map is blind: on the
  *    date-laid-out table an orderkey probe keeps a small fraction of
  *    files (each file's orderkey [min,max] spans ~the whole domain,
  *    so a range manifest would keep ALL of them);
  *  - the driver-budget fallback reads the same rows while reporting
  *    no skip.
  */
class BloomIndexSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.01"
  private val path = "/tmp/graft_bloomspec_idx"

  private def ensureLayout(): Unit =
    if (!new java.io.File(s"$path/_bloomidx").exists())
      BloomIndexLayout.writeBloomIndexed(
        Tables.t(spark, dir, "orders"), path,
        keyCol = "o_orderkey", layoutCol = "o_orderdate",
        nFiles = 16, expectedItemsPerFile = 1 << 16)

  test("pruned read equals plain filter; absent keys prune to nothing") {
    ensureLayout()
    val probes = Seq(3L, 99L, 1234L, 999999999L) // last one absent
    val (df, kept, total) =
      BloomIndexLayout.prunedRead(spark, path, "o_orderkey", probes)
    val got = df.select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    val want = Tables.t(spark, dir, "orders")
      .where(col("o_orderkey").isin(probes: _*))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq)
    assert(kept <= total)

    // a definitely-absent key keeps zero files (bloom "definitely not")
    val (none, kept0, total0) =
      BloomIndexLayout.prunedRead(spark, path, "o_orderkey",
        Seq(888888888L))
    assert(kept0 === 0 && total0 === total)
    assert(none.count() === 0L)
  }

  test("the skip is real where min/max is blind") {
    ensureLayout()
    val (_, kept, total) =
      BloomIndexLayout.prunedRead(spark, path, "o_orderkey", Seq(4242L))
    assert(total === 16, s"expected 16 files, got $total")
    // one present key: expected files = 1 + fpp*total ≈ 1; allow slack
    assert(kept <= 4, s"bloom kept $kept/$total files for one key")
    // min/max blindness on the same layout: every file's orderkey
    // range contains the probe, so a zone map would keep all 16
    val spans = spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
      .where(col("lo") <= 4242L && col("hi") >= 4242L)
      .count()
    assert(spans === 16L,
      s"fixture no longer blinds min/max (kept $spans) — test premise broken")
  }

  test("refreshIndex builds filters only for appended files; stale manifests fail loudly") {
    import org.apache.spark.sql.SaveMode
    val p = "/tmp/graft_bloomspec_refresh_" +
      ProcessHandle.current().pid()
    val orders = Tables.t(spark, dir, "orders")
    val half1 = orders.where(col("o_orderkey") % 2 === 0)
    val half2 = orders.where(col("o_orderkey") % 2 === 1)
    BloomIndexLayout.writeBloomIndexed(half1, p,
      keyCol = "o_orderkey", layoutCol = "o_orderdate",
      nFiles = 4, expectedItemsPerFile = 1 << 16)
    // append a batch of new files, then refresh: only they get filters
    half2.repartition(3)
      .write.mode(SaveMode.Append).parquet(p)
    val (added, total) =
      BloomIndexLayout.refreshIndex(spark, p, "o_orderkey",
        expectedItemsPerFile = 1 << 16)
    assert(added === 3 && total === 7,
      s"expected 3 new of 7 total, got $added/$total")
    // idempotent: nothing new on a second refresh
    assert(BloomIndexLayout.refreshIndex(spark, p, "o_orderkey") === ((0, 7)))
    // the refreshed manifest prunes across old AND new files, exactly
    val probes = Seq(4L, 7L, 999999999L)
    val (df, kept, nTotal) =
      BloomIndexLayout.prunedRead(spark, p, "o_orderkey", probes)
    assert(nTotal === 7 && kept < 7)
    val got = df.select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    val want = orders.where(col("o_orderkey").isin(probes: _*))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq)
    // refreshing over a DIFFERENT key column would build filters that
    // falsely skip files on the original key → loud fail
    val keyEx = intercept[IllegalArgumentException](
      BloomIndexLayout.refreshIndex(spark, p, "o_custkey"))
    assert(keyEx.getMessage.contains("key"))
    // a data file vanishing out from under the manifest (compaction /
    // overwrite without a manifest rebuild) → loud fail, not a pruned
    // read routed at a missing file
    val victim = new java.io.File(p).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).head
    assert(victim.delete())
    val ex = intercept[IllegalStateException](
      BloomIndexLayout.refreshIndex(spark, p, "o_orderkey"))
    assert(ex.getMessage.contains("rebuild"))
  }

  test("partition-scoped manifests survive an idempotent batch overwrite") {
    import org.apache.spark.sql.SaveMode
    val p = "/tmp/graft_bloomspec_part_" + ProcessHandle.current().pid()
    val orders = Tables.t(spark, dir, "orders")
    val b1 = orders.where(col("o_orderkey") % 2 === 0)
    val b2 = orders.where(col("o_orderkey") % 2 === 1)
    b1.repartition(3).write.parquet(s"$p/b=1")
    b2.repartition(3).write.parquet(s"$p/b=2")
    assert(BloomIndexLayout.refreshPartition(spark, p, "b", "1",
      "o_orderkey", expectedItemsPerFile = 1 << 16) === 3)
    assert(BloomIndexLayout.refreshPartition(spark, p, "b", "2",
      "o_orderkey", expectedItemsPerFile = 1 << 16) === 3)
    val probes = Seq(4L, 7L, 999999999L)
    def prunedKeys() = {
      val (df, kept, total) =
        BloomIndexLayout.prunedRead(spark, p, "o_orderkey", probes)
      (df.select(col("o_orderkey")).collect().map(_.getLong(0)).sorted.toSeq,
        kept, total)
    }
    val want = orders.where(col("o_orderkey").isin(probes: _*))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted.toSeq
    val (got1, kept1, total1) = prunedKeys()
    assert(got1 === want && total1 === 6 && kept1 < 6)
    // the pruned read keeps the inferred partition column (basePath)
    val (dfB, _, _) =
      BloomIndexLayout.prunedRead(spark, p, "o_orderkey", Seq(4L))
    assert(dfB.columns.contains("b"),
      "explicit-file pruned read lost the partition column")
    // one lookup key per table: a partition refresh over a different
    // key would silently drop rows from probes on the original key
    val keyEx = intercept[IllegalArgumentException](
      BloomIndexLayout.refreshPartition(spark, p, "b", "2", "o_custkey"))
    assert(keyEx.getMessage.contains("one lookup key"))
    // partition values needing Hive escaping are rejected loudly
    val escEx = intercept[IllegalArgumentException](
      BloomIndexLayout.refreshPartition(spark, p, "b", "2:x", "o_orderkey"))
    assert(escEx.getMessage.contains("escaping"))
    // batch-2 re-run: overwrite ITS data partition with a different
    // file layout, then refresh ITS manifest partition — batch 1's
    // manifest rows are untouched and probes stay exact
    b2.repartition(2).write.mode(SaveMode.Overwrite).parquet(s"$p/b=2")
    assert(BloomIndexLayout.refreshPartition(spark, p, "b", "2",
      "o_orderkey", expectedItemsPerFile = 1 << 16) === 2)
    val (got2, _, total2) = prunedKeys()
    assert(got2 === want && total2 === 5,
      s"expected 5 manifest rows after the 2-file rerun, got $total2")
  }

  test("driver-budget fallback returns identical rows with no skip") {
    ensureLayout()
    val probes = Seq(3L, 99L)
    val (df, kept, total) =
      BloomIndexLayout.prunedRead(spark, path, "o_orderkey", probes,
        maxDriverFiles = 0)
    assert(kept === total, "fallback must report no skip")
    val got = df.select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    val want = Tables.t(spark, dir, "orders")
      .where(col("o_orderkey").isin(probes: _*))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq)
  }
}
