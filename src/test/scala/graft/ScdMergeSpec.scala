package graft

import graft.run.Orchestrator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Date

/** Key-bucketed SCD merge (Orchestrator.mergeScd1/mergeScd2): the
  * copy-on-write contract — untouched bucket directories are
  * byte-identical after a merge, change detection drops CDC no-op
  * re-emits, replays are no-ops, duplicate-key batches fail loudly
  * before writing.
  */
class ScdMergeSpec extends AnyFunSuite with SparkTestBase {

  private val NB = 8

  private def snapshot(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"seg_${i % 3}")).toDF("k", "segment")
  }

  /** (fileName -> (size, mtime)) per kb= partition dir. */
  private def layout(root: String): Map[String, Map[String, (Long, Long)]] = {
    val dirs = Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("kb="))
    dirs.map { d =>
      d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    }.toMap
  }

  test("mergeScd2: COW rewrites only changed buckets; versions, inserts, noops") {
    val wh = Files.createTempDirectory("scd2").toFile.getAbsolutePath
    val run = new Orchestrator.Run(spark, wh, "B1")
    assert(run.initScdDim("gold/dim_seg", snapshot(40), "k",
      Date.valueOf("2026-01-01"), NB) === 40L)
    val before = layout(s"$wh/gold/dim_seg")
    assert(before.keySet.size > 2, "fixture must spread over several buckets")

    import spark.implicits._
    // k=3, k=11 genuinely change; k=100 is an insert; k=5 is a no-op re-emit
    val updates = Seq(
      (3L, "CHANGED"), (11L, "CHANGED"), (100L, "NEW"),
      (5L, s"seg_${5 % 3}")).toDF("k", "segment")
    val st = run.mergeScd2("gold/dim_seg", updates, "k", Seq("segment"),
      Date.valueOf("2026-06-15"), NB)
    assert(st.inserted === 1L && st.versioned === 2L && st.noops === 1L)

    val after = layout(s"$wh/gold/dim_seg")
    val changedDirs = st.touched.map(b => s"kb=$b").toSet
    assert(changedDirs.nonEmpty && changedDirs.subsetOf(after.keySet))
    // every bucket not holding a change is byte-identical (names, sizes,
    // mtimes) — the COW contract
    for ((dir, files) <- before if !changedDirs.contains(dir))
      assert(after(dir) === files, s"$dir was rewritten without a change")

    val dim = spark.read.parquet(s"$wh/gold/dim_seg")
    assert(dim.count() === 43) // 40 + 2 closed-version rows + 1 insert
    val k3 = dim.where(col("k") === 3).orderBy("valid_from")
      .select("segment", "valid_to", "is_current").collect()
    assert(k3.map(_.getString(0)).toSeq === Seq("seg_0", "CHANGED"))
    assert(k3.map(_.getBoolean(2)).toSeq === Seq(false, true))
    assert(k3.head.getDate(1) === Date.valueOf("2026-06-14"))
    val k100 = dim.where(col("k") === 100).collect()
    assert(k100.length === 1 && k100.head.getAs[String]("segment") === "NEW")
    // the no-op key stays a single untouched version-1 row
    assert(dim.where(col("k") === 5).count() === 1)
    assert(dim.where(col("k") === 5 && col("is_current")).count() === 1)

    // replay of the same batch: all rows are now no-ops — zero writes
    val again = layout(s"$wh/gold/dim_seg")
    val st2 = run.mergeScd2("gold/dim_seg", updates, "k", Seq("segment"),
      Date.valueOf("2026-06-15"), NB)
    assert(st2.touched.isEmpty && st2.inserted === 0L && st2.versioned === 0L)
    assert(st2.noops === 4L)
    assert(layout(s"$wh/gold/dim_seg") === again, "replay must not rewrite")
  }

  test("mergeScd1: bootstrap, upsert with version bump, COW, replay no-op") {
    val wh = Files.createTempDirectory("scd1").toFile.getAbsolutePath
    val run = new Orchestrator.Run(spark, wh, "B1")
    import spark.implicits._
    val st0 = run.mergeScd1("gold/dim_flat", snapshot(40), "k",
      Seq("segment"), NB)
    assert(st0.inserted === 40L)
    val before = layout(s"$wh/gold/dim_flat")

    val updates = Seq((7L, "MOVED"), (100L, "NEW"),
      (5L, s"seg_${5 % 3}")).toDF("k", "segment")
    val st = run.mergeScd1("gold/dim_flat", updates, "k", Seq("segment"), NB)
    assert(st.inserted === 1L && st.versioned === 1L && st.noops === 1L)
    val after = layout(s"$wh/gold/dim_flat")
    val changedDirs = st.touched.map(b => s"kb=$b").toSet
    for ((dir, files) <- before if !changedDirs.contains(dir))
      assert(after(dir) === files, s"$dir was rewritten without a change")

    val dim = spark.read.parquet(s"$wh/gold/dim_flat")
    assert(dim.count() === 41) // SCD1 keeps one row per key
    val k7 = dim.where(col("k") === 7).collect().head
    assert(k7.getAs[String]("segment") === "MOVED")
    assert(k7.getAs[Long]("merge_version") === 2L)
    assert(dim.where(col("k") === 5).collect()
      .head.getAs[Long]("merge_version") === 1L)

    val st2 = run.mergeScd1("gold/dim_flat", updates, "k", Seq("segment"), NB)
    assert(st2.touched.isEmpty && st2.noops === 3L)
    assert(layout(s"$wh/gold/dim_flat") === after, "replay must not rewrite")
  }

  test("scdMergeSink: streaming CDC apply with per-batch keep-latest and noop replays") {
    val wh = Files.createTempDirectory("scdstream").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("scdcp").toFile.getAbsolutePath
    val run = new Orchestrator.Run(spark, wh, "B0")
    run.initScdDim("gold/dim_seg", snapshot(20), "k",
      Date.valueOf("2026-01-01"), NB)

    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Date, Long)]
    val q = graft.streaming.StreamingJobs.scdMergeSink(
      ms.toDF().toDF("k", "segment", "eff", "seq"),
      wh, "gold/dim_seg", "k", Seq("segment"), "seq", "eff", cp)
    try {
      // two changes for k=3 in one micro-batch: only the seq-latest
      // ("Y") may become the new version; k=50 is an insert
      ms.addData((3L, "X", Date.valueOf("2026-06-15"), 1L),
        (3L, "Y", Date.valueOf("2026-06-15"), 2L),
        (50L, "NEW", Date.valueOf("2026-06-15"), 1L))
      q.processAllAvailable()
      val dim = spark.read.parquet(s"$wh/gold/dim_seg")
      assert(dim.count() === 22) // 20 + closed k=3 + insert k=50
      val k3 = dim.where(col("k") === 3 && col("is_current"))
        .collect().map(_.getAs[String]("segment")).toSeq
      assert(k3 === Seq("Y"), "keep-latest must pick the max-seq change")
      assert(dim.where(col("k") === 50).count() === 1)

      // a re-emit of already-applied values is a noop: no new versions,
      // no file rewrites
      val before = layout(s"$wh/gold/dim_seg")
      ms.addData((3L, "Y", Date.valueOf("2026-06-20"), 3L))
      q.processAllAvailable()
      assert(layout(s"$wh/gold/dim_seg") === before,
        "replayed values must not rewrite")
      assert(spark.read.parquet(s"$wh/gold/dim_seg").count() === 22)
    } finally q.stop()
  }

  test("duplicate keys in the change batch fail loudly before any write") {
    val wh = Files.createTempDirectory("scddup").toFile.getAbsolutePath
    val run = new Orchestrator.Run(spark, wh, "B1")
    run.initScdDim("gold/dim_seg", snapshot(10), "k",
      Date.valueOf("2026-01-01"), NB)
    val before = layout(s"$wh/gold/dim_seg")
    import spark.implicits._
    val dup = Seq((3L, "A"), (3L, "B")).toDF("k", "segment")
    val e = intercept[IllegalArgumentException] {
      run.mergeScd2("gold/dim_seg", dup, "k", Seq("segment"),
        Date.valueOf("2026-06-15"), NB)
    }
    assert(e.getMessage.contains("duplicate"))
    assert(layout(s"$wh/gold/dim_seg") === before,
      "a rejected batch must leave the table untouched")
  }
}
