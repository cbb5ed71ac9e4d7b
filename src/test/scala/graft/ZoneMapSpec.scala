package graft

import graft.sources.ZoneMapLayout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Z-order layout + zone-map pruning: correctness (pruned read ==
  * full-scan filter), the multi-dimensional win (a predicate on the
  * SECOND key prunes files under z-order but not under a linear sort on
  * the first key), and the conservative edge cases.
  */
class ZoneMapSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")
    .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")

  private lazy val zPath = {
    val p = Files.createTempDirectory("zmap").toFile.getAbsolutePath + "/z"
    ZoneMapLayout.writeZordered(li, p,
      zCols = Seq("l_partkey", "l_suppkey"),
      statsCols = Seq("l_partkey", "l_suppkey"), nFiles = 16)
    p
  }
  private lazy val linPath = {
    val p = Files.createTempDirectory("zmap").toFile.getAbsolutePath + "/lin"
    // linear layout = the same machinery with a single z column
    ZoneMapLayout.writeZordered(li, p,
      zCols = Seq("l_partkey"),
      statsCols = Seq("l_partkey", "l_suppkey"), nFiles = 16)
    p
  }

  private def expected(box: Seq[(String, Long, Long)]): Long =
    li.where(box.map { case (c, lo, hi) => col(c).between(lo, hi) }
      .reduce(_ && _)).count()

  test("pruned read equals full-scan filter on a 2-D box") {
    val box = Seq(("l_partkey", 40L, 90L), ("l_suppkey", 2L, 5L))
    val (df, kept, total) = ZoneMapLayout.prunedRead(spark, zPath, box)
    assert(df.count() === expected(box))
    assert(kept < total, s"2-D box should prune ($kept/$total)")
  }

  test("second-dimension predicate prunes under z-order, not under linear sort") {
    // suppkey-only box: the linear layout is sorted by partkey, so every
    // file spans the whole suppkey domain and nothing can be skipped
    val box = Seq(("l_suppkey", 1L, 3L))
    val (zDf, zKept, zTotal) = ZoneMapLayout.prunedRead(spark, zPath, box)
    val (lDf, lKept, lTotal) = ZoneMapLayout.prunedRead(spark, linPath, box)
    assert(zDf.count() === expected(box))
    assert(lDf.count() === expected(box))
    assert(lKept === lTotal, "linear layout cannot prune on the 2nd key")
    assert(zKept < zTotal, s"z-order should prune on the 2nd key ($zKept/$zTotal)")
    assert(zKept < lKept)
  }

  test("first-key predicate prunes under both layouts") {
    val box = Seq(("l_partkey", 1L, 20L))
    val (zDf, zKept, zTotal) = ZoneMapLayout.prunedRead(spark, zPath, box)
    val (lDf, lKept, _) = ZoneMapLayout.prunedRead(spark, linPath, box)
    assert(zDf.count() === expected(box))
    assert(lDf.count() === expected(box))
    assert(zKept < zTotal && lKept < zTotal)
  }

  test("box outside the domain keeps zero files and returns no rows") {
    val box = Seq(("l_partkey", 1000000L, 2000000L))
    val (df, kept, _) = ZoneMapLayout.prunedRead(spark, zPath, box)
    assert(kept === 0)
    assert(df.count() === 0)
  }

  test("refreshIndex appends stats only for new files; stale manifests fail") {
    import org.apache.spark.sql.SaveMode
    val p = Files.createTempDirectory("zmap").toFile.getAbsolutePath + "/inc"
    val half1 = li.where(col("l_orderkey") % 2 === 0)
    val half2 = li.where(col("l_orderkey") % 2 === 1)
    ZoneMapLayout.writeZordered(half1, p,
      zCols = Seq("l_partkey"), statsCols = Seq("l_partkey"), nFiles = 4)
    half2.repartition(3).write.mode(SaveMode.Append).parquet(p)
    val (added, total) =
      ZoneMapLayout.refreshIndex(spark, p, Seq("l_partkey"))
    assert(added === 3 && total === 7, s"got $added/$total")
    assert(ZoneMapLayout.refreshIndex(spark, p, Seq("l_partkey")) === ((0, 7)))
    // refreshed manifest prunes across old and new files, exactly
    val box = Seq(("l_partkey", 40L, 90L))
    val (df, kept, nTotal) = ZoneMapLayout.prunedRead(spark, p, box)
    assert(nTotal === 7)
    assert(df.count() ===
      li.where(col("l_partkey").between(40L, 90L)).count())
    assert(kept <= nTotal)
    // a different stats-column set would append NULL-stat rows that
    // prunedRead silently treats as non-intersecting → loud fail
    val colsEx = intercept[IllegalArgumentException](
      ZoneMapLayout.refreshIndex(spark, p, Seq("l_suppkey")))
    assert(colsEx.getMessage.contains("stats"))
    // a vanished data file → loud fail, not a read routed at it
    val victim = new java.io.File(p).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).head
    assert(victim.delete())
    val ex = intercept[IllegalStateException](
      ZoneMapLayout.refreshIndex(spark, p, Seq("l_partkey")))
    assert(ex.getMessage.contains("rebuild"))
  }

  test("survivor list past the driver budget falls back to the plain scan") {
    // a whole-domain box keeps every file; with maxDriverFiles below the
    // file count the read must degrade to the path scan (identical rows,
    // no skip reported) instead of shipping the full list to the driver
    val box = Seq(("l_partkey", 0L, 1000000L))
    val (df, kept, total) = ZoneMapLayout.prunedRead(spark, zPath, box,
      maxDriverFiles = 4)
    assert(total > 4, "fixture has too few files to exercise the cap")
    assert(kept === total, "fallback must report no skip")
    assert(df.count() === expected(box))
    // exactly at the budget the explicit list is still used (boundary)
    val (df2, kept2, total2) = ZoneMapLayout.prunedRead(spark, zPath, box,
      maxDriverFiles = total)
    assert(kept2 === total2)
    assert(df2.count() === expected(box))
  }
}
