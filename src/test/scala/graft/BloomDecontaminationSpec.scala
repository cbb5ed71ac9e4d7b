package graft

import graft.functions.SketchFunctions._
import graft.functions.TextHashDefaults.{WinB, WinK, WinP, WinW}
import graft.functions.TextHashFunctions.winnowedFingerprints
import graft.queries.TextQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom-prefiltered decontamination must (a) return exactly the
  * broadcast-exact path's rows, and (b) actually prune: the map-side
  * might_contain must pass only a small superset of the true overlap —
  * otherwise the sketch is vacuous and the "no broadcast of benchmark
  * rows" scale story is fiction.
  */
class BloomDecontaminationSpec extends AnyFunSuite with SparkTestBase {

  test("bloom path equals exact path; prefilter prunes non-benchmark fps") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = TextQueries.queries("q_text_decontaminate")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val bloom = TextQueries.queries("q_text_decontaminate_bloom")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(bloom === exact, dir)
      assert(exact.exists(_._3), s"$dir: no contaminated doc — vacuous")

      // pruning: rebuild the sketch the query's way and measure the
      // candidate fraction among fingerprints that do NOT hit the bench
      val fps = Tables.t(spark, dir, "documents").select(col("doc_id"),
        explode(winnowedFingerprints(col("text"),
          WinK, WinW, WinB, WinP)).as("fp"))
      val bench = fps.where(col("doc_id") % 100 === 7)
        .select(col("fp")).distinct()
      val n = bench.count()
      val blob = bench.agg(bloomFilterAgg(col("fp"), n, n * 10))
        .head.getAs[Array[Byte]](0)
      val miss = fps.join(bench, Seq("fp"), "left_anti")
      val missTotal = miss.count()
      val missPassed = miss.where(mightContain(blob, col("fp"))).count()
      assert(missTotal > 0, s"$dir: every fingerprint hits the benchmark")
      // ~1% expected at 10 bits/item; 10% is a generous red line
      assert(missPassed * 10 < missTotal,
        s"$dir: bloom passed $missPassed of $missTotal non-benchmark fps")
    }
  }

  test("auto pick: broadcast under the budget, bloom above it, same rows") {
    import graft.queries.TextQueries.{decontaminate, DecontamAuto, DecontamBroadcast}
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    def physPlan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val expected = rows(TextQueries.queries("q_text_decontaminate")(spark, dir))

    // the forced-broadcast pin: identical verdicts, no bloom prefilter
    val forced = decontaminate(spark, dir, DecontamBroadcast)
    assert(!physPlan(forced).contains("might_contain"))
    assert(rows(forced) === expected)

    // default budget (10 MB): the tiny benchmark set fits -> row broadcast
    val small = decontaminate(spark, dir, DecontamAuto)
    assert(!physPlan(small).contains("might_contain"),
      "auto picked bloom although the benchmark fits the broadcast budget")

    // shrink the budget below rows x FpRowBytes: same call flips to bloom
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
      val big = decontaminate(spark, dir, DecontamAuto)
      assert(physPlan(big).contains("might_contain"),
        "auto kept broadcasting rows past the budget")
      assert(rows(big) === expected, "bloom pick changed the verdicts")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
