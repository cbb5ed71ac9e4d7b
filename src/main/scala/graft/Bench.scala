package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout.
  *
  * Measurement discipline: results are materialized through the noop
  * sink (`format("noop")`) — a bare `.count()` lets Catalyst prune every
  * unreferenced projection column, so expression-heavy queries would be
  * mostly unmeasured. A warmup query runs first (untimed) so the first
  * timed query doesn't absorb session/codegen/JIT startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warmup: one join-heavy query, untimed.
    try run("q_surrogate_lookup") catch { case _: Throwable => () }

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      try run(name) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Locale-pinned number formatting: the f-interpolator uses the
    // default locale, which under a comma-decimal JVM would emit
    // "value":54,588 and break the JSON.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // The driver captures only the tail of stdout, so the JSON line must
    // stay short: report the headline subset per-query (3 dp) while the
    // headline total still covers every registered query via "value".
    val headline = Seq(
      "q_scan_pruned", "q_join_enrich", "q_surrogate_lookup",
      "q_agg_pricing_summary", "q_window_topk_per_group", "q_recursive_chain",
      "q_events_sessionize", "q_dedup_exact", "q_dedup_minhash_lsh",
      "q_dedup_ngram_jaccard", "q_dedup_embedding", "q_sim_cosine_topk",
      "q_sim_ann_lsh", "q_ref_fact_sales", "q_ref_mv_top3_month_country",
      "q_text_quality", "q_text_clean_corpus", "q_write_idempotent",
      "q_dedup_components", "q_dedup_jaccard_ppjoin", "q_pack_sequences",
      "q_sim_ann_recall")
    val byName = results.toMap
    def dict(entries: Seq[(String, Double)]): String =
      entries.map { case (n, v) => s""""$n":${num(v)}""" }.mkString("{", ",", "}")
    val qs = dict(headline.flatMap(n => byName.get(n).map(n -> _)))
    val total = results.map(_._2).sum
    val totalJson =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","n_queries":${results.size},"queries":$qs,"sf":"$sfDir"}"""
    println(totalJson)
    // Full per-query dict to a file so round-over-round diffs cover every
    // query, not just the stdout-tail-safe headline subset.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      s"""{"metric":"total","value":${num(total)},"unit":"sec","n_queries":${results.size},"queries":${dict(results)},"sf":"$sfDir"}""".getBytes("UTF-8"))
    spark.stop()
  }
}
