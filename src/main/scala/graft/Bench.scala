package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout.
  *
  * Measurement discipline: results are materialized through the noop
  * sink (`format("noop")`) — a bare `.count()` lets Catalyst prune every
  * unreferenced projection column, so expression-heavy queries would be
  * mostly unmeasured. A warmup query runs first (untimed) so the first
  * timed query doesn't absorb session/codegen/JIT startup. Each query
  * then runs SPARK_GRAFT_BENCH_RUNS times (default 3): the FIRST run is
  * a per-query warm-up EXCLUDED from the stats (it pays plan-local
  * codegen/file-listing/JIT that r12 showed as spread > median on
  * trivial aggregates), the rest report the MEDIAN with the max-min
  * spread beside it: single-run timings whipsawed up to 4.5x across
  * rounds on same-code queries (box drift amplified on short queries),
  * burning review cycles on phantom regressions. Any row whose spread
  * still exceeds its median is named in "unstable" — a do-not-compare
  * marker for round-over-round diffs. q_ref_* queries run once — they
  * memoize the reference fixture per session, so their re-runs would
  * time the cache, not the query.
  */
object Bench {

  /** Cross-sf scaling guard: a query whose time grew more than
    * `slack x dataRatio` when the data grew `dataRatio`x is flagged as
    * super-linear — the only empirical 100x signal available with no
    * sf > 0.1 on disk. Pure so BenchScalingSpec can prove a seeded
    * quadratic (t ~ n^2: ratio 100 at dataRatio 10) trips the flag while
    * linear and constant-overhead queries don't. slack absorbs the
    * documented ~2x cross-run box variance; at toy scale fixed overheads
    * dominate, so real ratios sit well BELOW dataRatio and the flag only
    * fires on genuinely super-linear growth.
    */
  def superLinear(tSmall: Map[String, Double], tBig: Map[String, Double],
                  dataRatio: Double, slack: Double = 1.5): Map[String, Double] = {
    val floor = 0.05 // below timing resolution: ratios are pure noise
    tBig.flatMap { case (n, big) =>
      tSmall.get(n).collect {
        case small if small >= floor && big / small > dataRatio * slack =>
          n -> big / small
      }
    }
  }

  /** The stdout-tail-safe per-query subset: reported individually in
    * the bench JSON, re-timed by the cross-sf scaling pass, and linted
    * post-execution (AQE-final plan) by PlanLintSpec.
    */
  val headline: Seq[String] = Seq(
    "q_scan_pruned", "q_join_enrich", "q_surrogate_lookup",
    "q_agg_pricing_summary", "q_window_topk_per_group", "q_recursive_chain",
    "q_events_sessionize", "q_dedup_exact", "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard", "q_dedup_embedding", "q_sim_cosine_topk",
    "q_sim_ann_lsh", "q_ref_fact_sales", "q_ref_mv_top3_month_country",
    "q_text_quality", "q_text_clean_corpus", "q_write_idempotent",
    "q_dedup_components", "q_dedup_jaccard_ppjoin", "q_pack_sequences",
    "q_sim_ann_recall", "q_sim_ann_multiprobe_recall",
    "q_join_asof", "q_join_asof_epoch",
    "q_join_range_binned", "q_text_decontaminate_bloom",
    "q_dedup_incremental", "q_agg_hll_merge", "q_agg_kll_merge",
    "q_events_retention", "q_window_ntile_deciles", "q_text_source_overlap",
    "q_events_funnel_stages", "q_join_bucketed", "q_compact_files",
    "q_agg_heavy_hitters", "q_sample_temperature",
    "q_text_repeated_ngrams", "q_text_dup_spans", "q_text_entropy",
    "q_text_lm_perplexity", "q_events_transitions", "q_text_bpe_encode",
    "q_agg_exact_median", "q_sample_pps_systematic", "q_events_top_paths",
    "q_pack_bins", "q_multimodal_dedup", "q_text_hash_embed",
    // r13 blind spot: the heaviest rows were absent from the scaling
    // subset — exactly how r11's 38.7x flag stayed hidden.
    // q_ref_mv_delayed_chain_seeded stays q_ref_-excluded from ratios
    // (it pins the fixture regardless of dir) but its median is now a
    // tracked headline number.
    "q_dedup_cluster_pick", "q_text_retrieval_eval", "q_split_leakage_safe",
    "q_ref_mv_delayed_chain_seeded",
    // r14 rows: strip is among the slowest rows, so it joins the
    // scaling subset immediately (the r13 lesson); quartiles and the
    // PCA projection are cheap but new — tracked from day one.
    "q_text_strip_dup_spans", "q_agg_exact_quartiles", "q_embed_pca_project",
    "q_dedup_containment", "q_scan_xml", "q_dedup_containment_sketch",
    "q_text_dup_spans_incremental", "q_agg_exact_mad", "q_qa_drift_chi2",
    "q_sim_pq_distortion", "q_text_gopher_rules", "q_text_top_ngram_mass",
    "q_agg_exact_weighted_median", "q_dedup_minhash_est_eval",
    "q_text_chunk_hash_embed", "q_agg_robust_outliers",
    // r14 second wave: tracked from day one
    "q_sample_dsir", "q_text_quality_calibrated", "q_join_range_window",
    "q_text_ccnet_buckets", "q_sample_dsir_eval",
    "q_window_trailing_scalable",
    // r15 rows: tracked from day one
    "q_dedup_fuzzy_join", "q_dedup_fuzzy_cluster", "q_graph_pagerank",
    "q_text_fuzzy_distance", "q_dedup_fuzzy_incremental",
    "q_graph_pagerank_weighted", "q_graph_pagerank_personalized",
    "q_dedup_fuzzy_canonical", "q_graph_host_gate",
    // r16 rows: tracked from day one
    "q_graph_pagerank_dangling", "q_sim_knn_graph",
    "q_sim_knn_graph_recall", "q_pack_bestfit", "q_pack_bestfit_waste",
    "q_scan_excel_many", "q_graph_hits", "q_dedup_knn_mutual",
    "q_dedup_semantic_incremental",
    // r17 row: tracked from day one
    "q_dedup_semantic_incr_probe_eval",
    // r17 second wave: tracked from day one (kcore/triangles are the
    // heaviest of the wave — the r13 lesson says they join the scaling
    // subset immediately)
    "q_graph_triangles", "q_graph_kcore", "q_graph_lpa",
    "q_events_gapfill", "q_sim_ann_sq", "q_sim_ann_sq_recall",
    "q_multimodal_audio_energy", "q_profile_table",
    "q_agg_correlations",
    // r18 rows: tracked from day one (core numbers is the new heaviest
    // graph row — the ladder pays every rung's peel)
    "q_graph_core_numbers", "q_graph_lpa_modularity",
    "q_graph_core_gate", "q_graph_lpa_refined",
    // r19 rows: tracked from day one
    "q_graph_louvain", "q_multimodal_neardup", "q_multimodal_neardup_recall",
    "q_multimodal_neardup_canonical",
    // r20 rows: per-query medians + scaling ratios tracked from birth
    // (the r19c close-out-coverage lesson)
    "q_graph_louvain_phases", "q_multimodal_phash_ab",
    "q_multimodal_neardup_incremental", "q_multimodal_neardup_phash")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // r21, guide §2.2/§9: let AQE size CACHED plans by bytes too.
      // Spark's default (false) freezes a cached frame at the raw
      // shuffle.partitions width, so every re-read of a persisted
      // edge list / memoized index scans `cpus` near-empty partitions
      // per round at small scale — and at production scale AQE keeps
      // the width the bytes demand, so the setting is scale-neutral
      // (it only ever coalesces what is measurably tiny).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runAt(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    def run(name: String): Unit = runAt(name, sfDir)

    // SPARK_GRAFT_BENCH_RUNS (default 3) = executions per query: one
    // per-query WARM-UP excluded from the stats + the rest timed. r12
    // showed first-run costs this plan-local warm-up absorbs (codegen,
    // file listing, JIT for THIS plan) inflating spreads past medians
    // on trivial aggregates; the global warm-up query can't absorb
    // per-plan costs.
    val benchRuns = math.max(2,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    // (median, max-min spread, all-runs-succeeded) over the timed runs;
    // q_ref_* memoize the fixture per session, so they get exactly one
    // run, no warm-up (a warm-up would leave every timed run a cache hit)
    def timed(name: String, dir: String): (Double, Double, Boolean) = {
      var ok = true
      def one(): Double = {
        val t0 = System.nanoTime()
        try runAt(name, dir) catch { case _: Throwable => ok = false }
        (System.nanoTime() - t0) / 1e9
      }
      if (name.startsWith("q_ref_")) return (one(), 0.0, ok)
      one() // warm-up, excluded
      if (!ok) return (0.0, 0.0, false) // failed warm-up: timed runs would too
      val ts = (1 until benchRuns).map(_ => one()).sorted
      val med = if (ts.size % 2 == 1) ts(ts.size / 2)
                else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2
      (med, ts.last - ts.head, ok)
    }

    // Warmup: one join-heavy query, untimed.
    try run("q_surrogate_lookup") catch { case _: Throwable => () }

    // Pre-build session-memoized artifacts untimed, same rationale as
    // the warmup: bucketized tables, the corpus dedup indexes, trained
    // centroids/assignments, and the reference silver/gold chain all
    // model PERSISTED warehouse state (built once by a pipeline, probed
    // by queries), so timed runs should measure the probe. Doing it
    // here — instead of letting run 1 of the owning query pay the build
    // — keeps every timed run homogeneous: the median no longer excludes
    // a one-time cost that run 1 absorbed, and round-over-round diffs
    // can't misread that asymmetry as a speedup.
    def prewarm(dir: String, refToo: Boolean): Unit = {
      val memoized = Seq("q_join_bucketed", "q_dedup_incremental",
        "q_sim_ann_ivf_trained", "q_dedup_semantic",
        // builds BOTH memoized dedup frames (LSH candidate pairs + the
        // star-contraction component table) that cluster_pick /
        // leakage-safe-split / minhash_lsh then probe
        "q_dedup_components",
        // builds the memoized duplicated-window frame (the persisted
        // span-report artifact) the report + removal rows both probe
        "q_text_dup_spans",
        // builds the memoized exact-containment verdict frame the
        // exact + sketch rows both probe
        "q_dedup_containment",
        // builds the memoized DSIR bucket histogram + weight table
        // (the two once-per-snapshot artifacts selection/eval probe)
        "q_sample_dsir",
        // builds the memoized per-doc bigram-LM score table the
        // perplexity + ccnet-tercile rows both probe
        "q_text_lm_perplexity",
        // builds the memoized master variant index (the persisted
        // entity-resolution blocking table) the incremental fuzzy
        // match probes
        "q_dedup_fuzzy_incremental",
        // builds the memoized fuzzy pair frame the join + cluster
        // rows both consume
        "q_dedup_fuzzy_join",
        // builds the memoized cluster table (canonical re-attachment
        // probes it) and the memoized host rank table (the gate row
        // probes it)
        "q_dedup_fuzzy_cluster", "q_graph_pagerank",
        // builds the memoized kNN-graph edge frame the recall and
        // mutual-cluster rows both probe
        "q_sim_knn_graph",
        // builds the memoized corpus-trained centroids + corpus list
        // assignments (the persisted vector-dedup index) the
        // incremental semantic row probes
        "q_dedup_semantic_incremental",
        // builds the memoized SQ8-coded corpus (the train-once range
        // model) the search + recall rows both probe
        "q_sim_ann_sq",
        // builds the memoized source-graph triangle counts (the
        // persisted graph_triangle_counts stand-in) the gate probes
        "q_graph_linkfarm_gate",
        // builds the memoized round-4 LPA labeling (the persisted
        // communities artifact stand-in) the modularity + refined
        // rows probe, and the memoized source-graph core numbers the
        // core gate probes
        "q_graph_lpa", "q_graph_core_gate") ++
        (if (refToo) Seq("q_ref_fact_sales") else Nil)
      memoized.foreach(n => try runAt(n, dir) catch { case _: Throwable => () })
    }
    prewarm(sfDir, refToo = true)

    val stats = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val (med, spr, ok) = timed(name, sfDir)
      (name, med, spr, ok)
    }
    // a failing query is NAMED, never timed: its time-to-exception
    // would read as a phantom speedup in round-over-round diffs (the
    // same fabrication rule the scaling pass has always applied)
    val errored = stats.collect { case (n, _, _, false) => n }
    val results = stats.collect { case (n, med, _, true) => n -> med }
    val spreads = stats.collect { case (n, _, spr, true) => n -> spr }
    // Timing-sanity flag: a row whose max-min spread exceeds its median
    // (above the timing-resolution floor) is box noise, not plan cost —
    // round-over-round perf conclusions must not be drawn from it. r12
    // drew phantom 40-70x "regressions" from exactly such rows.
    val unstable = stats.collect {
      case (n, med, spr, true) if med >= 0.05 && spr > med => n
    }
    // Locale-pinned number formatting: the f-interpolator uses the
    // default locale, which under a comma-decimal JVM would emit
    // "value":54,588 and break the JSON.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // The driver captures only the tail of stdout, so the JSON line must
    // stay short: report the headline subset per-query (3 dp) while the
    // headline total still covers every registered query via "value".
    val byName = results.toMap
    def dict(entries: Seq[(String, Double)]): String =
      entries.map { case (n, v) => s""""$n":${num(v)}""" }.mkString("{", ",", "}")
    val qs = dict(headline.flatMap(n => byName.get(n).map(n -> _)))
    val total = results.map(_._2).sum

    // Cross-sf scaling pass: re-time the headline queries on the 10x
    // smaller sibling dataset and record per-query time ratios + the
    // super-linear flags. q_ref_* are excluded: they pin the reference
    // fixture regardless of dir AND memoize silver/gold per session, so
    // their small-pass time is cache-hit noise, not a scaling signal.
    val smallDir = sys.env.get("SPARK_GRAFT_SCALING_DIR")
      .orElse(if (sfDir.endsWith("sf0.1")) Some(sfDir.stripSuffix("sf0.1") + "sf0.01")
              else None)
      .filter(d => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)))
    val scaling = smallDir.map { dir =>
      val scalingNames = headline.filterNot(_.startsWith("q_ref_"))
      try runAt("q_surrogate_lookup", dir) catch { case _: Throwable => () }
      prewarm(dir, refToo = false)
      // a failed small-sf run is EXCLUDED (and named in "errors"), never
      // timed: recording time-to-exception would fabricate a ratio and
      // could flag a query that didn't run as super-linear. Medians on
      // both sides so one noisy run can't fabricate a ratio either.
      val attempts = scalingNames.map { name =>
        val (med, _, ok) = timed(name, dir)
        (name, med, ok)
      }
      val tSmall = attempts.collect { case (n, t, true) => n -> t }.toMap
      val errors = attempts.collect { case (n, _, false) => n }
      val tBig = scalingNames.flatMap(n => byName.get(n).map(n -> _)).toMap
      val ratios = scalingNames.flatMap(n =>
        for (s <- tSmall.get(n); b <- tBig.get(n)) yield n -> b / math.max(s, 1e-3))
      val flagged = superLinear(tSmall, tBig, dataRatio = 10.0)
      def names(ns: Seq[String]) =
        ns.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
      (s""","scaling":{"small_sf":"$dir","data_ratio":10,"flagged":${
        names(flagged.keys.toSeq)},"errors":${names(errors)
      },"ratios":${dict(ratios)}}""", flagged.size, errors.size,
        flagged.keys.toSeq, errors)
    }
    val scalingJson = scaling.map(_._1).getOrElse("")

    // Lifecycle-plane timing (run/LifecycleBench): the land → cadence
    // refresh → gates → ANN rebuild → vacuum walk, per-stage seconds —
    // the maintenance ops BENCH's query rows never execute. A dead walk
    // is NAMED ("lifecycle_error"), never silently absent, and never
    // timed (the errored-query fabrication rule).
    val lifecycleWalks =
      sys.env.getOrElse("SPARK_GRAFT_LIFECYCLE_RUNS", "2").toInt
    val lifecycle: Either[String, Seq[(String, Double)]] =
      if (lifecycleWalks <= 0) Left("disabled")
      else try Right(graft.run.LifecycleBench.run(spark, sfDir, lifecycleWalks))
      catch { case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    // Lifecycle scaling (the query rows' sf-ratio discipline applied to
    // the maintenance plane): re-walk the lifecycle on the 10x smaller
    // sibling, record per-stage ratios, and flag super-linear stages
    // through the SAME superLinear rule (BenchScalingSpec-proven) the
    // query pass uses — the refresh stage (seven whole-graph fixpoint
    // artifacts) is the plausible future regression site, and without
    // this block it could go quadratic invisibly. A dead small walk is
    // NAMED ("lifecycle_scaling_error"), never timed.
    val lifecycleScalingJson = (lifecycle, smallDir) match {
      case (Right(big), Some(dir)) =>
        try {
          val small = graft.run.LifecycleBench
            .run(spark, dir, lifecycleWalks).toMap
          val tBig = big.toMap
          val ratios = graft.run.LifecycleBench.Stages
            .flatMap(s => for (sm <- small.get(s); bg <- tBig.get(s))
              yield s -> bg / math.max(sm, 1e-3))
          val flagged = superLinear(small, tBig, dataRatio = 10.0)
          val names = flagged.keys.toSeq.sorted
            .map("\"" + _ + "\"").mkString("[", ",", "]")
          s""","lifecycle_scaling":{"small_sf":"$dir","data_ratio":10,""" +
            s""""flagged":$names,"ratios":${dict(ratios)}}"""
        } catch { case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .take(200).replaceAll("[\"\\\\\\n\\r\\t]", " ")
          s""","lifecycle_scaling_error":"$msg""""
        }
      case _ => ""
    }
    val lifecycleJson = (lifecycle match {
      case Right(stages) => s""","lifecycle":${dict(stages)}"""
      case Left("disabled") => ""
      case Left(msg) =>
        s""","lifecycle_error":"${msg.replaceAll("[\"\\\\\\n\\r\\t]", " ")}""""
    }) + lifecycleScalingJson

    // "queries" stays name->median (same shape as every prior round);
    // "spread" carries max-min over the runs so a flaky timing is
    // visible as data instead of whipsawing the median across rounds.
    // The stdout line reports spread only where it is material
    // (>= 0.25 s — the flaky ones) to stay inside the driver's
    // stdout-tail capture; the file artifact keeps every entry.
    val sprByName = spreads.toMap
    val sprHead = dict(headline.flatMap(n =>
      sprByName.get(n).filter(_ >= 0.25).map(n -> _)))
    // stdout stays tail-safe: cap the unstable list (count is the signal);
    // the file artifact keeps every name.
    def nameArr(ns: Seq[String]) =
      ns.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val errJson = nameArr(errored)
    val unstableHead =
      s""""n_unstable":${unstable.size},"unstable":${nameArr(unstable.take(12))}"""
    // The driver keeps only the TAIL of stdout, and the per-query dicts
    // above can push the leading headline fields ("value", "n_queries",
    // the flag counts) past the capture window on a wide registry — so
    // the same scalars are REPEATED as the last keys of the object:
    // however the line is truncated from the front, the tail block with
    // total seconds / query count / error + instability + scaling-flag
    // counts survives. (Duplicate keys are avoided: the tail uses its
    // own names.)
    val tailJson =
      s""","tail":{"total_s":${num(total)},"tail_n_queries":${results.size
      },"n_errors":${errored.size},"tail_n_unstable":${unstable.size
      },"n_scaling_flagged":${scaling.map(_._2).getOrElse(-1)
      },"n_scaling_errors":${scaling.map(_._3).getOrElse(-1)}}"""
    val totalJson =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","runs":${benchRuns - 1},"warmup":1,"n_queries":${results.size},"errors":$errJson,$unstableHead,"queries":$qs,"spread":$sprHead$scalingJson$lifecycleJson,"sf":"$sfDir"$tailJson}"""
    println(totalJson)
    // Full per-query dict to a file so round-over-round diffs cover every
    // query, not just the stdout-tail-safe headline subset.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      s"""{"metric":"total","value":${num(total)},"unit":"sec","runs":${benchRuns - 1},"warmup":1,"n_queries":${results.size},"errors":$errJson,"n_unstable":${unstable.size},"unstable":${nameArr(unstable)},"queries":${dict(results)},"spread":${dict(spreads)}$scalingJson$lifecycleJson,"sf":"$sfDir"$tailJson}""".getBytes("UTF-8"))
    // FINAL line: one COMPLETE compact JSON object, sized to survive the
    // driver's ~2000-char stdout-tail capture whole (the sbt epilogue
    // after it costs ~100 chars). The wide line above front-truncates in
    // that window, leaving the driver's "parsed" field null and the
    // flagged/unstable rows anonymous — this line carries every scalar,
    // the NAME lists (capped at 12 per list; the n_* counts stay exact
    // so a cap is visible, never a silent truncation), and the slowest
    // per-query medians down to whatever budget the lists leave, so the
    // artifact is machine-readable regardless of tail width.
    def capped(ns: Seq[String]): String = nameArr(ns.sorted.take(12))
    val scalingFlagged = scaling.map(_._4).getOrElse(Nil)
    val scalingErrored = scaling.map(_._5).getOrElse(Nil)
    val head =
      s"""{"metric":"bench_summary","value":${num(total)},"unit":"sec","sf":"$sfDir","runs":${benchRuns - 1},"warmup":1,"n_queries":${results.size},"n_errors":${errored.size},"errors":${capped(errored)},"n_unstable":${unstable.size},"unstable":${capped(unstable)},"n_scaling_flagged":${scaling.map(_._2).getOrElse(-1)},"scaling_flagged":${capped(scalingFlagged)},"n_scaling_errors":${scaling.map(_._3).getOrElse(-1)},"scaling_errors":${capped(scalingErrored)}$lifecycleJson"""
    val budget = 1800 - head.length - ""","slowest":{}}""".length
    val slowEntries = results.sortBy(-_._2)
      .map { case (n, v) => s""""$n":${num(v)}""" }
    var used = 0
    val slowKept = slowEntries.takeWhile { e =>
      used += e.length + 1; used <= budget
    }
    println(s"""$head,"slowest":{${slowKept.mkString(",")}}}""")
    spark.stop()
  }
}
