package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timed multi-batch Orchestrator walk — the lifecycle plane's bench
  * artifact. BENCH times the registered queries; this times the
  * table-backed maintenance planes those queries' production forms
  * depend on (land → cadence refresh → gates → ANN rebuild →
  * compaction → vacuum),
  * so a performance regression in the lifecycle ops is visible in the
  * round artifact instead of only in specs' pass/fail.
  *
  * The walk is the production call sequence against a THROWAWAY
  * warehouse (nothing reached into): three fixed-width batches land
  * bronze tables plus the dedup/ANN/graph indexes, ONE cadence config
  * (refresh_every=2) drives all seven whole-corpus artifacts, the four
  * table-backed gates probe the persisted artifacts, the ANN index
  * retrains through the generation-pointer rebuild, and retention
  * vacuums the consumed bronze vintages. Inputs are the sf dir's
  * documents/embeddings tables — the same fixtures the query bench
  * reads — so stage times scale with the SF under test.
  *
  * Timing discipline (the Bench median rationale, adapted): the whole
  * walk runs `walks` times on fresh warehouses and each stage reports
  * its MINIMUM across walks — lifecycle stages are one-shot jobs (no
  * per-plan warm-up possible), and the min is the standard
  * noise-floor estimate for wall-clock one-shots.
  */
object LifecycleBench {

  val Stages: Seq[String] =
    Seq("land", "refresh", "gates", "rebuild", "compact", "vacuum")

  /** One full walk; returns per-stage seconds in [[Stages]] order. */
  def walk(spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    // the throwaway warehouse is BENCH-harness scratch (local by
    // definition, like the bench's output file) — the walk itself goes
    // only through the FS-agnostic Orchestrator/WarehouseFs plane
    val wh = java.nio.file.Files
      .createTempDirectory("graft_lifebench").toString
    try {
      val docs = graft.Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      val emb = graft.Tables.t(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      ToolsConfig.writeConfigFile(ToolsConfig.mvConfigPath(wh), Seq(
        "indexes/graph_host_ranks", "indexes/graph_hits_scores",
        "indexes/graph_triangle_counts", "indexes/graph_kcore",
        "indexes/graph_core_numbers", "indexes/graph_communities",
        "indexes/knn_graph")
        .map(t => s"""{"target_table":"$t","refresh_every":2}""") ++ Seq(
        """{"target_table":"bronze/documents","retention_keep_last":1}""",
        """{"target_table":"bronze/embeddings","retention_keep_last":3}"""))

      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      var lastRun: Orchestrator.Run = null

      val landS = timed {
        (0 until 3).foreach { i =>
          val r = new Orchestrator.Run(spark, wh, f"B${i + 1}%04d")
          val dSlice = docs.where(col("doc_id") % 3 === i)
          // a task-count's worth of files per batch partition (what a
          // real multi-task landing produces) — the compact stage
          // below then has real small files to fold
          val eSlice = emb.where(col("vec_id") % 3 === i).repartition(4)
          // WITHIN a batch the landing ops are independent where their
          // inputs allow (r21, guide §2.6 — the refresh stage's
          // overlap discipline applied to landing): the two bronze
          // writes touch distinct tables, and the three index builds
          // touch distinct index tables (the ANN build reads the
          // bronze/embeddings partition the FIRST phase landed, so it
          // stays in phase two). Batches remain strictly sequential —
          // the dedup/span indexes build batch-over-batch.
          r.refreshOverlapped(2)(
            () => r.writeBatch(dSlice, "bronze/documents"),
            () => r.writeBatch(eSlice, "bronze/embeddings"))
          r.refreshOverlapped(3)(
            () => r.indexDedupBatch(dSlice),
            () => r.indexAnnBatch(r.readBatch("bronze/embeddings")
              .select("vec_id", "embedding"), nlist = 64),
            // crawl-shaped edges: source host -> a second residue
            // stream (sinks possible, so the rank refresh runs the
            // dangling policy — the crawl-graph configuration)
            () => r.indexGraphBatch(dSlice.select(col("source").as("src"),
              concat(lit("src"), (col("doc_id") % 7).cast("string"))
                .as("dst"))))
          r.flushAudit()
          lastRun = r
        }
      }

      val r = lastRun
      val refreshS = timed {
        // independent artifacts with bounded overlap (guide §2.6, via
        // the production refreshOverlapped entry point) — heaviest
        // first so its tail back-fills with the cheap ones
        r.refreshOverlapped()(
          () => r.refreshKnnGraphIfDue(k = 5, nprobe = 3),
          () => r.refreshGraphRanksIfDue(iters = 3,
            redistributeDangling = true),
          () => r.refreshCoreNumbersIfDue(),
          () => r.refreshHitsScoresIfDue(3),
          () => r.refreshLpaCommunitiesIfDue(rounds = 3),
          () => r.refreshTriangleCountsIfDue(),
          () => r.refreshKCoreIfDue(k = 2))
        r.flushAudit()
      }

      // gate stage probes from a FRESH batch's perspective (the daily
      // shape): results through the noop sink so Catalyst can't prune
      // the gate columns unmeasured
      def drain(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val b4 = new Orchestrator.Run(spark, wh, "B0004")
      val gatesS = timed {
        drain(b4.hostGateAgainstRanks(docs.limit(500)))
        drain(b4.linkFarmGateAgainstTriangles(docs.limit(500)))
        drain(b4.dedupAgainstIndexes(docs.limit(500)))
        drain(b4.dedupAgainstAnnIndexes(emb.limit(500), eps = 1000000L))
      }

      val rebuildS = timed {
        b4.rebuildAnnIndex(nlist = 64, trainIters = 2)
      }

      // small-file maintenance: pointer-committed partition compaction
      // of the embeddings layer (kept whole by its retention config) +
      // GC of the parked layout, and the audit log's append-log fold +
      // GC — the two ops that keep file counts proportional to data,
      // not to ingest/flush cadence. Loud non-vacuity guards, per the
      // vacuum stage's discipline.
      val compactS = timed {
        require(b4.compactBatches("bronze/embeddings").nonEmpty,
          "lifecycle walk: the compact stage rewrote nothing — the walk " +
            "no longer exercises partition compaction")
        b4.vacuumCompacted("bronze/embeddings")
        require(b4.compactAuditLog(minLoose = 2).nonEmpty,
          "lifecycle walk: the audit fold folded nothing — the walk no " +
            "longer exercises append-log compaction")
        b4.vacuumAuditLog()
      }

      val vacuumS = timed {
        require(b4.vacuumIfConfigured("bronze/documents").nonEmpty,
          "lifecycle walk: the vacuum stage dropped nothing — the walk " +
            "no longer exercises retention")
        b4.flushAudit()
      }

      Stages.zip(Seq(landS, refreshS, gatesS, rebuildS, compactS, vacuumS))
    } finally {
      scala.util.Try(WarehouseFs.deleteRecursive(wh))
    }
  }

  /** `walks` fresh-warehouse walks; per-stage MIN plus the total. */
  def run(spark: SparkSession, sfDir: String,
          walks: Int): Seq[(String, Double)] = {
    require(walks >= 1, s"LifecycleBench: walks must be >= 1, got $walks")
    val all = (1 to walks).map(_ => walk(spark, sfDir).toMap)
    val best = Stages.map(s => s -> all.map(_(s)).min)
    best :+ ("lifecycle_total" -> best.map(_._2).sum)
  }
}
