package graft.run

import graft.ingest.{MappingValidator, RowValidator}
import graft.pipeline._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Batch lifecycle orchestration — the Spark collapse of the reference's
  * multi-process pipeline (SURVEY §3): per-file ingest (validate →
  * bronze), silver transforms, dim-before-fact gold integration, MV
  * refresh — with the reference's reliability contract preserved:
  *
  *  - idempotent batch overwrite (S8): every layer writes parquet
  *    partitioned by dwh_batch_id with dynamic partition overwrite, so a
  *    re-run of the same batch replaces exactly its own partition;
  *  - empty-batch short-circuit (S10): a transform whose input batch
  *    slice is empty reports success without writing
  *    (tools.load_crm_cust_info_v1.sql:29-40);
  *  - append-only audit log (A10): one row per step with status +
  *    row count (tools.transformation_log / integration_log);
  *  - catalog/schema introspection (S11): target schema read from the
  *    existing output, new columns tolerated via mergeSchema.
  *
  * The reference's manifest-concurrency machinery (polling, atomic
  * rename, merge-on-read) exists only because of its multi-process
  * architecture and is deliberately NOT ported (SURVEY §7.4.8) — the
  * manifest survives as the in-memory Manifest model with one writer.
  */
object Orchestrator {

  final case class Manifest(clientSchema: String, clientId: Int,
                            batchId: String, files: Seq[FileEntry])
  final case class FileEntry(logicalName: String, sourceSystem: String,
                             status: String)

  final case class StepLog(step: String, target: String, status: String,
                           rows: Long, batchId: String, message: String)

  /** One row of the integration config (mirrors tools.integration_config
    * + integration_dependencies, scripts/gold_integration.py:42-64):
    * targets run in `runOrder`; a target whose dependency did not
    * succeed this batch is skipped, not attempted.
    */
  final case class IntegrationStep(target: String, runOrder: Int,
                                   dependsOn: Seq[String])

  /** Completed write targets for a batch, from the audit plane — the
    * basis of restart mode (re-run only what didn't finish), mirroring
    * the reference's audit-log-driven restart
    * (handlers/batch_processing.py:501-896).
    */
  def completedTargets(spark: SparkSession, warehouse: String,
                       batchId: String): Set[String] = {
    val path = s"$warehouse/tools/audit_log"
    if (!new java.io.File(path).exists()) Set.empty
    else spark.read.parquet(path)
      .where(col("batchId") === batchId && col("step") === "write"
        && col("status") === "SUCCESS")
      .select("target").collect().map(_.getString(0)).toSet
  }

  /** Targets a reprocess cycle should pick up: a FAILED row for the
    * batch with no SUCCESS row for the same target (order-free — once a
    * reprocess succeeds, the SUCCESS row clears the target without any
    * audit-row timestamps). Mirrors the reference's failed-file model
    * (handlers/batch_processing.py:501-896, README.md:94-97: failed
    * files are quarantined and re-run under the SAME batch id).
    */
  def failedTargets(spark: SparkSession, warehouse: String,
                    batchId: String): Set[String] = {
    val path = s"$warehouse/tools/audit_log"
    if (!new java.io.File(path).exists()) Set.empty
    else {
      val batch = spark.read.parquet(path).where(col("batchId") === batchId)
      val failed = batch.where(col("status") === "FAILED")
        .select("target").collect().map(_.getString(0)).toSet
      // healed = the data actually landed: only a write-level success
      // counts — "write" for batch-partitioned tables, "mv_refresh" for
      // full-refresh views (a mapping_validation SUCCESS followed by a
      // dead write must NOT mask the target from the reprocess cycle)
      val healed = batch
        .where(col("status") === "SUCCESS"
          && col("step").isin("write", "mv_refresh"))
        .select("target").collect().map(_.getString(0)).toSet
      failed -- healed
    }
  }

  final class Run(spark: SparkSession, warehouse: String, batchId: String,
                  resume: Boolean = false) {
    private var logs = Vector.empty[StepLog]
    def auditLog: Seq[StepLog] = logs

    private val alreadyDone: Set[String] =
      if (resume) completedTargets(spark, warehouse, batchId) else Set.empty

    private def log(step: String, target: String, status: String,
                    rows: Long, msg: String = ""): Unit = {
      logs :+= StepLog(step, target, status, rows, batchId, msg)
      // A10: append-only audit plane, itself batch-partitioned parquet
      import spark.implicits._
      Seq(StepLog(step, target, status, rows, batchId, msg)).toDF()
        .write.mode(SaveMode.Append).parquet(s"$warehouse/tools/audit_log")
    }

    /** S8: write one batch of a layer table idempotently. In restart
      * mode a target the audit log already records as written is
      * skipped (its partition is intact — writes are atomic per the
      * task-commit protocol).
      *
      * The audit row count comes from an Observation on the write job
      * itself (A10, SURVEY §2.4: "observe to avoid double scans") —
      * re-reading a just-written 100 TB partition only to count it
      * would double the IO of every load.
      */
    def writeBatch(df: DataFrame, table: String): Long = {
      if (alreadyDone(table)) {
        log("write", table, "SKIPPED_DONE", 0)
        return spark.read.parquet(s"$warehouse/$table")
          .where(col("dwh_batch_id") === batchId).count()
      }
      val obs = org.apache.spark.sql.Observation()
      df.withColumn("dwh_batch_id", lit(batchId))
        .observe(obs, count(lit(1)).as("n"))
        .write
        .partitionBy("dwh_batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode(SaveMode.Overwrite)
        .parquet(s"$warehouse/$table")
      val n = obs.get("n").asInstanceOf[Long]
      log("write", table, "SUCCESS", n)
      n
    }

    /** S9: batch-pruned read of a layer table (partition pruning — the
      * filter prunes to the one batch directory).
      */
    def readBatch(table: String): DataFrame =
      spark.read.option("mergeSchema", "true").parquet(s"$warehouse/$table")
        .where(col("dwh_batch_id") === batchId)

    /** S11: observed schema of an existing warehouse table. */
    def tableColumns(table: String): Seq[String] =
      spark.read.parquet(s"$warehouse/$table").schema.fieldNames.toSeq

    /** S10 + transform step: run `f` over the batch slice of `source`
      * unless it is empty, writing to `target`. A failure quarantines
      * the input slice under failed/<target> (the file-plane analog of
      * the reference moving a bad file to failed/), logs FAILED, and
      * lets the rest of the batch continue — `reprocess` re-runs it
      * later under the same batch id.
      */
    def transform(source: String, target: String)
                 (f: DataFrame => DataFrame): Long = {
      val in = readBatch(source)
      if (in.isEmpty) { log("transform", target, "SKIPPED_EMPTY", 0); 0L }
      else try {
        val n = writeBatch(f(in).drop("dwh_batch_id"), target)
        log("transform", target, "SUCCESS", n)
        n
      } catch { case scala.util.control.NonFatal(e) =>
        // quarantine is best-effort: a failure to quarantine must not
        // mask the FAILED audit row the reprocess cycle keys off
        scala.util.Try {
          in.write
            .partitionBy("dwh_batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode(SaveMode.Overwrite)
            .parquet(s"$warehouse/failed/$target")
        }
        log("transform", target, "FAILED", 0,
          Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
        0L
      }
    }

    /** Reprocess one quarantined target with the SAME batch id: read the
      * failed/ slice, re-apply the (fixed) transform, write the real
      * target idempotently, and clear the quarantine partition. The
      * SUCCESS audit row is what flips the target out of
      * `failedTargets` — no log rewriting.
      */
    def reprocess(target: String)(f: DataFrame => DataFrame): Long = {
      // the quarantine write is best-effort (a broken SOURCE read can't
      // be quarantined), and gold/MV failures never quarantine — give
      // those a contract error, not a confusing path-not-found
      if (!new java.io.File(s"$warehouse/failed/$target").exists())
        throw new IllegalStateException(
          s"no quarantined input for $target — the failure happened " +
            "before the input slice could be captured (or in a " +
            "gold/MV build); re-run the original stage instead")
      val in = spark.read.parquet(s"$warehouse/failed/$target")
        .where(col("dwh_batch_id") === batchId)
      val n = writeBatch(f(in).drop("dwh_batch_id"), target)
      log("reprocess", target, "SUCCESS", n)
      val q = new java.io.File(s"$warehouse/failed/$target/dwh_batch_id=$batchId")
      if (q.exists()) {
        q.listFiles().foreach(_.delete()); q.delete()
      }
      n
    }

    /** Did `target` reach a success state this batch? Counts: a
      * write-level SUCCESS / SKIPPED_DONE (data landed), a transform
      * SKIPPED_EMPTY (the S10 contract: an empty batch slice is a
      * success without a write — downstream builds see an empty slice,
      * not a missing dependency), in this Run's logs or — for a fresh
      * Run finishing a healed batch — in the persisted audit plane.
      * Validation-only SUCCESS rows and FAILED do NOT satisfy.
      */
    def satisfied(target: String): Boolean =
      logs.exists(l => l.target == target
        && ((l.step == "write"
              && (l.status == "SUCCESS" || l.status == "SKIPPED_DONE"))
            || (l.step == "transform" && l.status == "SKIPPED_EMPTY"))) ||
        alreadyDone(target) || completedOnDisk(target)

    // audit-plane fallback for dependency gating: a target written by a
    // PREVIOUS Run of this batch satisfies dependencies even when this
    // Run was constructed without resume (loaded lazily — a normal
    // first run never pays it because the in-memory log hits first)
    private lazy val completedOnDisk: Set[String] =
      completedTargets(spark, warehouse, batchId)

    /** Shared dependency-gated step loop for the config-driven DAGs:
      * steps run in run_order; a step with an unmet dependency logs
      * SKIPPED_DEPENDENCY and is not attempted (the reference's
      * dependency gate, scripts/gold_integration.py:152-192); a step
      * whose write throws logs FAILED and downstream dependents gate
      * off it in turn.
      */
    private def runGated(stepName: String,
                         steps: Seq[(IntegrationStep, () => DataFrame)])
                        (write: (IntegrationStep, () => DataFrame) => Unit): Unit =
      steps.sortBy(_._1.runOrder).foreach { case (st, build) =>
        val unmet = st.dependsOn.filterNot(satisfied)
        if (unmet.nonEmpty)
          log(stepName, st.target, "SKIPPED_DEPENDENCY", 0,
            unmet.mkString(","))
        else try write(st, build)
        catch { case scala.util.control.NonFatal(e) =>
          log(stepName, st.target, "FAILED", 0,
            Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
        }
      }

    /** Config-table-driven integration DAG (tools.integration_config):
      * batch-partitioned idempotent writes, dependency-gated.
      */
    def integrate(steps: Seq[(IntegrationStep, () => DataFrame)]): Unit =
      runGated("integration", steps) { (st, build) =>
        writeBatch(build().drop("dwh_batch_id"), st.target); ()
      }

    /** Config-driven MV refresh (tools.mv_refresh_config analog): full
      * refresh = plain overwrite (REFRESH MATERIALIZED VIEW semantics,
      * scripts/refresh_mv.py), same dependency gating as integrate, row
      * counts observed on the write (no re-read).
      */
    def refreshViews(steps: Seq[(IntegrationStep, () => DataFrame)]): Unit =
      runGated("mv_refresh", steps) { (st, build) =>
        val obs = org.apache.spark.sql.Observation()
        build().observe(obs, count(lit(1)).as("n"))
          .write.mode(SaveMode.Overwrite).parquet(s"$warehouse/${st.target}")
        log("mv_refresh", st.target, "SUCCESS",
          obs.get("n").asInstanceOf[Long])
      }

    /** Manifest-driven start mode: the reference's per-file ingest loop
      * (handlers/batch_processing.py file plane) — every manifest entry
      * goes through the mapping gate + row QA + bronze write, and the
      * returned manifest carries each file's terminal status (the
      * in-memory analog of tools.file_audit_log status transitions).
      */
    def ingestManifest(manifest: Manifest,
                       load: FileEntry => DataFrame,
                       mappings: String => (Seq[MappingValidator.ColumnMapping], Seq[String])): Manifest = {
      val files = manifest.files.map { fe =>
        // per-file isolation: a corrupt file, a validator error, or a
        // dead bronze write marks THIS file FAILED (with an audit row
        // the reprocess cycle can see) and the loop continues
        val ok = try {
          val (maps, required) = mappings(fe.logicalName)
          ingest(load(fe), maps, required, s"bronze/${fe.logicalName}").isRight
        } catch { case scala.util.control.NonFatal(e) =>
          log("ingest", s"bronze/${fe.logicalName}", "FAILED", 0,
            Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
          false
        }
        fe.copy(status = if (ok) "COMPLETED" else "FAILED")
      }
      manifest.copy(files = files)
    }

    /** Ingest one inferred-schema source: mapping gate → typed bronze.
      * Failure quarantines the file (returns Left) instead of writing.
      */
    def ingest(df: DataFrame, mappings: Seq[MappingValidator.ColumnMapping],
               requiredCols: Seq[String], table: String): Either[String, Long] =
      MappingValidator.validate(df.schema, mappings) match {
        case m: MappingValidator.MappingMismatch =>
          log("mapping_validation", table, "FAILED", 0, m.toString)
          Left(m.toString)
        case MappingValidator.MappingOk =>
          log("mapping_validation", table, "SUCCESS", 0)
          val typed = MappingValidator.applyMapping(df, mappings)
          val report = RowValidator.validate(typed, requiredCols)
          // row-validation failures are logged but NON-fatal, matching
          // batch_processing.py:1217-1220 (warn-only)
          log("row_validation", table,
            if (report.passed) "SUCCESS" else "WARN",
            report.totalRows,
            s"dups=${report.duplicateRows} nulls=${report.nullCounts.values.sum}")
          Right(writeBatch(typed, table))
      }
  }

  /** The gold integration config as data — the Spark analog of the
    * reference's tools.integration_config rows (run_order) joined with
    * integration_dependencies (proc gating).
    */
  val goldIntegrationConfig: Seq[IntegrationStep] = Seq(
    IntegrationStep("gold/dim_customers", 1,
      Seq("silver/crm_cust_info", "silver/erp_cust_az12", "silver/erp_loc_a101")),
    IntegrationStep("gold/dim_products", 2,
      Seq("silver/crm_prd_info", "silver/erp_px_cat_g1v2")),
    IntegrationStep("gold/fact_sales", 3,
      Seq("silver/crm_sales_details", "gold/dim_customers", "gold/dim_products")))

  /** Builders for the config targets, deferred so a gated step never
    * touches its (possibly missing) inputs.
    */
  private val goldBuilders: Map[String, Orchestrator.Run => () => DataFrame] = Map(
    "gold/dim_customers" -> (run => () => GoldIntegration.dimCustomers(
      run.readBatch("silver/crm_cust_info"),
      run.readBatch("silver/erp_cust_az12"),
      run.readBatch("silver/erp_loc_a101"))),
    "gold/dim_products" -> (run => () => GoldIntegration.dimProducts(
      run.readBatch("silver/crm_prd_info"),
      run.readBatch("silver/erp_px_cat_g1v2"))),
    "gold/fact_sales" -> (run => () => GoldIntegration.factSales(
      run.readBatch("silver/crm_sales_details"),
      run.readBatch("gold/dim_products"),
      run.readBatch("gold/dim_customers"))))

  /** Full reference lifecycle on the fixture batch: bronze → silver →
    * gold (dims before fact, as integration_config orders them) → MVs
    * (full refresh = overwrite).
    */
  def runFixtureBatch(spark: SparkSession, warehouse: String,
                      resume: Boolean = false): Run = {
    val run = new Run(spark, warehouse, ReferenceFixtures.BatchId, resume)
    val refDate = ReferenceFixtures.RefDate

    // bronze (readers already apply the mapping; land them as-is)
    run.writeBatch(ReferenceFixtures.crmCustInfo(spark).drop("dwh_batch_id"), "bronze/crm_cust_info")
    run.writeBatch(ReferenceFixtures.crmPrdInfo(spark).drop("dwh_batch_id"), "bronze/crm_prd_info")
    run.writeBatch(ReferenceFixtures.crmSalesDetails(spark).drop("dwh_batch_id"), "bronze/crm_sales_details")
    run.writeBatch(ReferenceFixtures.erpCustAz12(spark).drop("dwh_batch_id"), "bronze/erp_cust_az12")
    run.writeBatch(ReferenceFixtures.erpLocA101(spark).drop("dwh_batch_id"), "bronze/erp_loc_a101")
    run.writeBatch(ReferenceFixtures.erpPxCatG1v2(spark).drop("dwh_batch_id"), "bronze/erp_px_cat_g1v2")

    // silver: 6 independent transforms (the reference runs them serially;
    // they are independent per source table)
    run.transform("bronze/crm_cust_info", "silver/crm_cust_info")(
      SilverTransforms.crmCustInfo(_, refDate))
    run.transform("bronze/crm_prd_info", "silver/crm_prd_info")(
      SilverTransforms.crmPrdInfo(_))
    run.transform("bronze/crm_sales_details", "silver/crm_sales_details")(
      SilverTransforms.crmSalesDetails(_))
    run.transform("bronze/erp_cust_az12", "silver/erp_cust_az12")(
      SilverTransforms.erpCustAz12(_, refDate))
    run.transform("bronze/erp_loc_a101", "silver/erp_loc_a101")(
      SilverTransforms.erpLocA101(_))
    run.transform("bronze/erp_px_cat_g1v2", "silver/erp_px_cat_g1v2")(
      SilverTransforms.erpPxCatG1v2(_))

    // gold: the config-driven DAG — dims before facts by run_order,
    // each step gated on its dependencies succeeding this batch
    // (tools.integration_config / integration_dependencies as data,
    // not hardcoded control flow)
    run.integrate(goldIntegrationConfig.map { st =>
      st -> goldBuilders(st.target)(run)
    })

    // MVs: all 9, config-driven like the gold DAG (mv_refresh_config
    // analog) — full refresh, each gated on its gold inputs
    def fact = run.readBatch("gold/fact_sales")
    def dimC = run.readBatch("gold/dim_customers")
    def dimP = run.readBatch("gold/dim_products")
    val onFact = Seq("gold/fact_sales")
    val onFC = Seq("gold/fact_sales", "gold/dim_customers")
    val onFP = Seq("gold/fact_sales", "gold/dim_products")
    run.refreshViews(Seq(
      IntegrationStep("gold/mv_sales_monthly_productline", 1, onFP) ->
        (() => GoldViews.salesMonthlyProductline(fact, dimP)),
      IntegrationStep("gold/mv_sales_customer_country", 2, onFC) ->
        (() => GoldViews.salesCustomerCountry(fact, dimC)),
      IntegrationStep("gold/mv_customer_lifetime_value", 3, onFC) ->
        (() => GoldViews.customerLifetimeValue(fact, dimC)),
      IntegrationStep("gold/mv_running_sales_customer", 4, onFC) ->
        (() => GoldViews.runningSalesCustomer(fact, dimC)),
      IntegrationStep("gold/mv_top3_products_month_country", 5,
        onFC ++ Seq("gold/dim_products")) ->
        (() => GoldViews.top3ProductsMonthCountry(fact, dimC, dimP)),
      IntegrationStep("gold/mv_customer_churn", 6, onFC) ->
        (() => GoldViews.customerChurn(fact, dimC, refDate)),
      IntegrationStep("gold/mv_customer_order_gap", 7, onFC) ->
        (() => GoldViews.customerOrderGap(fact, dimC)),
      IntegrationStep("gold/mv_sales_rollup_product", 8, onFP) ->
        (() => GoldViews.salesRollupProduct(fact, dimP)),
      IntegrationStep("gold/mv_delayed_orders_chain", 9, onFact) ->
        (() => GoldViews.delayedOrdersChain(fact))))
    run
  }
}
