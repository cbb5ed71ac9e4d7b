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
      * unless it is empty, writing to `target`.
      */
    def transform(source: String, target: String)
                 (f: DataFrame => DataFrame): Long = {
      val in = readBatch(source)
      if (in.isEmpty) { log("transform", target, "SKIPPED_EMPTY", 0); 0L }
      else {
        val n = writeBatch(f(in).drop("dwh_batch_id"), target)
        log("transform", target, "SUCCESS", n)
        n
      }
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

    // gold: dims first, fact gated on both dims existing (the
    // integration_dependencies contract)
    run.writeBatch(GoldIntegration.dimCustomers(
      run.readBatch("silver/crm_cust_info"),
      run.readBatch("silver/erp_cust_az12"),
      run.readBatch("silver/erp_loc_a101")).drop("dwh_batch_id"), "gold/dim_customers")
    run.writeBatch(GoldIntegration.dimProducts(
      run.readBatch("silver/crm_prd_info"),
      run.readBatch("silver/erp_px_cat_g1v2")).drop("dwh_batch_id"), "gold/dim_products")
    run.writeBatch(GoldIntegration.factSales(
      run.readBatch("silver/crm_sales_details"),
      run.readBatch("gold/dim_products"),
      run.readBatch("gold/dim_customers")).drop("dwh_batch_id"), "gold/fact_sales")

    // MVs: full refresh (overwrite) — REFRESH MATERIALIZED VIEW semantics
    val fact = run.readBatch("gold/fact_sales")
    val dimC = run.readBatch("gold/dim_customers")
    val dimP = run.readBatch("gold/dim_products")
    GoldViews.salesMonthlyProductline(fact, dimP)
      .write.mode(SaveMode.Overwrite).parquet(s"$warehouse/gold/mv_sales_monthly_productline")
    GoldViews.customerChurn(fact, dimC, refDate)
      .write.mode(SaveMode.Overwrite).parquet(s"$warehouse/gold/mv_customer_churn")
    run
  }
}
