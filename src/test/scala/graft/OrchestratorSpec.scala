package graft

import graft.ingest.{MappingValidator, RowValidator}
import graft.run.Orchestrator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Lifecycle tests: mapping gate, row QA, idempotent batch re-run,
  * empty-batch short-circuit, and the audit plane.
  */
class OrchestratorSpec extends AnyFunSuite with SparkTestBase {

  import MappingValidator._

  test("identifier canonicalization and batch-id extraction") {
    assert(normalizeIdent("  Cst GENDR-x ") === "cst_gendr_x")
    assert(batchIdOf("cust_info_BATCH000014.csv") === Some("BATCH000014"))
    assert(batchIdOf("cust_info.csv") === None)
    assert(isIdColumn("cst_id") && isIdColumn("ID") && isIdColumn("id_ref"))
    assert(!isIdColumn("idea") && !isIdColumn("valid"))
  }

  test("mapping validation: set equality in both directions") {
    val schema = StructType(Seq(StructField("Cst ID", DoubleType),
      StructField("cst_gendr", StringType)))
    val good = Seq(ColumnMapping("cst id", "cst_id", LongType),
      ColumnMapping("cst_gendr", "cst_gndr", StringType))
    assert(validate(schema, good) === MappingOk)
    val missing = good :+ ColumnMapping("extra_col", "extra", StringType)
    assert(validate(schema, missing)
      === MappingMismatch(Set("extra_col"), Set.empty))
    assert(validate(schema, good.take(1))
      === MappingMismatch(Set.empty, Set("cst_gendr")))
  }

  test("applyMapping renames and smart-casts id columns") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(11000.0, "AW1"),
        org.apache.spark.sql.Row(null, "AW2"))),
      StructType(Seq(StructField("cst_id", DoubleType),
        StructField("cst_key", StringType))))
    val out = applyMapping(df, Seq(
      ColumnMapping("cst_id", "cst_id", LongType),
      ColumnMapping("cst_key", "cst_key", StringType)))
    assert(out.schema("cst_id").dataType === LongType)
    assert(out.collect().map(r => Option(r.get(0))).toSet
      === Set(Some(11000L), None))
  }

  test("row validator: one-pass nulls + NaN + normalized dups") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row("A", 1.0),
        org.apache.spark.sql.Row(" a ", 2.0), // dup of "A" after normalize
        org.apache.spark.sql.Row("", Double.NaN),
        org.apache.spark.sql.Row(null, 3.0))),
      StructType(Seq(StructField("k", StringType), StructField("v", DoubleType))))
    val r = RowValidator.validate(df, Seq("k", "v"))
    assert(r.totalRows === 4)
    assert(r.nullCounts("k") === 2) // "" and null
    assert(r.nullCounts("v") === 1) // NaN
    assert(r.duplicateRows === 0)   // ("A",1) vs ("a",2) differ on v
    val r2 = RowValidator.validate(df, Seq("k"))
    assert(r2.duplicateRows === 2)  // "A"~" a " merge, ""~null merge
    assert(!r2.passed)
  }

  test("full lifecycle: idempotent re-run, short-circuit, audit rows") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val run1 = Orchestrator.runFixtureBatch(spark, wh)

    def factCount = spark.read.parquet(s"$wh/gold/fact_sales").count()
    assert(factCount === 60407)
    assert(spark.read.parquet(s"$wh/gold/mv_customer_churn").count() === 18484)

    // S8: full re-run of the same batch must not duplicate anything
    Orchestrator.runFixtureBatch(spark, wh)
    assert(factCount === 60407)

    // S11: catalog introspection sees the written schema
    assert(run1.tableColumns("gold/dim_customers").contains("customer_key"))

    // S10: a transform over an empty batch slice short-circuits
    val emptyRun = new Orchestrator.Run(spark, wh, "BATCH999999")
    val n = emptyRun.transform("bronze/crm_cust_info", "silver/crm_cust_info")(
      df => df)
    assert(n === 0)
    assert(emptyRun.auditLog.exists(l =>
      l.status === "SKIPPED_EMPTY" && l.batchId === "BATCH999999"))
    // and the real batch's silver partition is untouched
    assert(spark.read.parquet(s"$wh/silver/crm_cust_info").count() === 18484)

    // A10: audit plane persisted
    val audit = spark.read.parquet(s"$wh/tools/audit_log")
    assert(audit.where(col("status") === "SUCCESS").count() > 10)
  }

  test("restart mode: completed writes skip, missing work runs") {
    val wh = Files.createTempDirectory("graft_restart").toString
    // simulate a run that died after landing two bronze tables
    val partial = new Orchestrator.Run(spark, wh,
      graft.pipeline.ReferenceFixtures.BatchId)
    partial.writeBatch(
      graft.pipeline.ReferenceFixtures.crmCustInfo(spark).drop("dwh_batch_id"),
      "bronze/crm_cust_info")
    partial.writeBatch(
      graft.pipeline.ReferenceFixtures.erpPxCatG1v2(spark).drop("dwh_batch_id"),
      "bronze/erp_px_cat_g1v2")

    val resumed = Orchestrator.runFixtureBatch(spark, wh, resume = true)
    val skipped = resumed.auditLog
      .filter(_.status == "SKIPPED_DONE").map(_.target).toSet
    assert(skipped === Set("bronze/crm_cust_info", "bronze/erp_px_cat_g1v2"))
    assert(spark.read.parquet(s"$wh/gold/fact_sales").count() === 60407)
  }

  test("ingest gate: mismatched schema quarantines, matched loads") {
    val wh = Files.createTempDirectory("graft_ing").toString
    val run = new Orchestrator.Run(spark, wh, "BATCH000001")
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1.0, "x"), org.apache.spark.sql.Row(2.0, "y"))),
      StructType(Seq(StructField("cst_id", DoubleType),
        StructField("cst_gendr", StringType))))
    val mappings = Seq(
      ColumnMapping("cst_id", "cst_id", LongType),
      ColumnMapping("cst_gendr", "cst_gndr", StringType))
    assert(run.ingest(raw, mappings, Seq("cst_id"), "bronze/t").isRight)
    assert(spark.read.parquet(s"$wh/bronze/t").columns.toSet
      === Set("cst_id", "cst_gndr", "dwh_batch_id"))
    val bad = mappings :+ ColumnMapping("nope", "nope", StringType)
    assert(run.ingest(raw, bad, Seq("cst_id"), "bronze/t2").isLeft)
    assert(!Files.exists(java.nio.file.Paths.get(s"$wh/bronze/t2")))
  }
}
