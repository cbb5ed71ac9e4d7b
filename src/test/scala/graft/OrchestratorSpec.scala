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
    // all 9 MVs refresh through the config, each with a SUCCESS audit row
    assert(run1.auditLog.count(l =>
      l.step == "mv_refresh" && l.status == "SUCCESS") === 9)
    assert(spark.read.parquet(s"$wh/gold/mv_sales_rollup_product").count() === 37)
    // the run seeded its config plane as data files
    assert(Files.exists(java.nio.file.Paths.get(
      graft.run.ToolsConfig.integrationConfigPath(wh))))

    // config rows are DATA: before the re-run, disable one MV and add a
    // new target reusing a registered builder — no recompile
    val mvCfg = graft.run.ToolsConfig.mvConfigPath(wh)
    val edited = scala.io.Source.fromFile(mvCfg).getLines().map { l =>
      if (l.contains("delayed_orders_chain"))
        l.replace("\"enabled\":true", "\"enabled\":false")
      else l
    }.toSeq :+
      """{"target_table":"gold/mv_churn_copy","run_order":10,"enabled":true,"builder":"customer_churn"}"""
    graft.run.ToolsConfig.writeConfigFile(mvCfg, edited)

    // S8: full re-run of the same batch must not duplicate anything
    val run2 = Orchestrator.runFixtureBatch(spark, wh)
    assert(factCount === 60407)
    // the edited config changed the DAG: disabled MV skipped, new one ran
    val mv2 = run2.auditLog.filter(_.step == "mv_refresh")
    assert(!mv2.exists(_.target == "gold/mv_delayed_orders_chain"))
    assert(mv2.exists(l =>
      l.target == "gold/mv_churn_copy" && l.status == "SUCCESS"))
    assert(spark.read.parquet(s"$wh/gold/mv_churn_copy").count() === 18484)

    // audit rows are buffered per stage: two full runs land a handful of
    // files, not one per step (the small-files guard on the audit plane)
    val auditParts = new java.io.File(s"$wh/tools/audit_log")
      .listFiles().count(_.getName.startsWith("part-"))
    assert(auditParts <= 10, s"audit plane fragmented: $auditParts files")

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

  test("two successive batches: partitions, cumulative MV refresh, pruned reads") {
    import graft.pipeline.ReferenceFixtures
    val wh = Files.createTempDirectory("graft_twobatch").toString
    Orchestrator.runFixtureBatch(spark, wh)
    val fact14 = spark.read.parquet(s"$wh/gold/fact_sales").count()
    assert(fact14 === 60407)
    val ltv14 = spark.read.parquet(s"$wh/gold/mv_customer_lifetime_value")
      .select(col("customer_id"), col("lifetime_value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // BATCH000015: the reference's successive-batch model — a new batch
    // lands a SLICE of the source plane (every 100th customer + their
    // sales; products/erp passed whole, they only enrich) and runs the
    // same config-driven silver -> gold -> MV lifecycle
    val B15 = "BATCH000015"
    def writeBronze15(run: Orchestrator.Run): Unit = {
      run.writeBatch(ReferenceFixtures.crmCustInfo(spark)
        .where(col("cst_id") % 100 === 0).drop("dwh_batch_id"),
        "bronze/crm_cust_info")
      run.writeBatch(ReferenceFixtures.crmPrdInfo(spark).drop("dwh_batch_id"),
        "bronze/crm_prd_info")
      run.writeBatch(ReferenceFixtures.crmSalesDetails(spark)
        .where(col("sls_cust_id") % 100 === 0).drop("dwh_batch_id"),
        "bronze/crm_sales_details")
      run.writeBatch(ReferenceFixtures.erpCustAz12(spark).drop("dwh_batch_id"),
        "bronze/erp_cust_az12")
      run.writeBatch(ReferenceFixtures.erpLocA101(spark).drop("dwh_batch_id"),
        "bronze/erp_loc_a101")
      run.writeBatch(ReferenceFixtures.erpPxCatG1v2(spark).drop("dwh_batch_id"),
        "bronze/erp_px_cat_g1v2")
    }
    val run15 = Orchestrator.runConfiguredBatch(spark, wh, B15)(writeBronze15)

    // partition layout: each layer table now holds one directory per batch
    for (table <- Seq("silver/crm_cust_info", "gold/dim_customers",
        "gold/fact_sales")) {
      val parts = new java.io.File(s"$wh/$table").listFiles()
        .filter(_.getName.startsWith("dwh_batch_id=")).map(_.getName).toSet
      assert(parts === Set(s"dwh_batch_id=${ReferenceFixtures.BatchId}",
        s"dwh_batch_id=$B15"), table)
    }

    // delete-then-insert: batch 15 added exactly its own fact partition
    val n15 = spark.read.parquet(s"$wh/gold/fact_sales")
      .where(col("dwh_batch_id") === B15).count()
    assert(n15 > 0)
    assert(spark.read.parquet(s"$wh/gold/fact_sales").count() === fact14 + n15)

    // MV full refresh reflects BOTH batches: batch 15 duplicates the
    // sliced customers' batch-14 sales, so each sliced customer's
    // lifetime value exactly doubles and every other customer's is
    // untouched (sales are integer-valued -> doubles are exact)
    assert(run15.auditLog.count(l =>
      l.step == "mv_refresh" && l.status == "SUCCESS") === 9)
    val ltv15 = spark.read.parquet(s"$wh/gold/mv_customer_lifetime_value")
      .select(col("customer_id"), col("lifetime_value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ltv15.keySet === ltv14.keySet)
    val (sliced, rest) = ltv14.partition(_._1 % 100 == 0)
    assert(sliced.nonEmpty)
    sliced.foreach { case (id, v) => assert(ltv15(id) === 2 * v, s"customer $id") }
    rest.foreach { case (id, v) => assert(ltv15(id) === v, s"customer $id") }

    // S9 at the plan level: the batch-pruned read carries a partition
    // filter (pruning, not a full-table scan plus post-filter) and
    // returns only the new batch's rows
    val pruned = run15.readBatch("gold/fact_sales")
    assert(pruned.count() === n15)
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters") &&
      s"""dwh_batch_id#\\d+ = $B15""".r.findFirstIn(plan).isDefined,
      plan.take(2000))

    // idempotent re-run of the SECOND batch: same partitions, same
    // totals, batch 14 untouched
    Orchestrator.runConfiguredBatch(spark, wh, B15)(writeBronze15)
    assert(spark.read.parquet(s"$wh/gold/fact_sales").count() === fact14 + n15)
    assert(spark.read.parquet(s"$wh/gold/fact_sales")
      .where(col("dwh_batch_id") === ReferenceFixtures.BatchId).count() === fact14)

    // time travel: AS OF batch 14 sees exactly the pre-batch-15 state,
    // and the snapshot cut is a pruned partition filter, not a scan
    val asOf = run15.readTableAsOf("gold/fact_sales", ReferenceFixtures.BatchId)
    assert(asOf.count() === fact14)
    val asOfPlan = asOf.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(asOfPlan.contains("PartitionFilters") &&
      asOfPlan.contains("dwh_batch_id"), asOfPlan.take(1500))

    // incremental MV maintenance == full refresh, on the same two-batch
    // warehouse: each batch reduces to its partials (delta-bounded fact
    // work), the MVs rebuild from the compact partial tables, and every
    // one of the 9 MVs — the recursive chain included (per-batch chain
    // + identity merge) — is row-for-row identical to the full-refresh
    // output the lifecycle wrote above
    val specs = graft.run.MvIncremental.specs(ReferenceFixtures.RefDate)
    def sameRows(name: String): Unit = {
      val full = spark.read.parquet(s"$wh/gold/mv_$name")
      val inc = spark.read.parquet(s"$wh/goldinc/mv_$name")
      assert(inc.columns.sorted.toSeq === full.columns.sorted.toSeq, name)
      assert(full.exceptAll(inc).isEmpty && inc.exceptAll(full).isEmpty,
        s"mv_$name: incremental != full refresh")
    }
    new Orchestrator.Run(spark, wh, ReferenceFixtures.BatchId)
      .refreshViewsIncremental(specs, outPrefix = "goldinc")
    val incRun15 = new Orchestrator.Run(spark, wh, B15)
    incRun15.refreshViewsIncremental(specs, outPrefix = "goldinc")
    assert(incRun15.auditLog.count(l =>
      l.step == "mv_incremental" && l.status == "SUCCESS") === 9)
    specs.foreach(sp => sameRows(sp.name))

    // rerun-idempotency of the partial plane: re-maintaining the SAME
    // batch replaces its partial partition (never appends), so nothing
    // double-counts
    new Orchestrator.Run(spark, wh, B15)
      .refreshViewsIncremental(specs, outPrefix = "goldinc")
    specs.foreach(sp => sameRows(sp.name))
  }

  test("config-driven strategy routes MVs through the incremental plane") {
    import graft.pipeline.ReferenceFixtures
    import graft.run.ToolsConfig
    val wh = Files.createTempDirectory("graft_mvstrat").toString
    // seed the MV config BEFORE the run (writeDefaultsIfMissing never
    // clobbers): two mergeable MVs and the recursive chain (batch-scoped
    // by construction, so its incremental spec is the per-batch chain +
    // identity merge) ask for incremental, the rest stay default-full
    def row(t: String, o: Int, b: String, strat: Option[String]) =
      s"""{"target_table":"$t","run_order":$o,"enabled":true,"builder":"$b"""" +
        strat.map(s => s""","strategy":"$s"""").getOrElse("") + "}"
    ToolsConfig.writeConfigFile(ToolsConfig.mvConfigPath(wh), Seq(
      row("gold/mv_sales_monthly_productline", 1, "sales_monthly_productline", None),
      row("gold/mv_sales_customer_country", 2, "sales_customer_country", None),
      row("gold/mv_customer_lifetime_value", 3, "customer_lifetime_value", Some("incremental")),
      row("gold/mv_running_sales_customer", 4, "running_sales_customer", None),
      row("gold/mv_top3_products_month_country", 5, "top3_products_month_country", None),
      row("gold/mv_customer_churn", 6, "customer_churn", Some("incremental")),
      row("gold/mv_customer_order_gap", 7, "customer_order_gap", None),
      row("gold/mv_sales_rollup_product", 8, "sales_rollup_product", None),
      row("gold/mv_delayed_orders_chain", 9, "delayed_orders_chain", Some("incremental"))))
    val run = Orchestrator.runFixtureBatch(spark, wh)

    // routing: all 3 requested incrementals honored (the chain gained
    // its spec in r13), 6 full
    val mvLogs = run.auditLog.filter(l => l.status == "SUCCESS" &&
      (l.step == "mv_refresh" || l.step == "mv_incremental"))
    assert(mvLogs.count(_.step == "mv_incremental") === 3)
    assert(mvLogs.count(_.step == "mv_refresh") === 6)
    assert(run.auditLog.exists(l => l.step == "mv_incremental"
      && l.target == "gold/mv_delayed_orders_chain" && l.status == "SUCCESS"))

    // the incrementally-maintained MVs equal the direct GoldViews
    // computation over the landed gold tables
    import graft.pipeline.GoldViews
    val fact = spark.read.parquet(s"$wh/gold/fact_sales")
    val dimC = spark.read.parquet(s"$wh/gold/dim_customers")
    val ltv = spark.read.parquet(s"$wh/gold/mv_customer_lifetime_value")
    val ltvFull = GoldViews.customerLifetimeValue(fact, dimC)
    assert(ltv.exceptAll(ltvFull).isEmpty && ltvFull.exceptAll(ltv).isEmpty)
    val churn = spark.read.parquet(s"$wh/gold/mv_customer_churn")
    val churnFull = GoldViews.customerChurn(fact, dimC, ReferenceFixtures.RefDate)
    assert(churn.exceptAll(churnFull).isEmpty &&
      churnFull.exceptAll(churn).isEmpty)
    val chain = spark.read.parquet(s"$wh/gold/mv_delayed_orders_chain")
    val chainFull = GoldViews.delayedOrdersChain(fact)
    assert(chain.exceptAll(chainFull).isEmpty &&
      chainFull.exceptAll(chain).isEmpty)
    // and the partial plane landed batch-partitioned
    assert(new java.io.File(
      s"$wh/mv_partials/customer_lifetime_value/dwh_batch_id=${ReferenceFixtures.BatchId}")
      .exists())
  }

  test("incremental MVs degrade to per-step FAILED rows on missing gold") {
    // first batch whose gold integration failed: the incremental plane
    // must log one FAILED row per MV (the reprocess cycle keys off
    // them) — NOT abort the configured batch with an AnalysisException
    // from eager schema inference on the missing fact path
    val wh = Files.createTempDirectory("graft_mvfail").toString
    val run = new Orchestrator.Run(spark, wh,
      graft.pipeline.ReferenceFixtures.BatchId)
    val specs = graft.run.MvIncremental
      .specs(graft.pipeline.ReferenceFixtures.RefDate)
    run.refreshViewsIncremental(specs, outPrefix = "goldinc") // no throw
    val failed = run.auditLog.filter(l =>
      l.step == "mv_incremental" && l.status == "FAILED")
    assert(failed.size === specs.size,
      s"expected one FAILED row per MV, got: ${run.auditLog}")
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
    // the dying run reached a stage boundary: its audit rows flushed
    partial.flushAudit()

    val resumed = Orchestrator.runFixtureBatch(spark, wh, resume = true)
    val skipped = resumed.auditLog
      .filter(_.status == "SKIPPED_DONE").map(_.target).toSet
    assert(skipped === Set("bronze/crm_cust_info", "bronze/erp_px_cat_g1v2"))
    assert(spark.read.parquet(s"$wh/gold/fact_sales").count() === 60407)
  }

  test("reprocess: failed transform quarantines, same-batch re-run heals") {
    import graft.pipeline.{ReferenceFixtures, SilverTransforms}
    val B = ReferenceFixtures.BatchId
    val refDate = ReferenceFixtures.RefDate
    // clean run for the expected output
    val whClean = Files.createTempDirectory("graft_clean").toString
    val clean = new Orchestrator.Run(spark, whClean, B)
    clean.writeBatch(ReferenceFixtures.crmCustInfo(spark).drop("dwh_batch_id"),
      "bronze/crm_cust_info")
    clean.transform("bronze/crm_cust_info", "silver/crm_cust_info")(
      SilverTransforms.crmCustInfo(_, refDate))

    // failing run: the transform throws mid-write
    val wh = Files.createTempDirectory("graft_reproc").toString
    val run = new Orchestrator.Run(spark, wh, B)
    run.writeBatch(ReferenceFixtures.crmCustInfo(spark).drop("dwh_batch_id"),
      "bronze/crm_cust_info")
    val n = run.transform("bronze/crm_cust_info", "silver/crm_cust_info")(
      df => df.select(expr("raise_error('disk full')").as("cst_id")))
    assert(n === 0)
    assert(run.auditLog.exists(l =>
      l.step == "transform" && l.status == "FAILED"
        && l.target == "silver/crm_cust_info"))
    // the input slice is quarantined, and the target reads as failed
    assert(spark.read.parquet(s"$wh/failed/silver/crm_cust_info").count() > 0)
    assert(Orchestrator.failedTargets(spark, wh, B)
      === Set("silver/crm_cust_info"))

    // reprocess cycle: same batch id, fixed transform, from quarantine
    val rerun = new Orchestrator.Run(spark, wh, B)
    rerun.reprocess("silver/crm_cust_info")(
      SilverTransforms.crmCustInfo(_, refDate))
    assert(Orchestrator.failedTargets(spark, wh, B) === Set.empty)
    assert(!Files.exists(java.nio.file.Paths.get(
      s"$wh/failed/silver/crm_cust_info/dwh_batch_id=$B")))
    // output identical to the clean run
    val got = spark.read.parquet(s"$wh/silver/crm_cust_info")
    val want = spark.read.parquet(s"$whClean/silver/crm_cust_info")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // a FRESH Run finishing the healed batch gates off the persisted
    // audit plane: the silver write from the heal satisfies a dependent
    // step even though this Run's in-memory log is empty
    import graft.run.Orchestrator.IntegrationStep
    import spark.implicits._
    val finisher = new Orchestrator.Run(spark, wh, B)
    finisher.integrate(Seq(
      IntegrationStep("gold/after_heal", 1, Seq("silver/crm_cust_info")) ->
        (() => Seq((1L, 1L)).toDF("k", "m"))))
    assert(finisher.auditLog.filter(_.target == "gold/after_heal")
      .map(_.status).contains("SUCCESS"))
  }

  test("config-driven DAG: fact skipped when its dim dependency fails") {
    import graft.run.Orchestrator.IntegrationStep
    val wh = Files.createTempDirectory("graft_dag").toString
    val run = new Orchestrator.Run(spark, wh, "BATCH000077")
    import spark.implicits._
    run.writeBatch(Seq((1L, "x")).toDF("id", "v"), "silver/src_ok")
    val steps = Seq(
      IntegrationStep("gold/dim_a", 1, Seq("silver/src_ok")) ->
        (() => sys.error("dim build exploded"): org.apache.spark.sql.DataFrame),
      IntegrationStep("gold/fact_f", 2, Seq("gold/dim_a")) ->
        (() => Seq((1L, 2L)).toDF("k", "m")),
      IntegrationStep("gold/dim_missing_dep", 1, Seq("silver/never_ran")) ->
        (() => Seq((9L, 9L)).toDF("k", "m")))
    run.integrate(steps)
    def status(t: String) = run.auditLog.filter(_.target == t).map(_.status)
    assert(status("gold/dim_a").contains("FAILED"))
    assert(status("gold/fact_f") === Seq("SKIPPED_DEPENDENCY"))
    assert(status("gold/dim_missing_dep") === Seq("SKIPPED_DEPENDENCY"))
    assert(!Files.exists(java.nio.file.Paths.get(s"$wh/gold/fact_f")))

    // S10 composes with the gate: an empty batch slice is a SUCCESS
    // state, so a step depending on an empty-skipped silver target is
    // attempted (reading the empty slice), not SKIPPED_DEPENDENCY
    val emptyRun = new Orchestrator.Run(spark, wh, "BATCH000078")
    emptyRun.transform("silver/src_ok", "silver/src_empty")(df => df)
    assert(emptyRun.auditLog.exists(l =>
      l.target == "silver/src_empty" && l.status == "SKIPPED_EMPTY"))
    emptyRun.integrate(Seq(
      IntegrationStep("gold/over_empty", 1, Seq("silver/src_empty")) ->
        (() => Seq((1L, 1L)).toDF("k", "m"))))
    assert(emptyRun.auditLog.filter(_.target == "gold/over_empty")
      .map(_.status).contains("SUCCESS"))
  }

  test("bloom-indexed batch writes: point lookups prune across batches and reruns") {
    val wh = Files.createTempDirectory("graft_bloomwh").toString
    val orders = Tables.t(spark, "/root/testdata/sf0.01", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val b1 = orders.where(col("o_orderkey") % 2 === 0)
    val b2 = orders.where(col("o_orderkey") % 2 === 1)
    val run1 = new Orchestrator.Run(spark, wh, "B1")
    val run2 = new Orchestrator.Run(spark, wh, "B2")
    run1.writeBatchIndexed(b1.repartition(3), "silver/orders_pt", "o_orderkey")
    run2.writeBatchIndexed(b2.repartition(3), "silver/orders_pt", "o_orderkey")
    val probes = Seq(7L, 32L, 999999999L)
    def lookup() = new Orchestrator.Run(spark, wh, "BQ")
      .readTablePointLookup("silver/orders_pt", "o_orderkey", probes)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted.toSeq
    val want = orders.where(col("o_orderkey").isin(probes: _*))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted.toSeq
    assert(lookup() === want)
    // rerun batch 2 (S8): data partition and its manifest partition are
    // both replaced; lookups stay exact and batch 1's manifest survives
    new Orchestrator.Run(spark, wh, "B2")
      .writeBatchIndexed(b2.repartition(2), "silver/orders_pt", "o_orderkey")
    assert(lookup() === want)
    val manifest = spark.read.parquet(s"$wh/silver/orders_pt/_bloomidx")
    assert(manifest.count() === 5,
      "expected 3 batch-1 + 2 rerun batch-2 manifest rows")
    // an empty batch writes no partition and refreshes nothing (S10)
    assert(new Orchestrator.Run(spark, wh, "B_EMPTY").writeBatchIndexed(
      b1.where(lit(false)), "silver/orders_pt", "o_orderkey") === 0L)
    assert(lookup() === want)
    // heal-on-resume: a lost/failed manifest partition is rebuilt from
    // state, not skipped off the audit log
    val pidDir = new java.io.File(s"$wh/silver/orders_pt/_bloomidx/pid=B2")
    assert(pidDir.exists())
    def rmRf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmRf)); f.delete()
    }
    rmRf(pidDir)
    new Orchestrator.Run(spark, wh, "B2")
      .writeBatchIndexed(b2.repartition(2), "silver/orders_pt", "o_orderkey")
    assert(lookup() === want)
    // a batch landed WITHOUT indexing breaks coverage → loud fail
    new Orchestrator.Run(spark, wh, "B3")
      .writeBatch(orders.limit(10), "silver/orders_pt")
    val ex = intercept[IllegalArgumentException](lookup())
    assert(ex.getMessage.contains("writeBatchIndexed"))
  }

  test("two clients run isolated under separate warehouse prefixes") {
    import graft.pipeline.{ReferenceFixtures, SilverTransforms}
    val B = ReferenceFixtures.BatchId
    val root = Files.createTempDirectory("graft_tenants").toString
    // the schema-per-client routing (tools.client_reference) maps to the
    // warehouse-path parameter: same code, different prefix per client
    val c1 = new Orchestrator.Run(spark, s"$root/client1", B)
    val c2 = new Orchestrator.Run(spark, s"$root/client2", B)
    val bronze = ReferenceFixtures.crmCustInfo(spark).drop("dwh_batch_id")
    c1.writeBatch(bronze, "bronze/crm_cust_info")
    c2.writeBatch(bronze.limit(1000), "bronze/crm_cust_info")
    val n1 = c1.transform("bronze/crm_cust_info", "silver/crm_cust_info")(
      SilverTransforms.crmCustInfo(_, ReferenceFixtures.RefDate))
    val n2 = c2.transform("bronze/crm_cust_info", "silver/crm_cust_info")(
      SilverTransforms.crmCustInfo(_, ReferenceFixtures.RefDate))
    assert(n1 === 18484)
    assert(n2 > 0 && n2 <= 1000)
    // outputs and audit planes are fully isolated
    c1.flushAudit(); c2.flushAudit()
    assert(spark.read.parquet(s"$root/client1/silver/crm_cust_info").count() === n1)
    assert(spark.read.parquet(s"$root/client2/silver/crm_cust_info").count() === n2)
    assert(spark.read.parquet(s"$root/client1/tools/audit_log")
      .where(col("status") === "FAILED").count() === 0)
    assert(spark.read.parquet(s"$root/client2/tools/audit_log").count() > 0)
  }

  test("manifest-driven ingest: per-file statuses, bad file isolated") {
    val wh = Files.createTempDirectory("graft_manifest").toString
    val run = new Orchestrator.Run(spark, wh, "BATCH000002")
    val goodDf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1.0, "x"), org.apache.spark.sql.Row(2.0, "y"))),
      StructType(Seq(StructField("cst_id", DoubleType),
        StructField("cst_gendr", StringType))))
    val badDf = goodDf.withColumnRenamed("cst_gendr", "wrong_header")
    // schema-valid but poisoned past the mapping gate: the failure fires
    // during execution, AFTER a mapping_validation SUCCESS row is logged
    val poisonedDf = goodDf.withColumn("cst_gendr",
      when(col("cst_gendr") === "x", raise_error(lit("exec boom")))
        .otherwise(col("cst_gendr")))
    val manifest = Orchestrator.Manifest("client1", 1, "BATCH000002", Seq(
      Orchestrator.FileEntry("cust_info", "crm", "PENDING"),
      Orchestrator.FileEntry("prd_info", "crm", "PENDING"),
      Orchestrator.FileEntry("sales_details", "crm", "PENDING")))
    val done = run.ingestManifest(manifest,
      load = fe => fe.logicalName match {
        case "cust_info" => goodDf
        case "prd_info" => badDf
        case _ => poisonedDf
      },
      mappings = _ => (Seq(
        ColumnMapping("cst_id", "cst_id", LongType),
        ColumnMapping("cst_gendr", "cst_gndr", StringType)), Seq("cst_id")))
    assert(done.files.map(f => f.logicalName -> f.status).toMap
      === Map("cust_info" -> "COMPLETED", "prd_info" -> "FAILED",
        "sales_details" -> "FAILED"))
    // good file landed; bad files wrote nothing and the loop survived
    assert(spark.read.parquet(s"$wh/bronze/cust_info").count() === 2)
    assert(!Files.exists(java.nio.file.Paths.get(s"$wh/bronze/prd_info")))
    // the poisoned file logged mapping_validation SUCCESS before dying —
    // that validation row must NOT mask it from the reprocess cycle
    assert(run.auditLog.exists(l => l.step == "mapping_validation"
      && l.status == "SUCCESS" && l.target == "bronze/sales_details"))
    assert(Orchestrator.failedTargets(spark, wh, "BATCH000002")
      .contains("bronze/sales_details"))

    // the manifest persisted as one atomic JSON artifact per batch
    import graft.run.ManifestStore
    val persisted = ManifestStore.load(wh, "BATCH000002")
    assert(persisted.map(e => e.key -> e.status).toMap
      === Map("cust_info" -> "COMPLETED", "prd_info" -> "FAILED",
        "sales_details" -> "FAILED"))

    // rerun cycle: the fixed files go through again under the SAME batch
    // — history is preserved under _rerunN keys, unchanged statuses are
    // not duplicated (idempotent save)
    run.ingestManifest(done.copy(files = done.files.map(_.copy(status = "PENDING"))),
      load = _ => goodDf,
      mappings = _ => (Seq(
        ColumnMapping("cst_id", "cst_id", LongType),
        ColumnMapping("cst_gendr", "cst_gndr", StringType)), Seq("cst_id")))
    val healed = ManifestStore.load(wh, "BATCH000002")
    assert(healed.map(e => e.key -> e.status) === Seq(
      "cust_info" -> "COMPLETED",
      "prd_info" -> "FAILED",
      "sales_details" -> "FAILED",
      "prd_info_rerun1" -> "COMPLETED",
      "sales_details_rerun1" -> "COMPLETED"))
    // and a third identical save adds nothing
    run.ingestManifest(done.copy(files = done.files.map(_.copy(status = "PENDING"))),
      load = _ => goodDf,
      mappings = _ => (Seq(
        ColumnMapping("cst_id", "cst_id", LongType),
        ColumnMapping("cst_gendr", "cst_gndr", StringType)), Seq("cst_id")))
    assert(ManifestStore.load(wh, "BATCH000002").size === 5)
  }

  test("source_config JSONB: parsed as a typed map and overrides parameters") {
    import graft.run.ToolsConfig
    val wh = Files.createTempDirectory("graft_srccfg").toString
    ToolsConfig.writeConfigFile(ToolsConfig.transformConfigPath(wh), Seq(
      """{"source_table":"bronze/a","target_table":"silver/a","transform_name":"crm_cust_info","enabled":true,"source_config":{"ref_date":"2030-01-01","mode":"strict"}}""",
      """{"source_table":"bronze/b","target_table":"silver/b","transform_name":"erp_loc_a101","enabled":true}"""))
    val rows = ToolsConfig.loadTransforms(spark, wh)
    assert(rows.map(_.target) === Seq("silver/a", "silver/b"))
    assert(rows.head.sourceConfig
      === Map("ref_date" -> "2030-01-01", "mode" -> "strict"))
    assert(rows(1).sourceConfig === Map.empty)

    // the override actually reaches the builder: crmCustInfo derives
    // "today"-relative output from ref_date, so shifting it shifts rows
    import graft.pipeline.ReferenceFixtures
    val bronze = ReferenceFixtures.crmCustInfo(spark)
    val a = graft.pipeline.SilverTransforms.crmCustInfo(bronze, "2025-09-12")
    val b = graft.pipeline.SilverTransforms.crmCustInfo(bronze,
      rows.head.sourceConfig("ref_date"))
    assert(a.exceptAll(b).count() > 0, "ref_date override had no effect")
  }

  test("config plane is data: disabled rows, file deps, unknown builder") {
    import graft.run.ToolsConfig
    val wh = Files.createTempDirectory("graft_cfgdata").toString
    ToolsConfig.writeConfigFile(ToolsConfig.integrationConfigPath(wh), Seq(
      """{"target_table":"gold/dim_customers","run_order":1,"enabled":true,"builder":"dim_customers"}""",
      """{"target_table":"gold/dim_products","run_order":2,"enabled":false,"builder":"dim_products"}""",
      """{"target_table":"gold/bogus","run_order":3,"enabled":true,"builder":"no_such_builder"}"""))
    ToolsConfig.writeConfigFile(ToolsConfig.dependenciesPath(wh), Seq(
      """{"target_table":"gold/dim_customers","depends_on":"silver/never_ran"}"""))

    val steps = ToolsConfig.loadSteps(spark, wh,
      ToolsConfig.integrationConfigPath(wh))
    // the disabled row never reaches the DAG
    assert(steps.map(_._1.target) === Seq("gold/dim_customers", "gold/bogus"))
    // dependencies come from the config file, not code
    assert(steps.head._1.dependsOn === Seq("silver/never_ran"))

    val run = new Orchestrator.Run(spark, wh, "BATCH000099")
    run.integrate(steps.map { case (st, b) =>
      st -> ToolsConfig.resolve(ToolsConfig.goldBuilders, b, run, "2025-09-12")
    })
    def status(t: String) = run.auditLog.filter(_.target == t).map(_.status)
    // unmet FILE-configured dependency gates the step
    assert(status("gold/dim_customers") === Seq("SKIPPED_DEPENDENCY"))
    // a config typo fails that one step, not the run
    assert(status("gold/bogus") === Seq("FAILED"))
    assert(run.auditLog.find(_.target == "gold/bogus").get
      .message.contains("unknown builder"))
    assert(status("gold/dim_products").isEmpty)
  }

  test("maintenance cadence: config rows drive compaction/GC, edits need no recompile") {
    import graft.run.ToolsConfig
    import graft.sources.CompactedLayout
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_maint").toString
    def land(id: String): Orchestrator.Run = {
      val r = new Orchestrator.Run(spark, wh, id)
      r.writeBatch((1L to 40L).map(i => (i, s"$id-$i")).toDF("k", "v")
        .repartition(6), "bronze/t")
      r.flushAudit()
      r
    }

    // no config file: the plane is opt-in — nothing fires
    assert(land("B0001").runMaintenanceIfDue() === Seq.empty)

    // configure: compact bronze/t every 2 landed batches, fold the
    // audit log every 3, and one typo'd op (must FAIL its row only)
    ToolsConfig.writeConfigFile(ToolsConfig.maintenanceConfigPath(wh), Seq(
      """{"op":"compact_batches","target_table":"bronze/t","every":"2"}""",
      """{"op":"compact_audit","target_table":"tools/audit_log","every":"3"}""",
      """{"op":"frobnicate","target_table":"bronze/t","every":"1"}"""))

    val r2 = land("B0002")
    assert(r2.runMaintenanceIfDue() === Seq(
      ("compact_batches", "bronze/t", "RAN"), // 2 landed >= every=2
      ("compact_audit", "tools/audit_log", "SKIPPED_CADENCE"), // 2 < 3
      ("frobnicate", "bronze/t", "FAILED"))) // unknown op: its row only
    // the compaction REALLY ran: both partitions pointer-committed
    assert(CompactedLayout.liveGen(s"$wh/bronze/t/dwh_batch_id=B0001") === 1L)
    assert(CompactedLayout.liveGen(s"$wh/bronze/t/dwh_batch_id=B0002") === 1L)
    assert(r2.auditLog.exists(l => l.step == "maintenance"
      && l.status == "SUCCESS" && l.message.startsWith("covers=B0002")))
    assert(r2.auditLog.exists(l => l.step == "maintenance"
      && l.status == "FAILED" && l.message.contains("unknown maintenance op")))

    // next landing: compact_batches is 1 pending < 2 (the covers stamp
    // advanced), the audit fold reaches its every=3
    val r3 = land("B0003")
    assert(r3.runMaintenanceIfDue() === Seq(
      ("compact_batches", "bronze/t", "SKIPPED_CADENCE"),
      ("compact_audit", "tools/audit_log", "RAN"),
      ("frobnicate", "bronze/t", "FAILED")))

    // EDIT the config — no recompile: drop the typo'd row, disable the
    // audit fold, and the next landing obeys the new file verbatim
    ToolsConfig.writeConfigFile(ToolsConfig.maintenanceConfigPath(wh), Seq(
      """{"op":"compact_batches","target_table":"bronze/t","every":"2"}""",
      """{"op":"compact_audit","target_table":"tools/audit_log","every":"3","enabled":false}"""))
    val r4 = land("B0004")
    assert(r4.runMaintenanceIfDue() === Seq(
      ("compact_batches", "bronze/t", "RAN"))) // B0003+B0004 pending
    assert(CompactedLayout.liveGen(s"$wh/bronze/t/dwh_batch_id=B0004") === 1L)

    // reads through the resolver stay exact across the whole cadence
    assert(r4.readTable("bronze/t").count() === 160L)

    // the r20 review finding: a pass whose EARLIER op rewrites the
    // audit log (fold) and whose NEXT op GC's it (vacuum) must not
    // leave a LATER op's cadence bookkeeping reading a stale plan
    // over deleted files — the audit frame resolves per row. The log
    // already holds one committed generation from r3's fold above.
    ToolsConfig.writeConfigFile(ToolsConfig.maintenanceConfigPath(wh), Seq(
      """{"op":"compact_audit","target_table":"tools/audit_log","every":"1"}""",
      """{"op":"vacuum_audit","target_table":"tools/audit_log","every":"1"}""",
      """{"op":"compact_batches","target_table":"bronze/t","every":"1"}"""))
    val r5 = land("B0005")
    assert(r5.runMaintenanceIfDue() === Seq(
      ("compact_audit", "tools/audit_log", "RAN"),
      ("vacuum_audit", "tools/audit_log", "RAN"),
      ("compact_batches", "bronze/t", "RAN")),
      "fold + GC + compact in ONE pass: no stale-plan abort")
    assert(r5.readTable("bronze/t").count() === 200L)
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

  test("media band index persists per batch; the next batch probes the table") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_media_idx").toString
    // 80-byte decoded-plane stand-ins (the MultimodalSpec md5 chains)
    val md = java.security.MessageDigest.getInstance("MD5")
    def plane(seed: String): Array[Byte] = (0 until 5).flatMap(j =>
      md.digest(s"$seed#$j".getBytes("UTF-8")).toSeq).toArray
    val corpus = (1L to 20L).map(i => (i, plane(s"img$i"))).toDF("doc_id", "payload")
    // batch: re-encodes of corpus docs 3 and 7 (byte-5 bump — Hamming
    // <= 2 from the original) plus two genuinely fresh payloads
    def bump(p: Array[Byte]): Array[Byte] = {
      val q = p.clone(); q(5) = ((q(5) & 0xff) + 96).toByte; q
    }
    val batch = Seq(
      (1003L, bump(plane("img3"))), (1007L, bump(plane("img7"))),
      (2001L, plane("fresh1")), (2002L, plane("fresh2")))
      .toDF("doc_id", "payload")

    val run1 = new Orchestrator.Run(spark, wh, "B1")
    val nBands = run1.indexMediaBatch(corpus)
    assert(nBands === 80L, "4 band rows per indexed payload")
    // S8 on the index plane: re-indexing the same batch replaces its
    // partition — no duplicates
    new Orchestrator.Run(spark, wh, "B1").indexMediaBatch(corpus)
    assert(spark.read.parquet(s"$wh/indexes/media_bands").count() === 80L)

    val run2 = new Orchestrator.Run(spark, wh, "B2")
    val verdicts = run2.mediaNeardupAgainstIndex(batch)
    // the plan reads ONLY the index table — corpus payloads are gone
    val scanned = verdicts.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten
    assert(scanned.nonEmpty && scanned.forall(_.contains("indexes/media_bands")),
      s"probe must read only the band index, scanned: $scanned")
    val got = verdicts.collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(got(1003L) === ((true, 3L)), "re-encode must match its original")
    assert(got(1007L) === ((true, 7L)))
    assert(got(2001L)._1 === false && got(2002L)._1 === false,
      "fresh payloads survive as explicit is_dup=false rows")

    // indexing the probe batch too, then re-probing it, must exclude
    // its own partition (restart shape) — verdicts unchanged
    run2.indexMediaBatch(batch)
    val again = run2.mediaNeardupAgainstIndex(batch).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(again === got.map { case (k, v) => k -> v._1 })
  }

  test("dedup indexes persist per batch; the next batch probes only the tables") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val wh = Files.createTempDirectory("graft_dedup_idx").toString
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, dir, "documents")
    val corpus = docs.where(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val fresh = docs.where(col("doc_id") % 10 === 0).select("doc_id", "text")
    // ground truth: the registered scan-derived row on the same split
    val expected = SparkEntry.queries("q_dedup_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0),
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap

    // batch 1 lands the corpus and its two index tables
    val run1 = new Orchestrator.Run(spark, wh, "B1")
    run1.writeBatch(corpus, "bronze/documents")
    val (nKeys, nBands) = run1.indexDedupBatch(corpus)
    assert(nKeys === corpus.count() && nBands > 0)
    run1.flushAudit()

    // S8 on the index plane: re-indexing the same batch replaces its
    // partition — row counts unchanged, no duplicates
    new Orchestrator.Run(spark, wh, "B1").indexDedupBatch(corpus)
    assert(spark.read.parquet(s"$wh/indexes/dedup_content_keys").count() === nKeys)
    assert(spark.read.parquet(s"$wh/indexes/dedup_band_keys").count() === nBands)

    // batch 2: land the fresh docs, dedup them against the PERSISTED
    // indexes of every prior batch
    val run2 = new Orchestrator.Run(spark, wh, "B2")
    run2.writeBatch(fresh, "bronze/documents")
    val verdicts = run2.dedupAgainstIndexes(
      run2.readBatch("bronze/documents").select("doc_id", "text"))

    // the plan reads ONLY warehouse tables (the bronze batch slice plus
    // the two index tables) — the corpus documents are never re-scanned
    val scanned = verdicts.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten
    assert(scanned.nonEmpty)
    assert(scanned.forall(_.contains(wh)),
      s"plan scans outside the warehouse: $scanned")
    assert(scanned.exists(_.contains("indexes/dedup_content_keys")))
    assert(scanned.exists(_.contains("indexes/dedup_band_keys")))

    val got = verdicts.collect().map(r => (r.getLong(0),
      (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got === expected)
    assert(got.values.exists(_._2), "no near-dup verdict — vacuous")
    assert(got.values.exists(_._3), "nothing kept — vacuous")

    // the STREAMING face probes the SAME persisted tables: arriving
    // docs against the warehouse indexes, verdicts identical
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val keysTbl = spark.read.parquet(s"$wh/indexes/dedup_content_keys")
      .where(col("dwh_batch_id") =!= "B2").select("text_key").distinct()
    val bandsTbl = spark.read.parquet(s"$wh/indexes/dedup_band_keys")
      .where(col("dwh_batch_id") =!= "B2").select("band_key").distinct()
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingJobs.dedupIncrementalStream(
        ms.toDF().toDF("doc_id", "text"), keysTbl, bandsTbl)
      .writeStream.format("memory").queryName("idx_dedup_stream")
      .outputMode("append").start()
    try {
      ms.addData(fresh.na.fill("", Seq("text")).as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val gotStream = spark.table("idx_dedup_stream")
      .collect().map(r => (r.getLong(0),
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(gotStream === expected)
  }

  test("span index persists per batch; report and stream marks probe the table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = Files.createTempDirectory("graft_span_idx").toString
    val dir = "/root/testdata/sf0.01"
    val docs = Tables.t(spark, dir, "documents")
    val corpus = docs.where(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val fresh = docs.where(col("doc_id") % 10 === 0).select("doc_id", "text")
    // ground truth: the registered scan-derived row on the same split
    val expected = SparkEntry.queries("q_text_dup_spans_incremental")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(expected.nonEmpty, "fixture lost its planted duplicate spans")

    val run1 = new Orchestrator.Run(spark, wh, "B1")
    val n1 = run1.indexSpanBatch(corpus)
    assert(n1 > 0)
    run1.flushAudit()
    // S8 on the span-index plane: re-indexing replaces its partition
    new Orchestrator.Run(spark, wh, "B1").indexSpanBatch(corpus)
    assert(spark.read.parquet(s"$wh/indexes/span_window_hashes").count() === n1)

    // batch 2 indexes itself, then reports against every OTHER batch's
    // partition (own excluded) + its internal repeats
    val run2 = new Orchestrator.Run(spark, wh, "B2")
    run2.indexSpanBatch(fresh)
    val got = run2.spanReportAgainstIndex(fresh)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)

    // the STREAMING face: arriving docs emit their corpus-marked window
    // positions, stateless; equal to the batch corpus-hit marks
    val idx = spark.read.parquet(s"$wh/indexes/span_window_hashes")
      .where(col("dwh_batch_id") =!= "B2").select("h").distinct()
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingJobs.spanMarkStream(
        ms.toDF().toDF("doc_id", "text"), idx)
      .writeStream.format("memory").queryName("span_marks")
      .outputMode("append").start()
    try {
      ms.addData(fresh.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val gotStream = spark.table("span_marks")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.queries.TextQueries.windowPositionsOf(fresh)
      .join(idx, Seq("h"), "left_semi")
      .select(col("doc_id"), col("i"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotStream === want)
    assert(gotStream.nonEmpty, "no streamed marks — vacuous")
  }

  test("ann index: an empty batch cannot bootstrap (or brick) the centroid table") {
    val wh = Files.createTempDirectory("graft_ann_empty").toString
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.t(spark, dir, "embeddings").select("vec_id", "embedding")
    // an empty slice writes NOTHING — an empty bootstrap would pass the
    // existence check forever and permanently break every later read
    val run1 = new Orchestrator.Run(spark, wh, "B0")
    assert(run1.indexAnnBatch(emb.where(col("vec_id") < 0), nlist = 16) === 0L)
    assert(!graft.run.WarehouseFs.exists(
      Orchestrator.tablePath(wh, "indexes/ann_centroids")))
    assert(run1.auditLog.exists(l =>
      l.status == "SKIPPED_EMPTY" && l.target == "indexes/ann_lists"))
    // the first NON-empty batch still bootstraps normally afterwards
    val run2 = new Orchestrator.Run(spark, wh, "B1")
    assert(run2.indexAnnBatch(emb.limit(20), nlist = 16) === 20L)
    assert(spark.read.parquet(
      Orchestrator.tablePath(wh, "indexes/ann_centroids")).count() > 0)
  }

  test("ann index: centroids persist once; batches assign and search via tables") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val wh = Files.createTempDirectory("graft_ann_idx").toString
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.t(spark, dir, "embeddings").select("vec_id", "embedding")
    val corpus = emb.where(col("vec_id") % 10 =!= 0)
    val fresh = emb.where(col("vec_id") % 10 === 0)

    val run1 = new Orchestrator.Run(spark, wh, "B1")
    run1.writeBatch(corpus, "bronze/embeddings")
    run1.indexAnnBatch(run1.readBatch("bronze/embeddings")
      .select("vec_id", "embedding"), nlist = 16)
    run1.flushAudit()
    // batch 2 assigns against the EXISTING centroids — no re-bootstrap
    val run2 = new Orchestrator.Run(spark, wh, "B2")
    run2.writeBatch(fresh, "bronze/embeddings")
    run2.indexAnnBatch(run2.readBatch("bronze/embeddings")
      .select("vec_id", "embedding"), nlist = 16)
    val centParts = graft.run.WarehouseFs.listNames(
        Orchestrator.tablePath(wh, "indexes/ann_centroids"))
      .filter(_.startsWith("dwh_batch_id="))
    assert(centParts === Seq("dwh_batch_id=B1"),
      s"centroids re-bootstrapped: ${centParts.mkString(", ")}")
    val lists = spark.read.parquet(
      Orchestrator.tablePath(wh, "indexes/ann_lists"))
    assert(lists.count() === emb.count())
    assert(lists.select("vec_id").distinct().count() === emb.count())

    val probes = emb.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val result = run2.annSearchIndexes(probes, k = 5, nprobe = 3)
    // the search plan reads only warehouse tables (centroids, lists,
    // stored vectors) apart from the probe input itself
    val scanned = result.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten
    assert(scanned.exists(_.contains(
      Orchestrator.tablePath(wh, "indexes/ann_centroids"))))
    assert(scanned.exists(_.contains(
      Orchestrator.tablePath(wh, "indexes/ann_lists"))))
    assert(scanned.exists(_.contains("bronze/embeddings")))

    // independent ground truth in plain Scala over the same lattice
    def q(f: Seq[Float]): Array[Long] =
      f.map(x => math.floor(x.toDouble * 1000).toLong).toArray
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> q(r.getSeq[Float](1))).toMap
    val cents = spark.read.parquet(
        Orchestrator.tablePath(wh, "indexes/ann_centroids"))
      .select("cent_id", "cv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def nearest(v: Array[Long]) =
      cents.toSeq.map { case (c, cv) => (l2(v, cv), c) }.min._2
    val assignGT = vecs.map { case (id, v) => id -> nearest(v) }
    val want = vecs.keys.filter(_ % 50 == 0).flatMap { qid =>
      val top3 = cents.toSeq.map { case (c, cv) => (l2(vecs(qid), cv), c) }
        .sorted.take(3).map(_._2).toSet
      vecs.keys.filter(v => v != qid && top3.contains(assignGT(v)))
        .map(v => (l2(vecs(qid), vecs(v)), v))
        .toSeq.sorted.take(5).zipWithIndex
        .map { case ((_, v), i) => (qid, v, i + 1) }
    }.toSet
    val got = result.select("q_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong.toInt)).toSet
    assert(got === want)
    assert(want.nonEmpty, "no search results — vacuous")

    // table-backed incremental near-dup verdicts: B2's vectors against
    // the B1 corpus only (own-batch partitions excluded — B2's vectors
    // must never match themselves or each other), same probe
    // discipline as the search, eps picked from the ground-truth best
    // distances so BOTH verdict branches are exercised
    val freshIds = vecs.keys.filter(_ % 10 == 0).toSeq.sorted
    def bestGT(qid: Long, eps: Long): Option[(Long, Long)] = {
      val top3 = cents.toSeq.map { case (c, cv) => (l2(vecs(qid), cv), c) }
        .sorted.take(3).map(_._2).toSet
      val cands = vecs.keys
        .filter(v => v % 10 != 0 && top3.contains(assignGT(v)))
        .map(v => (l2(vecs(qid), vecs(v)), v)).toSeq.sorted
      cands.headOption.filter(_._1 <= eps).map { case (d, v) => (v, d) }
    }
    val bests = freshIds.flatMap(q => bestGT(q, Long.MaxValue).map(_._2))
    val eps = bests.sorted.apply(bests.size / 2) // median: splits verdicts
    val verdicts = run2.dedupAgainstAnnIndexes(
        fresh.select(col("vec_id"), col("embedding")), eps)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    assert(verdicts.keySet === freshIds.toSet,
      "every batch vector gets exactly one verdict row")
    freshIds.foreach { q =>
      assert(verdicts(q) === bestGT(q, eps), s"verdict mismatch for $q")
    }
    val nDup = verdicts.values.count(_.isDefined)
    assert(nDup > 0 && nDup < freshIds.size,
      s"fixture too weak: $nDup/${freshIds.size} dups — both branches " +
        "must be exercised")
  }
}
