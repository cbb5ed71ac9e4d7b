package graft.run

import graft.pipeline.{GoldIntegration, GoldViews, SilverTransforms}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's metadata plane as DATA, not code: the rows of
  * `tools.integration_config`, `tools.integration_dependencies`,
  * `tools.mv_refresh_config` and `tools.transformation_config`
  * (sql/tools/ddl_tools.sql:70-110) live in JSON-lines files under
  * `$warehouse/tools/` and are read back through Spark, exactly as the
  * reference queries them through its engine
  * (scripts/gold_integration.py:42-64, scripts/refresh_mv.py:43-58).
  *
  * Config names a BUILDER (a registered transformation, the analog of
  * the reference's proc name column); the registries below map names to
  * code. Onboarding a new target, disabling one, or re-ordering the DAG
  * is therefore a row edit — no recompile — while an unknown builder
  * name fails that one step with a FAILED audit row instead of the run.
  */
object ToolsConfig {

  import Orchestrator.{IntegrationStep, Run}

  /** A named builder: (run context, reference date) → deferred frame. */
  type Builder = (Run, String) => () => DataFrame

  final case class TransformRow(source: String, target: String,
                                transform: String,
                                sourceConfig: Map[String, String])

  // ---------------------------------------------------------------- paths

  private def toolsDir(warehouse: String) = s"$warehouse/tools"
  def maintenanceConfigPath(warehouse: String) =
    s"${toolsDir(warehouse)}/maintenance_config.json"
  def integrationConfigPath(warehouse: String) =
    s"${toolsDir(warehouse)}/integration_config.json"
  def dependenciesPath(warehouse: String) =
    s"${toolsDir(warehouse)}/integration_dependencies.json"
  def mvConfigPath(warehouse: String) =
    s"${toolsDir(warehouse)}/mv_refresh_config.json"
  def transformConfigPath(warehouse: String) =
    s"${toolsDir(warehouse)}/transformation_config.json"

  // ------------------------------------------------------------- loaders

  /** Edges of integration_dependencies: one row per (target, dependency),
    * as in the reference's table (ddl_tools.sql:86-92). Shared by the
    * gold DAG and the MV refresh plane.
    */
  private def loadDependencies(spark: SparkSession,
                               warehouse: String): Map[String, Seq[String]] = {
    val p = dependenciesPath(warehouse)
    if (!WarehouseFs.exists(p)) Map.empty
    else spark.read
      .schema("target_table STRING, depends_on STRING").json(p)
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
  }

  /** integration_config / mv_refresh_config rows (they share a shape;
    * the reference splits them into two tables and so do we). Disabled
    * rows are filtered here — a disabled target never reaches the DAG,
    * mirroring `WHERE enabled` in the reference's config queries.
    * Returns (step, builderName) ordered by run_order.
    */
  def loadSteps(spark: SparkSession, warehouse: String,
                configPath: String): Seq[(IntegrationStep, String)] = {
    val deps = loadDependencies(spark, warehouse)
    spark.read
      .schema("target_table STRING, run_order INT, enabled BOOLEAN, builder STRING")
      .json(configPath)
      .collect()
      .filter(r => r.isNullAt(2) || r.getBoolean(2))
      .map { r =>
        val target = r.getString(0)
        (IntegrationStep(target, r.getInt(1), deps.getOrElse(target, Nil)),
          r.getString(3))
      }
      .sortBy(_._1.runOrder).toSeq
  }

  /** One mv_refresh_config row with its refresh strategy: "full"
    * (REFRESH MATERIALIZED VIEW — the reference's only mode, and the
    * default when the column is absent) or "incremental" (per-batch
    * partial merge, [[graft.run.MvIncremental]]). Schema-on-read like
    * `source_config`: existing config files parse unchanged.
    */
  final case class MvStep(step: IntegrationStep, builder: String,
                          strategy: String)

  /** mv_refresh_config rows WITH the optional strategy column. A
    * strategy the runner can't honor (e.g. "incremental" on a builder
    * with no [[graft.run.MvIncremental]] spec) falls back to full
    * refresh — config requests a plan, the runner picks the correct
    * one it can serve (same config-error-is-not-abort policy as
    * `resolve`).
    */
  def loadMvSteps(spark: SparkSession, warehouse: String): Seq[MvStep] = {
    val deps = loadDependencies(spark, warehouse)
    spark.read
      .schema("target_table STRING, run_order INT, enabled BOOLEAN, builder STRING, strategy STRING")
      .json(mvConfigPath(warehouse))
      .collect()
      .filter(r => r.isNullAt(2) || r.getBoolean(2))
      .map { r =>
        val target = r.getString(0)
        MvStep(
          IntegrationStep(target, r.getInt(1), deps.getOrElse(target, Nil)),
          r.getString(3),
          if (r.isNullAt(4)) "full" else r.getString(4))
      }
      .sortBy(_.step.runOrder).toSeq
  }

  /** Refresh cadence for a full-fixpoint artifact (the graph-rank /
    * whole-graph plane): the mv_refresh_config row for `target` may
    * carry an optional `refresh_every` column — refresh once per that
    * many landed input batches (see Run.refreshGraphRanksIfDue).
    * Schema-on-read like `strategy`: existing config files, a missing
    * row, or a null column all mean 1 = refresh on every landing (the
    * reference's only mode, and the prior hard-coded behavior). A
    * non-positive value is a config error and fails loudly — a 0 would
    * silently freeze the artifact forever.
    */
  def refreshCadence(spark: SparkSession, warehouse: String,
                     target: String): Int = {
    val p = mvConfigPath(warehouse)
    if (!WarehouseFs.exists(p)) 1
    else {
      val every = intConfig(spark, p, target, "refresh_every").getOrElse(1)
      require(every >= 1,
        s"refresh_every for $target must be >= 1, got $every — a " +
          "non-positive cadence would freeze the artifact forever")
      every
    }
  }

  /** One optional-int config column, read LOUDLY: the column comes in
    * as STRING and is parsed here, because an INT schema-on-read
    * silently NULLs a mistyped value (e.g. the JSON string "5") under
    * PERMISSIVE parsing — and a silently-nulled cadence or retention
    * value means the config row does nothing while looking set, the
    * opposite of the fail-loudly contract both callers document.
    */
  private def intConfig(spark: SparkSession, path: String, target: String,
                        column: String): Option[Int] =
    spark.read
      .schema(s"target_table STRING, $column STRING").json(path)
      .collect()
      .collectFirst {
        case r if r.getString(0) == target && !r.isNullAt(1) =>
          val raw = r.getString(1).trim
          try raw.toInt
          catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"$column for $target is '$raw' — not an integer; fix the " +
                "config row (a silently ignored value would leave the " +
                "behavior default while looking configured)")
          }
      }

  /** Config-driven retention (the Run.vacuumIfConfigured plane): the
    * mv_refresh_config row for `table` may carry an optional
    * `retention_keep_last` column. Unlike `refresh_every` there is NO
    * default — retention deletes data, so a missing file, row or
    * column means "never vacuum" and the op is a no-op; making
    * retention opt-in is the difference between a config plane and a
    * foot-gun. A configured value below 1 fails loudly (vacuuming to
    * empty is a drop-table decision, the vacuumBatches floor).
    */
  def retentionKeepLast(spark: SparkSession, warehouse: String,
                        table: String): Option[Int] = {
    val p = mvConfigPath(warehouse)
    if (!WarehouseFs.exists(p)) None
    else {
      val keep = intConfig(spark, p, table, "retention_keep_last")
      keep.foreach(k => require(k >= 1,
        s"retention_keep_last for $table must be >= 1, got $k — " +
          "vacuuming a table to empty is a drop-table decision, not " +
          "retention"))
      keep
    }
  }

  /** One maintenance_config row: a lifecycle op
    * (compact_batches / vacuum_compacted / compact_audit / vacuum_audit)
    * to run once per `every` landed batches against `target` (a layer
    * table for the table ops; ignored by the audit ops, whose target is
    * always tools/audit_log).
    */
  final case class MaintRow(op: String, target: String, every: Int)

  /** maintenance_config rows — the cadence plane for the warehouse's
    * lifecycle ops (Run.runMaintenanceIfDue). OPT-IN like retention: a
    * missing file means no automated maintenance (compaction rewrites
    * bytes and vacuum deletes them — neither should surprise an
    * operator), and a disabled row never fires. `every` follows the
    * refresh_every contract: default 1 (fire on every landed batch),
    * loud integer parse, non-positive refused — a silently-zero cadence
    * would freeze the op while looking configured.
    */
  def loadMaintenance(spark: SparkSession,
                      warehouse: String): Seq[MaintRow] = {
    val p = maintenanceConfigPath(warehouse)
    if (!WarehouseFs.exists(p)) Seq.empty
    else spark.read
      .schema("op STRING, target_table STRING, every STRING, enabled BOOLEAN")
      .json(p)
      .collect()
      .filter(r => r.isNullAt(3) || r.getBoolean(3))
      .map { r =>
        val op = r.getString(0)
        val every =
          if (r.isNullAt(2)) 1
          else {
            val raw = r.getString(2).trim
            try raw.toInt
            catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"maintenance every for '$op' is '$raw' — not an " +
                    "integer; fix the config row (a silently ignored " +
                    "value would leave the cadence default while " +
                    "looking configured)")
            }
          }
        require(every >= 1,
          s"maintenance every for '$op' must be >= 1, got $every — a " +
            "non-positive cadence would freeze the op forever")
        MaintRow(op, Option(r.getString(1)).getOrElse(""), every)
      }.toSeq
  }

  /** transformation_config rows: bronze→silver steps in file order.
    * `source_config` is the reference's JSONB parameter blob
    * (ddl_tools.sql:22) as a typed map — schema-on-read, so a row can
    * carry per-transform parameters (e.g. a `ref_date` override) that
    * the builders consume without code changes.
    */
  def loadTransforms(spark: SparkSession,
                     warehouse: String): Seq[TransformRow] = {
    spark.read
      .schema("source_table STRING, target_table STRING, transform_name STRING, enabled BOOLEAN, source_config MAP<STRING, STRING>")
      .json(transformConfigPath(warehouse))
      .collect()
      .filter(r => r.isNullAt(3) || r.getBoolean(3))
      .map(r => TransformRow(r.getString(0), r.getString(1), r.getString(2),
        if (r.isNullAt(4)) Map.empty
        else r.getMap[String, String](4).toMap))
      .toSeq
  }

  /** Resolve a builder name against a registry; an unknown name becomes
    * a deferred failure so the gated runner logs FAILED for that one
    * step (config error ≠ run abort).
    */
  def resolve(registry: Map[String, Builder], name: String,
              run: Run, refDate: String): () => DataFrame =
    registry.get(name).map(_(run, refDate)).getOrElse(
      () => throw new IllegalArgumentException(
        s"unknown builder '$name' — registered: ${registry.keys.toSeq.sorted.mkString(", ")}"))

  // ---------------------------------------------------------- registries

  /** Silver transforms by name (transformation_config.transform_name). */
  val silverTransforms: Map[String, (DataFrame, String) => DataFrame] = Map(
    "crm_cust_info" -> ((df, ref) => SilverTransforms.crmCustInfo(df, ref)),
    "crm_prd_info" -> ((df, _) => SilverTransforms.crmPrdInfo(df)),
    "crm_sales_details" -> ((df, _) => SilverTransforms.crmSalesDetails(df)),
    "erp_cust_az12" -> ((df, ref) => SilverTransforms.erpCustAz12(df, ref)),
    "erp_loc_a101" -> ((df, _) => SilverTransforms.erpLocA101(df)),
    "erp_px_cat_g1v2" -> ((df, _) => SilverTransforms.erpPxCatG1v2(df)))

  /** Gold integration builders (integration_config.builder), deferred so
    * a gated step never touches its possibly-missing inputs.
    */
  val goldBuilders: Map[String, Builder] = Map(
    "dim_customers" -> ((run, _) => () => GoldIntegration.dimCustomers(
      run.readBatch("silver/crm_cust_info"),
      run.readBatch("silver/erp_cust_az12"),
      run.readBatch("silver/erp_loc_a101"))),
    "dim_products" -> ((run, _) => () => GoldIntegration.dimProducts(
      run.readBatch("silver/crm_prd_info"),
      run.readBatch("silver/erp_px_cat_g1v2"))),
    "fact_sales" -> ((run, _) => () => GoldIntegration.factSales(
      run.readBatch("silver/crm_sales_details"),
      run.readBatch("gold/dim_products"),
      run.readBatch("gold/dim_customers"))))

  /** MV builders (mv_refresh_config.builder). Full-table reads: a
    * refresh recomputes the view over EVERY landed batch (REFRESH
    * MATERIALIZED VIEW semantics), not the triggering batch's slice —
    * GoldViews batch-qualifies the fact-dim joins because surrogate
    * keys are per-batch (see GoldViews Scaladoc).
    */
  val mvBuilders: Map[String, Builder] = {
    def fact(run: Run) = run.readTable("gold/fact_sales")
    def dimC(run: Run) = run.readTable("gold/dim_customers")
    def dimP(run: Run) = run.readTable("gold/dim_products")
    Map(
      "sales_monthly_productline" -> ((run, _) =>
        () => GoldViews.salesMonthlyProductline(fact(run), dimP(run))),
      "sales_customer_country" -> ((run, _) =>
        () => GoldViews.salesCustomerCountry(fact(run), dimC(run))),
      "customer_lifetime_value" -> ((run, _) =>
        () => GoldViews.customerLifetimeValue(fact(run), dimC(run))),
      "running_sales_customer" -> ((run, _) =>
        () => GoldViews.runningSalesCustomer(fact(run), dimC(run))),
      "top3_products_month_country" -> ((run, _) =>
        () => GoldViews.top3ProductsMonthCountry(fact(run), dimC(run), dimP(run))),
      "customer_churn" -> ((run, ref) =>
        () => GoldViews.customerChurn(fact(run), dimC(run), ref)),
      "customer_order_gap" -> ((run, _) =>
        () => GoldViews.customerOrderGap(fact(run), dimC(run))),
      "sales_rollup_product" -> ((run, _) =>
        () => GoldViews.salesRollupProduct(fact(run), dimP(run))),
      "delayed_orders_chain" -> ((run, _) =>
        () => GoldViews.delayedOrdersChain(fact(run))))
  }

  // ------------------------------------------------------------ defaults

  /** Write one JSON-lines config file atomically
    * ([[WarehouseFs.publishAtomic]] — temp + atomic replace on the
    * warehouse's own filesystem) — the config plane is tiny metadata,
    * so a small-file publish is right; the DATA plane never goes
    * through this path.
    */
  def writeConfigFile(path: String, lines: Seq[String]): Unit =
    WarehouseFs.publishAtomic(path, lines.mkString("", "\n", "\n"))

  private def cfgLine(target: String, order: Int, builder: String): String =
    s"""{"target_table":"$target","run_order":$order,"enabled":true,"builder":"$builder"}"""
  private def depLine(target: String, dep: String): String =
    s"""{"target_table":"$target","depends_on":"$dep"}"""
  private def xfLine(source: String, target: String, name: String): String =
    s"""{"source_table":"$source","target_table":"$target","transform_name":"$name","enabled":true}"""

  /** Seed the warehouse's config plane with the reference DAG iff absent
    * — the equivalent of the reference's `INSERT INTO tools.*` seed DDL.
    * An operator editing these files afterwards changes the DAG with no
    * recompile; existing files are never clobbered.
    */
  def writeDefaultsIfMissing(warehouse: String): Unit = {
    def missing(p: String) = !WarehouseFs.exists(p)

    if (missing(transformConfigPath(warehouse)))
      writeConfigFile(transformConfigPath(warehouse), Seq(
        "crm_cust_info", "crm_prd_info", "crm_sales_details",
        "erp_cust_az12", "erp_loc_a101", "erp_px_cat_g1v2")
        .map(n => xfLine(s"bronze/$n", s"silver/$n", n)))

    if (missing(integrationConfigPath(warehouse)))
      writeConfigFile(integrationConfigPath(warehouse), Seq(
        cfgLine("gold/dim_customers", 1, "dim_customers"),
        cfgLine("gold/dim_products", 2, "dim_products"),
        cfgLine("gold/fact_sales", 3, "fact_sales")))

    if (missing(mvConfigPath(warehouse)))
      writeConfigFile(mvConfigPath(warehouse), Seq(
        cfgLine("gold/mv_sales_monthly_productline", 1, "sales_monthly_productline"),
        cfgLine("gold/mv_sales_customer_country", 2, "sales_customer_country"),
        cfgLine("gold/mv_customer_lifetime_value", 3, "customer_lifetime_value"),
        cfgLine("gold/mv_running_sales_customer", 4, "running_sales_customer"),
        cfgLine("gold/mv_top3_products_month_country", 5, "top3_products_month_country"),
        cfgLine("gold/mv_customer_churn", 6, "customer_churn"),
        cfgLine("gold/mv_customer_order_gap", 7, "customer_order_gap"),
        cfgLine("gold/mv_sales_rollup_product", 8, "sales_rollup_product"),
        cfgLine("gold/mv_delayed_orders_chain", 9, "delayed_orders_chain")))

    if (missing(dependenciesPath(warehouse))) {
      val silverDeps = Map(
        "gold/dim_customers" -> Seq("silver/crm_cust_info",
          "silver/erp_cust_az12", "silver/erp_loc_a101"),
        "gold/dim_products" -> Seq("silver/crm_prd_info",
          "silver/erp_px_cat_g1v2"),
        "gold/fact_sales" -> Seq("silver/crm_sales_details",
          "gold/dim_customers", "gold/dim_products"))
      val onFact = Seq("gold/fact_sales")
      val onFC = onFact :+ "gold/dim_customers"
      val onFP = onFact :+ "gold/dim_products"
      val mvDeps = Map(
        "gold/mv_sales_monthly_productline" -> onFP,
        "gold/mv_sales_customer_country" -> onFC,
        "gold/mv_customer_lifetime_value" -> onFC,
        "gold/mv_running_sales_customer" -> onFC,
        "gold/mv_top3_products_month_country" -> (onFC :+ "gold/dim_products"),
        "gold/mv_customer_churn" -> onFC,
        "gold/mv_customer_order_gap" -> onFC,
        "gold/mv_sales_rollup_product" -> onFP,
        "gold/mv_delayed_orders_chain" -> onFact)
      writeConfigFile(dependenciesPath(warehouse),
        (silverDeps ++ mvDeps).toSeq.sortBy(_._1).flatMap { case (t, ds) =>
          ds.map(depLine(t, _))
        })
    }
  }
}
