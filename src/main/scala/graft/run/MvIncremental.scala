package graft.run

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, LongType}

/** Incremental maintenance for all 9 gold MVs — the scale
  * extension over the reference's `REFRESH MATERIALIZED VIEW` (full
  * recompute over the whole fact table per batch,
  * sql/tools/MV Refresh Template.sql:30): each landed batch is reduced
  * to a PARTIAL at the MV's merge granularity, written into
  * `mv_partials/<name>/dwh_batch_id=<batch>` through the same S8
  * idempotent dynamic-partition overwrite as every layer table — so a
  * batch RERUN replaces exactly its own partial and the merge can never
  * double-count — and the MV is then rebuilt from the compact partial
  * table, never from the fact table.
  *
  * Why this is the 100 TB shape: per batch, the fact-side work is the
  * DELTA join+aggregate (the new partition only); the rebuild reads
  * partials whose size is bounded by groups x batches (sum/min/max
  * MVs) or by the dim-joined column-pruned projection (the two
  * window-shaped MVs), both orders of magnitude below the fact table.
  * Rebuilding from the partial table — rather than merging the delta
  * partial into the EXISTING MV — is deliberate: old-MV + delta
  * double-counts on a batch RERUN unless a retraction log subtracts
  * the batch's previous contribution first, while the
  * partition-replaced partial table makes reruns idempotent for free
  * (the same reason S8 overwrites partitions instead of appending).
  * True delta windows would need retraction logic (changelog MVs);
  * reducing to a narrow partial and re-windowing is the standard
  * midpoint, and full refresh stays available as the fallback
  * (`ToolsConfig.mvBuilders`). Routing is config-driven: an
  * mv_refresh_config row with `strategy: "incremental"` takes this
  * plane (Orchestrator.runConfiguredBatch), anything else — including
  * an incremental request for a builder with no spec here —
  * full-refreshes. Partial tables are ordinary
  * batch-partitioned layer tables, so the maintenance planes compose:
  * Orchestrator.compactBatches bin-packs their per-batch files like
  * any other table's.
  *
  * Merge-exactness notes, per MV:
  *  - sums are exact (sales is integer-valued on this data, and
  *    sum-of-sums is associative); min/max likewise.
  *  - customer_lifetime_value keeps its partial at (customer, ORDER)
  *    granularity because order numbers CAN repeat across batches (a
  *    rerun-shaped batch re-lands the same orders): per-batch distinct
  *    counts would double-count, a cross-batch COUNT(DISTINCT) over
  *    the order-grain partial cannot.
  *  - the two window MVs (running_sales, order_gap) re-apply exactly
  *    GoldViews' window expressions over the merged partial rows, so
  *    they are output-identical to full refresh by construction.
  */
object MvIncremental {

  /** One incrementally-maintained MV.
    * @param name     MV name (mv_refresh_config builder name); partials
    *                 land at `mv_partials/<name>`, the MV at
    *                 `<prefix>/mv_<name>`
    * @param partial  reduces ONE batch's (fact, dim_customers,
    *                 dim_products) slices — all still carrying
    *                 dwh_batch_id, so GoldViews-style joins stay
    *                 batch-qualified — to the merge-granularity rows
    * @param rebuild  rebuilds the MV from the all-batches partial table
    *                 (dwh_batch_id dropped)
    */
  case class Spec(name: String,
                  partial: (DataFrame, DataFrame, DataFrame) => DataFrame,
                  rebuild: DataFrame => DataFrame)

  /** Specs by builder name (mv_refresh_config.builder) — the lookup the
    * config-driven lifecycle uses to honor `strategy: "incremental"`.
    */
  def byBuilder(refDate: String): Map[String, Spec] =
    specs(refDate).map(sp => sp.name -> sp).toMap

  private def custName =
    concat(col("customer_firstname"), lit(" "), col("customer_lastname"))
      .as("customer_name")

  /** Batch-qualified fact-dim join (per-batch surrogate keys — see
    * GoldViews object doc; inputs here always carry dwh_batch_id).
    */
  private def j(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.join(broadcast(dim), Seq(key, "dwh_batch_id"))

  def specs(refDate: String): Seq[Spec] = Seq(
    Spec("sales_monthly_productline",
      partial = (f, _, dp) => j(f, dp, "product_key")
        .groupBy(date_trunc("month", col("order_date")).cast(DateType)
          .as("month"),
          col("product_name"), col("category"), col("sub_category"))
        .agg(sum(col("sales")).as("total_sales")),
      rebuild = p => p
        .groupBy(col("month"), col("product_name"), col("category"),
          col("sub_category"))
        .agg(sum(col("total_sales")).as("total_sales"))),

    Spec("sales_customer_country",
      partial = (f, dc, _) => j(f, dc, "customer_key")
        .groupBy(col("country"), col("customer_id"), custName)
        .agg(sum(col("sales")).as("total_sales")),
      rebuild = p => p
        .groupBy(col("country"), col("customer_id"), col("customer_name"))
        .agg(sum(col("total_sales")).as("total_sales"))),

    // order-grain partial: see object doc (cross-batch order repeats)
    Spec("customer_lifetime_value",
      partial = (f, dc, _) => j(f, dc, "customer_key")
        .groupBy(col("customer_id"), custName, col("order_number"))
        .agg(sum(col("sales")).as("sales")),
      rebuild = p => p
        .groupBy(col("customer_id"), col("customer_name"))
        .agg(sum(col("sales")).as("lifetime_value"),
          countDistinct(col("order_number")).cast(LongType)
            .as("order_count"))),

    // narrow projection partial; the window re-applies
    // GoldViews.runningSalesCustomer's exact frame over merged rows
    Spec("running_sales_customer",
      partial = (f, dc, _) => j(f, dc, "customer_key")
        .select(col("customer_id"), col("order_date"), col("order_number"),
          col("product_key"), col("sales")),
      rebuild = p => {
        val w = Window.partitionBy(col("customer_id"))
          .orderBy(col("order_date").asc_nulls_last, col("order_number"),
            col("product_key"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        p.select(col("customer_id"), col("order_date"),
          sum(col("sales")).over(w).as("running_sales"))
      }),

    Spec("top3_products_month_country",
      partial = (f, dc, dp) => j(j(f, dc, "customer_key"), dp, "product_key")
        .groupBy(date_trunc("month", col("order_date")).cast(DateType)
          .as("month"),
          col("country"), col("product_name"))
        .agg(sum(col("sales")).as("total_sales")),
      rebuild = p => {
        val merged = p.groupBy(col("month"), col("country"),
          col("product_name"))
          .agg(sum(col("total_sales")).as("total_sales"))
        val w = Window.partitionBy(col("month"), col("country"))
          .orderBy(col("total_sales").desc)
        merged.withColumn("rank_sales", rank().over(w).cast(LongType))
          .where(col("rank_sales") <= 3)
      }),

    Spec("customer_churn",
      partial = (f, dc, _) => j(f, dc, "customer_key")
        .groupBy(col("customer_id"))
        .agg(min(col("order_date")).as("first_purchase"),
          max(col("order_date")).as("last_purchase")),
      rebuild = p => p
        .groupBy(col("customer_id"))
        .agg(min(col("first_purchase")).as("first_purchase"),
          max(col("last_purchase")).as("last_purchase"))
        .withColumn("is_churn",
          col("last_purchase") < add_months(lit(refDate).cast(DateType), -6))),

    // per-row (customer, date) partial; the lag/avg re-applies
    // GoldViews.customerOrderGap's exact expressions over merged rows
    Spec("customer_order_gap",
      partial = (f, dc, _) => j(f, dc, "customer_key")
        .select(col("customer_id"), col("order_date")),
      rebuild = p => {
        val w = Window.partitionBy(col("customer_id"))
          .orderBy(col("order_date").asc_nulls_last)
        p.withColumn("prev_date", lag(col("order_date"), 1).over(w))
          .withColumn("order_gap",
            datediff(col("order_date"), col("prev_date")).cast(LongType))
          .where(col("prev_date").isNotNull)
          .groupBy(col("customer_id"))
          .agg((sum(col("order_gap")).cast(DoubleType) / count(lit(1)))
            .as("avg_gap_days"))
      }),

    // leaf-granularity partial; ROLLUP over leaf sums equals ROLLUP
    // over raw rows (per-grouping-set sums are associative)
    Spec("sales_rollup_product",
      partial = (f, _, dp) => j(f, dp, "product_key")
        .groupBy(col("product_line"), col("category"), col("sub_category"))
        .agg(sum(col("sales")).as("total_sales")),
      rebuild = p => p
        .rollup(col("product_line"), col("category"), col("sub_category"))
        .agg(sum(col("total_sales")).as("total_sales"))),

    // MV9, the recursive chain: batch-scoped BY CONSTRUCTION — surrogate
    // keys are per-batch, so delayedOrdersChain's step predicate pins
    // fs.dwh_batch_id = d.dwh_batch_id and no chain can cross batches.
    // The whole-table chain is therefore EXACTLY the union of per-batch
    // chains: the partial is this batch's full recursion (delta-seeded —
    // seed and every step read only the new batch's slice; the fact-side
    // work per batch is the delta, never the corpus) and the rebuild is
    // the identity merge over the partial table. MvIncrementalSpec
    // proves the union equals the full refresh on the adversarial
    // multi-batch fixture.
    Spec("delayed_orders_chain",
      partial = (f, _, _) =>
        graft.pipeline.GoldViews.delayedOrdersChain(f),
      rebuild = p => p))
}
