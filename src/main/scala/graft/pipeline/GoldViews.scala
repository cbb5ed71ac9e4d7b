package graft.pipeline

import graft.plans.Recursion
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The 9 gold analytic materialized views as DataFrame functions; a full
  * refresh is `view.write.mode("overwrite")` — matching the reference's
  * REFRESH MATERIALIZED VIEW semantics (sql/tools/MV Refresh Template.sql:30).
  *
  * `fs.sales` is integer-valued on this data (sales = qty × price with
  * integer inputs), so double SUMs are order-independent and exact —
  * no decimal-cast discipline needed here.
  * Ref: sql/gold/materialized_view.sql:2-149
  *
  * Cross-batch contract: surrogate keys are PER-BATCH (the reference's
  * delete-then-insert renumbers each batch's dim slice with its own
  * ROW_NUMBER, tools.load_dim_customers_v1.sql:45-85), so every fact-dim
  * join here is batch-qualified when both frames carry `dwh_batch_id`.
  * The reference's MV SQL omits the batch condition
  * (materialized_view.sql:10,23 — a latent cross-batch key fan-out its
  * single-batch fixture never exercises); output is identical for a
  * single batch and well-defined for many.
  */
object GoldViews {

  /** Join keys for a fact-dim join: batch-qualified iff both sides carry
    * the batch column (per-batch surrogate keys — see object Scaladoc).
    * A MIXED pair is a contract error, not a fallback: silently joining
    * a multi-batch fact against a batch-less dim on the bare surrogate
    * key is exactly the cross-batch fan-out this helper exists to
    * prevent.
    */
  private def keys(a: DataFrame, b: DataFrame, key: String): Seq[String] = {
    val (ab, bb) = (a.columns.contains("dwh_batch_id"),
      b.columns.contains("dwh_batch_id"))
    require(ab == bb,
      s"fact-dim join on $key: one side carries dwh_batch_id and the " +
        "other does not — per-batch surrogate keys make a key-only join " +
        "across batches meaningless; carry the batch column on both or drop it on both")
    if (ab) Seq(key, "dwh_batch_id") else Seq(key)
  }

  /** MV1: monthly sales per product. Ref: materialized_view.sql:2-12 */
  def salesMonthlyProductline(fact: DataFrame, dimProd: DataFrame): DataFrame =
    fact.join(broadcast(dimProd), keys(fact, dimProd, "product_key"))
      .groupBy(date_trunc("month", col("order_date")).cast(DateType).as("month"),
        col("product_name"), col("category"), col("sub_category"))
      .agg(sum(col("sales")).as("total_sales"))

  /** MV2: sales per customer per country. Ref: materialized_view.sql:16-25 */
  def salesCustomerCountry(fact: DataFrame, dimCust: DataFrame): DataFrame =
    fact.join(broadcast(dimCust), keys(fact, dimCust, "customer_key"))
      .groupBy(col("country"), col("customer_id"),
        concat(col("customer_firstname"), lit(" "), col("customer_lastname"))
          .as("customer_name"))
      .agg(sum(col("sales")).as("total_sales"))

  /** MV3: customer lifetime value. Ref: materialized_view.sql:29-38 */
  def customerLifetimeValue(fact: DataFrame, dimCust: DataFrame): DataFrame =
    fact.join(broadcast(dimCust), keys(fact, dimCust, "customer_key"))
      .groupBy(col("customer_id"),
        concat(col("customer_firstname"), lit(" "), col("customer_lastname"))
          .as("customer_name"))
      .agg(sum(col("sales")).as("lifetime_value"),
        countDistinct(col("order_number")).cast(LongType).as("order_count"))

  /** MV4: running cumulative sales per customer. The reference orders
    * only by order_date (nondeterministic across tied line items); a
    * (order_number, product_key) tiebreak is appended on both engines.
    * Ref: materialized_view.sql:42-53
    */
  def runningSalesCustomer(fact: DataFrame, dimCust: DataFrame): DataFrame = {
    // asc_nulls_last: Postgres/DuckDB default ASC NULLS LAST vs Spark's
    // nulls-first — 19 repaired-to-null order dates would otherwise shift
    // every running sum.
    val w = Window.partitionBy(col("customer_id"))
      .orderBy(col("order_date").asc_nulls_last, col("order_number"),
        col("product_key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fact.join(broadcast(dimCust), keys(fact, dimCust, "customer_key"))
      .select(col("customer_id"), col("order_date"),
        sum(col("sales")).over(w).as("running_sales"))
  }

  /** MV5: top-3 products per month per country. Ref: materialized_view.sql:57-76 */
  def top3ProductsMonthCountry(fact: DataFrame, dimCust: DataFrame,
                               dimProd: DataFrame): DataFrame = {
    val perProduct = fact
      .join(broadcast(dimCust), keys(fact, dimCust, "customer_key"))
      .join(broadcast(dimProd), keys(fact, dimProd, "product_key"))
      .groupBy(date_trunc("month", col("order_date")).cast(DateType).as("month"),
        col("country"), col("product_name"))
      .agg(sum(col("sales")).as("total_sales"))
    val w = Window.partitionBy(col("month"), col("country"))
      .orderBy(col("total_sales").desc)
    perProduct
      .withColumn("rank_sales", rank().over(w).cast(LongType))
      .where(col("rank_sales") <= 3)
  }

  /** MV6: churn flag (no purchase in 6 months before refDate).
    * Ref: materialized_view.sql:80-91
    */
  def customerChurn(fact: DataFrame, dimCust: DataFrame, refDate: String): DataFrame =
    fact.join(broadcast(dimCust), keys(fact, dimCust, "customer_key"))
      .groupBy(col("customer_id"))
      .agg(min(col("order_date")).as("first_purchase"),
        max(col("order_date")).as("last_purchase"))
      .withColumn("is_churn",
        col("last_purchase") < add_months(lit(refDate).cast(DateType), -6))

  /** MV7: average inter-order gap per customer. Ref: materialized_view.sql:96-111 */
  def customerOrderGap(fact: DataFrame, dimCust: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("customer_id"))
      .orderBy(col("order_date").asc_nulls_last)
    fact.join(broadcast(dimCust), keys(fact, dimCust, "customer_key"))
      .withColumn("prev_date", lag(col("order_date"), 1).over(w))
      .withColumn("order_gap",
        datediff(col("order_date"), col("prev_date")).cast(LongType))
      .where(col("prev_date").isNotNull)
      .groupBy(col("customer_id"))
      .agg((sum(col("order_gap")).cast(DoubleType) / count(lit(1)))
        .as("avg_gap_days"))
  }

  /** MV8: ROLLUP over the product hierarchy. Ref: materialized_view.sql:113-122 */
  def salesRollupProduct(fact: DataFrame, dimProd: DataFrame): DataFrame =
    fact.join(broadcast(dimProd), keys(fact, dimProd, "product_key"))
      .rollup(col("product_line"), col("category"), col("sub_category"))
      .agg(sum(col("sales")).as("total_sales"))

  /** MV9: recursive delayed-orders chain — seed = late shipments, step =
    * same-customer later orders; Spark has no recursive CTE so this is
    * the iterative fixpoint (graft.plans.Recursion).
    * Ref: materialized_view.sql:126-149
    */
  def delayedOrdersChain(fact: DataFrame, maxLevels: Int = 30): DataFrame = {
    // batch-scoped when the input carries batches: customer_key is a
    // per-batch surrogate, so a cross-batch chain step would link
    // unrelated customers (see object Scaladoc)
    val batched = fact.columns.contains("dwh_batch_id")
    val baseNames = Seq("order_number", "customer_key", "order_date",
      "shipping_date", "due_date") ++ (if (batched) Seq("dwh_batch_id") else Nil)
    // ONE materialization of the order slice, keyed by the chain key
    // (r21, guide §2.4): every recursion level joins `base` on
    // customer_key, and the lazy form re-derived the caller's slice
    // plan (distinct + eligibility aggregate + join on the seeded row)
    // per level AND re-exchanged it per level. Cut + keyed repartition
    // makes each level read a co-partitioned materialized leaf — and
    // each level's output (projected to the fs side's customer_key)
    // carries the same partitioning through its pin, so the level
    // joins stop exchanging either side.
    val base = graft.plans.Checkpoints.cut(
      fact.select(baseNames.map(col): _*)
        .repartition(col("customer_key")))
    val seed = base
      .where(col("shipping_date") > col("due_date"))
      .withColumn("level", lit(1L))
    val stepCond = col("fs.customer_key") === col("d.customer_key") &&
      (if (batched) col("fs.dwh_batch_id") === col("d.dwh_batch_id") else lit(true)) &&
      col("fs.order_date") > col("d.shipping_date")
    Recursion.iterate(seed,
      prev => base.alias("fs")
        .join(prev.alias("d"), stepCond)
        .select(baseNames.map(n => col("fs." + n)) :+
          (col("d.level") + 1).as("level"): _*),
      maxLevels)
      .select(col("order_number"), col("customer_key"),
        col("shipping_date"), col("due_date"), col("level"))
  }
}
