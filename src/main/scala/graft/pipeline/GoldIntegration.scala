package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver→gold star-schema integration: two dimensions and the fact,
  * with ROW_NUMBER surrogate keys (the reference's design-doc keying,
  * Integration_dim_customers.sql:2-5 / Integration_dim_products.sql:2-6)
  * and the COALESCE(-1) unknown-member fallback.
  *
  * Surrogate keys are computed with NO single-partition pass over the
  * dimension rows (`scalableRowNumber` below): per-bucket ROW_NUMBER
  * plus an exclusive prefix-sum offset over the tiny bucket-count
  * table — the q_surrogate_key_scalable pattern promoted from a demo
  * query to the production keying path, so a 100× dimension never rides
  * an Exchange-to-1.
  */
object GoldIntegration {

  /** Global ROW_NUMBER(ORDER BY order…) as `__sk`, without a global
    * sort: rows shuffle once on `bucket`, get a per-bucket row_number,
    * and add the exclusive running total of earlier buckets' counts
    * (a window over ≈#buckets rows, broadcast back).
    *
    * CONTRACT: `bucket` must be monotone non-decreasing in the leading
    * `order` column (an id range, a key prefix — never a hash), so that
    * bucket-major + within-bucket order ≡ the global order and the
    * result is bit-identical to the single-window form the oracle
    * computes. The input is evaluated twice (counts + keying) — at
    * dimension scale that is two cheap scans; the alternative is a
    * single-partition sort of every dim row.
    */
  private def scalableRowNumber(df: DataFrame, bucket: Column,
                                order: Seq[Column]): DataFrame = {
    val withB = df.withColumn("__sk_bucket", bucket)
    val wPart = Window.partitionBy(col("__sk_bucket")).orderBy(order: _*)
    val wOff = Window.orderBy(col("__sk_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withB.groupBy(col("__sk_bucket"))
      .agg(count(lit(1)).as("__sk_n"))
      .withColumn("__sk_off", coalesce(sum(col("__sk_n")).over(wOff), lit(0L)))
      .select(col("__sk_bucket"), col("__sk_off"))
    withB.join(broadcast(offsets), "__sk_bucket")
      .withColumn("__sk",
        (col("__sk_off") + row_number().over(wPart)).cast("long"))
      .drop("__sk_bucket", "__sk_off")
  }

  /** gold.dim_customers: 3-way silver join + gender merge.
    * `country` is appended as a window tiebreak beyond the reference's
    * ORDER BY cst_id because the fixture's loc table contains one
    * duplicate cid after dash-strip (AW00011003) — the reference fans
    * out the same way but numbers the pair arbitrarily.
    * Ref: tools.load_dim_customers_v1.sql:55-85
    */
  def dimCustomers(cust: DataFrame, ca: DataFrame, la: DataFrame): DataFrame = {
    val joined = cust.alias("ci")
      .join(ca.alias("ca"),
        col("ci.cst_key") === col("ca.cid")
          && col("ci.dwh_batch_id") === col("ca.dwh_batch_id"), "left")
      .join(la.alias("la"),
        col("ci.cst_key") === col("la.cid")
          && col("ci.dwh_batch_id") === col("la.dwh_batch_id"), "left")
    // bucket = id range (monotone in cst_id): scalable two-phase keying
    val keyed = scalableRowNumber(joined,
      floor(col("ci.cst_id") / 4096),
      Seq(col("ci.cst_id"), col("la.cntry")))
    keyed.select(
      col("__sk").as("customer_key"),
      col("ci.cst_id").as("customer_id"),
      col("ci.cst_key").as("customer_number"),
      col("ci.cst_firstname").as("customer_firstname"),
      col("ci.cst_lastname").as("customer_lastname"),
      when(col("ci.cst_gndr") =!= "Unknown", col("ci.cst_gndr"))
        .otherwise(coalesce(col("ca.gen"), lit("Unknown"))).as("gender"),
      col("ci.cst_marital_status").as("marital_status"),
      col("la.cntry").as("country"),
      col("ca.bdate").as("birth_date"),
      col("ci.cst_create_date").as("create_date"),
      col("ci.dwh_batch_id").as("dwh_batch_id"))
  }

  /** gold.dim_products: current products only (P5 prd_end_dt IS NULL) +
    * category enrichment.
    * Ref: tools.load_dim_products_v1.sql:55-85
    */
  def dimProducts(prd: DataFrame, px: DataFrame): DataFrame = {
    val joined = prd.alias("po")
      .where(col("prd_end_dt").isNull)
      .join(px.alias("pc"),
        col("po.cat_id") === col("pc.id")
          && col("po.dwh_batch_id") === col("pc.dwh_batch_id"), "left")
    // bucket = 2-char key prefix (monotone in prd_key's binary order)
    val keyed = scalableRowNumber(joined,
      substring(col("po.prd_key"), 1, 2),
      Seq(col("po.prd_key"), col("po.prd_start_dt"), col("po.prd_id")))
    keyed.select(
      col("__sk").as("product_key"),
      col("po.prd_id").as("product_id"),
      col("po.prd_key").as("product_number"),
      col("po.prd_nm").as("product_name"),
      col("po.prd_line").as("product_line"),
      col("po.cat_id").as("category_id"),
      col("pc.cat").as("category"),
      col("pc.subcat").as("sub_category"),
      col("pc.maintenance").as("maintenance"),
      col("po.prd_cost").as("product_cost"),
      col("po.prd_start_dt").as("start_date"),
      col("po.dwh_batch_id").as("dwh_batch_id"))
  }

  /** gold.fact_sales: surrogate-key lookups with -1 unknown-member
    * fallback. Dims are small → Catalyst broadcasts both lookup joins.
    * Ref: tools.load_fact_sales_v1.sql:40-95
    */
  def factSales(sales: DataFrame, dimProd: DataFrame, dimCust: DataFrame): DataFrame =
    sales.alias("sd")
      .join(broadcast(dimProd.alias("pr")),
        col("sd.sls_prd_key") === col("pr.product_number")
          && col("sd.dwh_batch_id") === col("pr.dwh_batch_id"), "left")
      .join(broadcast(dimCust.alias("cs")),
        col("sd.sls_cust_id") === col("cs.customer_id")
          && col("sd.dwh_batch_id") === col("cs.dwh_batch_id"), "left")
      .select(
        col("sd.sls_ord_num").as("order_number"),
        coalesce(col("cs.customer_key"), lit(-1L)).as("customer_key"),
        coalesce(col("pr.product_key"), lit(-1L)).as("product_key"),
        col("sd.sls_order_dt").as("order_date"),
        col("sd.sls_ship_dt").as("shipping_date"),
        col("sd.sls_due_dt").as("due_date"),
        col("sd.sls_sales").as("sales"),
        col("sd.sls_quantity").as("quantity"),
        col("sd.sls_price").as("price"),
        col("sd.dwh_batch_id").as("dwh_batch_id"))
}
