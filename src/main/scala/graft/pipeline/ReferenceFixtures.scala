package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bronze-layer readers for the reference fixture batch (BATCH000014).
  *
  * The reference lands pandas-inferred parquet and reconciles it to typed
  * bronze tables via tools.column_mapping renames plus a "smart id-cast"
  * (scripts/load_to_bronze.py:246-262,527-560); the fixture parquet has
  * `cst_id: double` (pandas null-promotion) and all dates as strings.
  * These readers perform the same reconciliation declaratively: rename
  * (e.g. the CSV header typo cst_gendr → bronze cst_gndr,
  * ddl_bronze_client1.sql:12), round-cast ids, cast date strings.
  *
  * Every reader also stamps the literal `dwh_batch_id` technical column
  * (scripts/load_to_bronze.py:559) — the partition/idempotency key that
  * carries through every layer.
  */
object ReferenceFixtures {

  val Root = "/root/reference/data/client1"
  val BatchId = "BATCH000014"

  /** Pinned stand-in for CURRENT_DATE (reference snapshot date) so the
    * year-clamp and churn cutoff are deterministic — SURVEY §7.4.3.
    */
  val RefDate = "2025-09-12"

  private def stamp(df: DataFrame): DataFrame =
    df.withColumn("dwh_batch_id", lit(BatchId))

  /** bronze_client1.crm_cust_info (ddl_bronze_client1.sql:6-14). */
  def crmCustInfo(s: SparkSession): DataFrame =
    stamp(s.read.parquet(s"$Root/crm/archive/cust_info_$BatchId.parquet")
      .select(
        round(col("cst_id").cast(DoubleType)).cast(LongType).as("cst_id"),
        col("cst_key"),
        col("cst_firstname"),
        col("cst_lastname"),
        col("cst_marital_status"),
        col("cst_gendr").as("cst_gndr"),
        col("cst_create_date").cast(DateType).as("cst_create_date")))

  /** bronze_client1.crm_prd_info (ddl_bronze_client1.sql:17-26). */
  def crmPrdInfo(s: SparkSession): DataFrame =
    stamp(s.read.parquet(s"$Root/crm/archive/prd_info_$BatchId.parquet")
      .select(
        col("prd_id").cast(LongType).as("prd_id"),
        col("prd_key"),
        col("prd_nm"),
        col("prd_cost").cast(DoubleType).as("prd_cost"),
        col("prd_line"),
        col("prd_start_dt").cast(TimestampType).as("prd_start_dt"),
        col("prd_end_dt").cast(TimestampType).as("prd_end_dt")))

  /** bronze_client1.crm_sales_details (ddl_bronze_client1.sql:29-40). */
  def crmSalesDetails(s: SparkSession): DataFrame =
    stamp(s.read.parquet(s"$Root/crm/archive/sales_details_$BatchId.parquet")
      .select(
        col("sls_ord_num"),
        col("sls_prd_key"),
        col("sls_cust_id").cast(LongType).as("sls_cust_id"),
        col("sls_order_dt").cast(LongType).as("sls_order_dt"),
        col("sls_ship_dt").cast(LongType).as("sls_ship_dt"),
        col("sls_due_dt").cast(LongType).as("sls_due_dt"),
        col("sls_sales").cast(DoubleType).as("sls_sales"),
        col("sls_quantity").cast(LongType).as("sls_quantity"),
        col("sls_price").cast(DoubleType).as("sls_price")))

  /** bronze_client1.erp_cust_az12 (ddl_bronze_client1.sql:50-55);
    * uppercase source headers mapped to bronze lowercase. */
  def erpCustAz12(s: SparkSession): DataFrame =
    stamp(s.read.parquet(s"$Root/erp/archive/CUST_AZ12_$BatchId.parquet")
      .select(
        col("CID").as("cid"),
        col("BDATE").cast(DateType).as("bdate"),
        col("GEN").as("gen")))

  /** bronze_client1.erp_loc_a101 (ddl_bronze_client1.sql:43-47). */
  def erpLocA101(s: SparkSession): DataFrame =
    stamp(s.read.parquet(s"$Root/erp/archive/LOC_A101_$BatchId.parquet")
      .select(col("CID").as("cid"), col("CNTRY").as("cntry")))

  /** bronze_client1.erp_px_cat_g1v2 (ddl_bronze_client1.sql:58-64). */
  def erpPxCatG1v2(s: SparkSession): DataFrame =
    stamp(s.read.parquet(s"$Root/erp/archive/PX_CAT_G1V2_$BatchId.parquet")
      .select(col("ID").as("id"), col("CAT").as("cat"),
        col("SUBCAT").as("subcat"), col("MAINTENANCE").as("maintenance")))
}
