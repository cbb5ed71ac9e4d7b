package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The 6 bronze→silver cleaning/standardization transforms, re-expressed
  * as pure DataFrame functions (the reference implements them as plpgsql
  * INSERT..SELECT procedures; the orchestration shell — count guard,
  * delete-batch, logging — is orchestration, not data plane).
  *
  * Determinism divergences from the reference (documented, SURVEY §7.4):
  * - dedup and SCD2 windows get a unique tiebreak key appended (the
  *   reference's ROW_NUMBER/LEAD orderings are nondeterministic on ties);
  * - CURRENT_DATE is the injected `refDate` (snapshot-pinned).
  */
object SilverTransforms {

  private def decode(c: Column, mapping: Seq[(String, String)], default: String): Column =
    mapping.foldLeft(when(lit(false), lit(null: String))) { case (acc, (k, v)) =>
      acc.when(upper(trim(c)) === k, v)
    }.otherwise(default)

  /** silver.crm_cust_info: null-PK filter, dedup-keep-latest, trims,
    * marital/gender decode, future-year clamp.
    * Ref: tools.load_crm_cust_info_v1.sql:58-139
    */
  def crmCustInfo(bronze: DataFrame, refDate: String): DataFrame = {
    val w = Window.partitionBy(col("cst_id"))
      .orderBy(col("cst_create_date").desc, col("cst_key").desc)
    val refYear = year(lit(refDate).cast(DateType))
    bronze
      .where(col("cst_id").isNotNull)
      .withColumn("flag_last", row_number().over(w))
      .where(col("flag_last") === 1)
      .select(
        col("cst_id"),
        trim(col("cst_key")).as("cst_key"),
        trim(col("cst_firstname")).as("cst_firstname"),
        trim(col("cst_lastname")).as("cst_lastname"),
        decode(col("cst_marital_status"),
          Seq("M" -> "Married", "S" -> "Single"), "Unknown")
          .as("cst_marital_status"),
        decode(col("cst_gndr"),
          Seq("F" -> "Female", "M" -> "Male"), "Unknown").as("cst_gndr"),
        when(year(col("cst_create_date")) > refYear,
          make_date(refYear, month(col("cst_create_date")),
            dayofmonth(col("cst_create_date"))))
          .otherwise(col("cst_create_date")).as("cst_create_date"),
        col("dwh_batch_id"))
  }

  /** silver.crm_prd_info: key split (cat_id / prd_key), cost default,
    * product-line decode, SCD2 end-dating via LEAD − 1 day.
    * Ref: tools.load_crm_prd_info_v1.sql:70-100
    */
  def crmPrdInfo(bronze: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("prd_key"))
      .orderBy(col("prd_start_dt"), col("prd_id"))
    bronze.select(
      col("prd_id"),
      trim(regexp_replace(substring(col("prd_key"), 1, 5), "-", "_")).as("cat_id"),
      trim(expr("substring(prd_key, 7, length(prd_key))")).as("new_prd_key"),
      trim(col("prd_nm")).as("prd_nm"),
      coalesce(col("prd_cost"), lit(0.0)).as("prd_cost"),
      decode(col("prd_line"),
        Seq("M" -> "Mountain", "S" -> "Sport", "R" -> "Road", "T" -> "Touring"),
        "Unknown").as("prd_line"),
      col("prd_start_dt").cast(DateType).as("prd_start_dt"),
      date_sub(lead(col("prd_start_dt"), 1).over(w).cast(DateType), 1)
        .as("prd_end_dt"),
      col("dwh_batch_id"))
      .withColumnRenamed("new_prd_key", "prd_key")
  }

  /** silver.crm_sales_details: yyyyMMdd-int → date (0 / non-8-digit →
    * null), sales consistency repair, price backfill.
    * Ref: tools.load_crm_sales_details_v1.sql:75-115
    */
  def crmSalesDetails(bronze: DataFrame): DataFrame = {
    def intDate(c: Column): Column =
      when(c === 0 || length(c.cast(StringType)) =!= 8, lit(null).cast(DateType))
        .otherwise(to_date(c.cast(StringType), "yyyyMMdd"))
    bronze.select(
      trim(col("sls_ord_num")).as("sls_ord_num"),
      trim(col("sls_prd_key")).as("sls_prd_key"),
      col("sls_cust_id"),
      intDate(col("sls_order_dt")).as("sls_order_dt"),
      intDate(col("sls_ship_dt")).as("sls_ship_dt"),
      intDate(col("sls_due_dt")).as("sls_due_dt"),
      when(col("sls_sales").isNull || col("sls_sales") <= 0
        || col("sls_sales") =!= col("sls_quantity") * abs(col("sls_price")),
        col("sls_quantity") * abs(col("sls_price")))
        .otherwise(col("sls_sales")).as("sls_sales"),
      col("sls_quantity"),
      when(col("sls_price").isNull || col("sls_price") <= 0,
        abs(col("sls_sales")) / nullif(col("sls_quantity"), lit(0L)))
        .otherwise(col("sls_price")).as("sls_price"),
      col("dwh_batch_id"))
  }

  /** silver.erp_cust_az12: NAS-prefix strip, future-birthdate null,
    * gender normalize with IN-lists.
    * Ref: tools.load_erp_cust_az12_v1.sql:60-90
    */
  def erpCustAz12(bronze: DataFrame, refDate: String): DataFrame =
    bronze.select(
      when(col("cid").like("NAS%"),
        expr("substring(cid, 4, length(cid))")).otherwise(col("cid")).as("cid"),
      when(col("bdate") > lit(refDate).cast(DateType), lit(null).cast(DateType))
        .otherwise(col("bdate")).as("bdate"),
      when(upper(trim(col("gen"))).isin("F", "FEMALE"), "Female")
        .when(upper(trim(col("gen"))).isin("M", "MALE"), "Male")
        .otherwise("Unknown").as("gen"),
      col("dwh_batch_id"))

  /** silver.erp_loc_a101: cid dash-strip, country normalize.
    * Ref: tools.load_erp_loc_a101_v1.sql:60-85
    */
  def erpLocA101(bronze: DataFrame): DataFrame =
    bronze.select(
      trim(regexp_replace(col("cid"), "-", "")).as("cid"),
      when(trim(col("cntry")) === "DE", "Germany")
        .when(trim(col("cntry")).isin("US", "USA"), "United States")
        .when(trim(col("cntry")) === "" || col("cntry").isNull, "Unknown")
        .otherwise(trim(col("cntry"))).as("cntry"),
      col("dwh_batch_id"))

  /** silver.erp_px_cat_g1v2: trims only.
    * Ref: tools.load_erp_px_cat_g1v2_v1.sql:60-85
    */
  def erpPxCatG1v2(bronze: DataFrame): DataFrame =
    bronze.select(
      col("id"),
      trim(col("cat")).as("cat"),
      trim(col("subcat")).as("subcat"),
      trim(col("maintenance")).as("maintenance"),
      col("dwh_batch_id"))
}
