package graft

import graft.pipeline._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-count and QA-probe tests for the reference pipeline on the
  * reference's own fixture batch (BATCH000014). The probe queries are
  * ports of the reference's manual QA corpus
  * (sql/tools/Transformation/.../Methods_*.sql,
  * sql/tools/Integrations/client1/Methods_dim_*.sql) — each probe must
  * return empty (or the fixture's one known dirt row, asserted exactly).
  */
class PipelineSpec extends AnyFunSuite with SparkTestBase {

  import ReferenceFixtures.RefDate

  private lazy val silverCust =
    SilverTransforms.crmCustInfo(ReferenceFixtures.crmCustInfo(spark), RefDate).cache()
  private lazy val silverPrd =
    SilverTransforms.crmPrdInfo(ReferenceFixtures.crmPrdInfo(spark)).cache()
  private lazy val silverSales =
    SilverTransforms.crmSalesDetails(ReferenceFixtures.crmSalesDetails(spark)).cache()
  private lazy val silverCa =
    SilverTransforms.erpCustAz12(ReferenceFixtures.erpCustAz12(spark), RefDate).cache()
  private lazy val silverLa =
    SilverTransforms.erpLocA101(ReferenceFixtures.erpLocA101(spark)).cache()
  private lazy val silverPx =
    SilverTransforms.erpPxCatG1v2(ReferenceFixtures.erpPxCatG1v2(spark)).cache()
  private lazy val dimCust =
    GoldIntegration.dimCustomers(silverCust, silverCa, silverLa).cache()
  private lazy val dimProd =
    GoldIntegration.dimProducts(silverPrd, silverPx).cache()
  private lazy val fact =
    GoldIntegration.factSales(silverSales, dimProd, dimCust).cache()

  test("silver row counts match the reference fixture") {
    assert(silverCust.count() === 18484) // 18494 - 4 null PKs - 6 dedup losers
    assert(silverPrd.count() === 397)
    assert(silverSales.count() === 60398)
    assert(silverCa.count() === 18484)
    assert(silverLa.count() === 18484)
    assert(silverPx.count() === 37)
  }

  test("gold row counts: dims + fact (incl. the known loc-dup fanout)") {
    assert(dimCust.count() === 18485) // 18484 + 1: LOC cid AW00011003 dup after dash-strip
    assert(dimProd.count() === 295)   // current products only (prd_end_dt IS NULL)
    assert(fact.count() === 60407)    // 60398 + 9 rows fanned by the dup customer
  }

  // Methods_crm_cust_info.sql:4-9 — PK null/dup probe must be empty
  test("QA: silver cust PK unique and non-null") {
    assert(silverCust.where(col("cst_id").isNull).count() === 0)
    assert(silverCust.groupBy("cst_id").count().where(col("count") > 1).count() === 0)
  }

  // Methods_crm_cust_info.sql TRIM probes: no untrimmed values survive
  test("QA: silver string columns are trimmed") {
    for (c <- Seq("cst_key", "cst_firstname", "cst_lastname"))
      assert(silverCust.where(col(c) =!= trim(col(c))).count() === 0, c)
    for (c <- Seq("cat", "subcat", "maintenance"))
      assert(silverPx.where(col(c) =!= trim(col(c))).count() === 0, c)
  }

  // Low-cardinality domain audits (SELECT DISTINCT probes)
  test("QA: decoded enums land in their domains") {
    def domain(df: org.apache.spark.sql.DataFrame, c: String): Set[String] =
      df.select(c).distinct().collect().map(_.getString(0)).toSet
    assert(domain(silverCust, "cst_marital_status")
      .subsetOf(Set("Married", "Single", "Unknown")))
    assert(domain(silverCust, "cst_gndr") === Set("Female", "Male", "Unknown"))
    assert(domain(silverCa, "gen") === Set("Female", "Male", "Unknown"))
    assert(domain(silverPrd, "prd_line")
      .subsetOf(Set("Mountain", "Road", "Sport", "Touring", "Unknown")))
  }

  // Methods_crm_prd_info.sql:44-47 — end date before start must be empty
  test("QA: SCD2 end dates never precede start dates") {
    assert(silverPrd.where(col("prd_end_dt") < col("prd_start_dt")).count() === 0)
    assert(silverPrd.where(col("prd_cost").isNull || col("prd_cost") < 0).count() === 0)
  }

  // Methods_crm_sales_details.sql:96-132 — date window + consistency
  test("QA: repaired sales rows are internally consistent") {
    assert(silverSales.where(col("sls_sales") =!=
      col("sls_quantity") * col("sls_price")).count() === 0)
    assert(silverSales.where(col("sls_sales").isNull
      || col("sls_quantity").isNull || col("sls_price").isNull).count() === 0)
    assert(silverSales.where(
      col("sls_order_dt") < lit("1900-01-01").cast("date")
        || col("sls_order_dt") > lit("2030-01-01").cast("date")).count() === 0)
  }

  // Methods_erp_cust_az12.sql:38-44 — no future birthdates survive
  test("QA: birthdates clamped to refDate") {
    assert(silverCa.where(col("bdate") > lit(RefDate).cast("date")).count() === 0)
  }

  // Methods_dim_customers.sql:1-27 — post-join PK audit: the fixture
  // carries exactly one duplicated natural key (loc dirt), nothing else.
  test("QA: dim PK uniqueness (one known fixture dup)") {
    val dups = dimCust.groupBy("customer_id").count().where(col("count") > 1)
    assert(dups.count() === 1)
    assert(dups.select("customer_id").collect().head.getLong(0) === 11003L)
    assert(dimProd.groupBy("product_number").count().where(col("count") > 1).count() === 0)
  }

  test("QA: no unknown members leak into the fact") {
    assert(fact.where(col("customer_key") === -1).count() === 0)
    assert(fact.where(col("product_key") === -1).count() === 0)
  }

  test("golden aggregates: total sales and gender split") {
    assert(fact.agg(sum("sales")).collect().head.getDouble(0) === 29364389.0)
    val genders = dimCust.groupBy("gender").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(genders === Map("Female" -> 9129L, "Male" -> 9341L, "Unknown" -> 15L))
  }

  test("golden MV cardinalities") {
    assert(GoldViews.salesMonthlyProductline(fact, dimProd).count() === 1988)
    assert(GoldViews.top3ProductsMonthCountry(fact, dimCust, dimProd).count() === 829)
    assert(GoldViews.customerOrderGap(fact, dimCust).count() === 15991)
    assert(GoldViews.salesRollupProduct(fact, dimProd).count() === 37)
    // no late shipments in this fixture -> recursion seed empty
    assert(GoldViews.delayedOrdersChain(fact).count() === 0)
  }
}
